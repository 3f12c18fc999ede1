"""Weight import/export: reference .h5 port, sub-sampling, checkpoints.

* :func:`load_keras_h5_weights` loads the reference's Keras-format ``.h5``
  weight files (including the ported-from-Caffe VGG/SSD weights) into a flax
  parameter pytree **by layer name** — the name->tensor mapping is the
  weight-port contract (SURVEY.md §3.3). Keras stores conv kernels as HWIO,
  which is also flax's native layout, so tensors transfer unchanged.
* :func:`sample_tensors` ports N-class predictor heads to M-class heads by
  sub-/up-sampling weight tensors along arbitrary axes — capability parity
  with /root/reference/misc_utils/tensor_sampling_utils.py:21.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "load_keras_h5_weights",
    "save_keras_h5_weights",
    "sample_tensors",
    "sample_classifier_weights",
]

_KERAS_TO_FLAX = {"kernel": "kernel", "bias": "bias", "gamma": "gamma",
                  "beta": "beta", "moving_mean": "mean", "moving_variance": "var"}
# BatchNorm statistics live in flax's `batch_stats` collection, not `params`.
_BN_STATS = {"moving_mean", "moving_variance"}
# Keras BatchNormalization affine params vs flax.linen.BatchNorm's names
# (applied only to layers that have a 'scale' param — i.e. real BatchNorms).
_KERAS_BN_TO_FLAX = {"gamma": "scale", "beta": "bias"}
_FLAX_BN_TO_KERAS = {"scale": "gamma", "bias": "beta"}


def _layer_groups(f):
    """Yield (layer_name, group) for every layer with weights in a Keras h5 file."""
    import h5py

    root = f["model_weights"] if "model_weights" in f else f
    for name in root:
        g = root[name]
        if not isinstance(g, h5py.Group):
            continue
        # Keras nests the weights one level deeper under the layer name again.
        inner = g[name] if name in g else g
        datasets = {}

        def collect(prefix, obj):
            if hasattr(obj, "shape"):
                datasets[prefix] = np.array(obj)

        inner.visititems(collect)
        if datasets:
            yield name, datasets


def _weight_key(ds_name: str, layer_name: str) -> str:
    """Map a Keras h5 dataset name to a canonical weight key.

    Keras dataset names come in two flavors:

    * ``'{layer}/kernel:0'`` — variables created inside the layer's name
      scope (Conv2D, BatchNorm, ...); the key is the last path component.
    * ``'{layer}_gamma:0'`` — variables the reference's custom layers name
      explicitly, e.g. L2Normalization's ``'conv4_3_norm_gamma:0'``
      (/root/reference/keras_layers/keras_layer_L2Normalization.py:57 names
      the variable ``'{layer.name}_gamma'``). The layer-name prefix must be
      stripped, else the ported SSD300/512 checkpoints silently leave
      conv4_3's learned scale at its init value.
    """
    key = ds_name.split("/")[-1].split(":")[0]
    if key in _KERAS_TO_FLAX:
        return key
    if key.startswith(layer_name + "_"):
        stripped = key[len(layer_name) + 1:]
        if stripped in _KERAS_TO_FLAX:
            return stripped
    # Last resort: suffix-match a known weight name (handles scope prefixes).
    for known in _KERAS_TO_FLAX:
        if key.endswith("_" + known):
            return known
    return key


def load_keras_h5_weights(
    h5_path: str,
    params: Dict,
    batch_stats: Optional[Dict] = None,
    by_name: bool = True,
    verbose: bool = False,
    on_unconsumed: str = "warn",
):
    """Load a Keras .h5 weight file into (a copy of) a flax param pytree.

    Layers present in the file but absent from ``params`` are skipped (the
    reference's ``load_weights(by_name=True)`` semantics), and vice versa.
    If a layer that IS in the model carries datasets that cannot be mapped
    onto any of its parameters, that is almost always a porting bug (a
    mis-mapped weight silently left at init), so it warns by default;
    ``on_unconsumed`` in {'warn', 'raise', 'ignore'}.
    Returns ``(params, batch_stats, loaded_layer_names)``.
    """
    import h5py

    stats_provided = batch_stats is not None
    params = {k: dict(v) for k, v in params.items()}
    batch_stats = {k: dict(v) for k, v in (batch_stats or {}).items()}
    loaded = []
    unconsumed = []
    with h5py.File(h5_path, "r") as f:
        for name, datasets in _layer_groups(f):
            target_p = params.get(name)
            target_s = batch_stats.get(name)
            if target_p is None and target_s is None:
                continue
            for ds_name, value in datasets.items():
                key = _weight_key(ds_name, name)
                flax_key = _KERAS_TO_FLAX.get(key, key)
                if key in _BN_STATS and not stats_provided:
                    # Caller loads params only — skipping the BN moving
                    # stats is the documented semantics, not a porting bug.
                    continue
                dest = target_s if key in _BN_STATS else target_p
                if (
                    dest is not None
                    and flax_key not in dest
                    and key in _KERAS_BN_TO_FLAX
                    and target_p is not None
                    and "scale" in target_p
                ):
                    # Keras BatchNormalization names its affine parameters
                    # gamma/beta; flax.linen.BatchNorm calls them
                    # scale/bias. Only remap when the layer actually is a
                    # BatchNorm (has 'scale') so L2Normalization's real
                    # 'gamma' parameter keeps its name.
                    flax_key = _KERAS_BN_TO_FLAX[key]
                if dest is None or flax_key not in dest:
                    unconsumed.append(f"{name}/{ds_name}")
                    continue
                have = np.asarray(dest[flax_key])
                if have.shape != value.shape:
                    raise ValueError(
                        f"Shape mismatch for {name}/{flax_key}: "
                        f"checkpoint {value.shape} vs model {have.shape}."
                    )
                dest[flax_key] = value.astype(have.dtype)
            loaded.append(name)
            if verbose:
                print(f"loaded layer {name}: {sorted(datasets)}")
    if unconsumed and on_unconsumed != "ignore":
        msg = (
            f"{h5_path}: {len(unconsumed)} dataset(s) in matched layers were "
            f"not mapped onto any model parameter: {unconsumed}. The "
            "corresponding model weights keep their current values."
        )
        if on_unconsumed == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return params, batch_stats, loaded


def save_keras_h5_weights(
    h5_path: str, params: Dict, batch_stats: Optional[Dict] = None
):
    """Write a flax param pytree as a genuine Keras-format .h5 weight file.

    Matches what Keras 2.x ``save_weights`` produces for the reference models
    (/root/reference/README.md:215-239 describes the ported files):

    * root attrs ``layer_names`` / ``backend`` / ``keras_version``,
    * per-layer-group ``weight_names`` attr listing the variable names,
    * Conv/BN variables under a nested ``{layer}/{weight}:0`` path,
    * L2Normalization's gamma as a flat ``{layer}_gamma:0`` dataset (Keras
      names that variable ``'{layer.name}_gamma'`` with no scope, see
      keras_layer_L2Normalization.py:57).
    """
    import h5py

    inv = {v: k for k, v in _KERAS_TO_FLAX.items()}

    def _bytes_attr(names):
        # NumPy sizes the fixed-width bytes dtype to the longest name (what
        # Keras 2 writes); a hard cap would silently truncate long names.
        return np.array([n.encode("utf8") for n in names])

    with h5py.File(h5_path, "w") as f:
        f.attrs["backend"] = np.asarray(b"tensorflow")
        f.attrs["keras_version"] = np.asarray(b"2.2.4")
        layer_names = list(params)
        f.attrs["layer_names"] = _bytes_attr(layer_names)
        for name in layer_names:
            tensors = dict(params[name])
            stats = dict(batch_stats[name]) if batch_stats and name in batch_stats else {}
            g = f.create_group(name)
            weight_names = []
            if set(tensors) == {"gamma"} and not stats:
                # L2Normalization-style layer: flat '{layer}_gamma:0' dataset.
                wname = f"{name}_gamma:0"
                g.create_dataset(wname, data=np.asarray(tensors["gamma"]))
                weight_names.append(wname)
            else:
                inner = g.create_group(name)
                is_batchnorm = "scale" in tensors
                for key in list(tensors) + list(stats):
                    value = tensors.get(key) if key in tensors else stats[key]
                    if is_batchnorm and key in _FLAX_BN_TO_KERAS:
                        # flax BatchNorm scale/bias -> Keras gamma/beta.
                        keras_key = _FLAX_BN_TO_KERAS[key]
                    else:
                        keras_key = inv.get(key, key)
                    inner.create_dataset(
                        f"{keras_key}:0", data=np.asarray(value)
                    )
                    weight_names.append(f"{name}/{keras_key}:0")
            g.attrs["weight_names"] = _bytes_attr(weight_names)


# --------------------------------------------------------------------------- #
# Weight sub-/up-sampling (transfer a head across class counts)
# --------------------------------------------------------------------------- #


def sample_tensors(
    weights_list: List[np.ndarray],
    sampling_instructions: Sequence,
    axes: Optional[List] = None,
    init=None,
    mean: float = 0.0,
    stddev: float = 0.005,
):
    """Sub-sample or up-sample weight tensors consistently along given axes.

    ``sampling_instructions``: per axis of the first tensor, either an int
    (target size: random sub-sample keeping index order, or gaussian/zeros
    up-fill) or a list of explicit indices to keep. Trailing tensors (e.g.
    biases) are sampled along their matching last axes via ``axes``.
    Capability parity with tensor_sampling_utils.py:21-177.
    """
    first = weights_list[0]
    if len(sampling_instructions) != first.ndim:
        raise ValueError(
            "One sampling instruction per axis of the first tensor is required."
        )
    init = init or ["gaussian"] * len(sampling_instructions)

    # Resolve each axis' kept-index list (sub-sampling) or target size (up).
    out_indices: List[Optional[np.ndarray]] = []
    out_sizes: List[int] = []
    for ax, instr in enumerate(sampling_instructions):
        size = first.shape[ax]
        if isinstance(instr, (list, tuple, np.ndarray)):
            idx = np.asarray(instr, dtype=np.int64)
            if idx.max() >= size:
                raise ValueError(
                    f"Axis {ax}: explicit indices exceed source size {size}."
                )
            out_indices.append(np.sort(idx))
            out_sizes.append(len(idx))
        elif int(instr) <= size:
            idx = np.sort(np.random.choice(size, int(instr), replace=False))
            out_indices.append(idx)
            out_sizes.append(int(instr))
        else:
            out_indices.append(None)  # up-sample
            out_sizes.append(int(instr))

    def sample_one(tensor: np.ndarray, tensor_axes: Sequence[int]):
        # `tensor_axes` maps this tensor's axes onto the instruction axes.
        out = tensor
        for t_ax, i_ax in enumerate(tensor_axes):
            idx = out_indices[i_ax]
            target = out_sizes[i_ax]
            if idx is not None:
                out = np.take(out, idx, axis=t_ax)
            elif target > out.shape[t_ax]:
                shape = list(out.shape)
                shape[t_ax] = target
                if init[i_ax] == "zeros":
                    filled = np.zeros(shape, dtype=out.dtype)
                else:
                    filled = np.random.normal(mean, stddev, shape).astype(out.dtype)
                sl = [slice(None)] * out.ndim
                sl[t_ax] = slice(0, out.shape[t_ax])
                filled[tuple(sl)] = out
                out = filled
        return out

    results = [sample_one(first, list(range(first.ndim)))]
    for i, tensor in enumerate(weights_list[1:]):
        if axes is None or i >= len(axes):
            # Default: sample trailing tensors along the *last* instruction axis
            # (the classifier-output axis), matching the reference's use of
            # kernel+bias pairs.
            tensor_axes = [first.ndim - 1] * tensor.ndim
        else:
            tensor_axes = list(axes[i])
        results.append(sample_one(tensor, tensor_axes))
    return results


def sample_classifier_weights(
    kernel: np.ndarray,
    bias: np.ndarray,
    n_classes_source: int,
    classes_of_interest: Sequence[int],
    n_boxes: int,
):
    """Port a conf head from ``n_classes_source`` to ``len(classes_of_interest)``.

    Expands the per-box class indices (class 0 / background always kept first
    if included in ``classes_of_interest``) exactly like the weight-sampling
    tutorial's index arithmetic (weight_sampling_tutorial.ipynb cell 14).
    """
    idx = []
    for b in range(n_boxes):
        idx.extend(int(c) + b * n_classes_source for c in classes_of_interest)
    return sample_tensors(
        [kernel, bias],
        sampling_instructions=list(kernel.shape[:-1]) + [idx],
        axes=[[kernel.ndim - 1]],
    )
