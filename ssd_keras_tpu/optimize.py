"""Inference-graph optimizations: host-side parameter transforms.

The reference serves its Keras graphs exactly as trained
(/root/reference/models/keras_ssd7.py:30 keeps every BatchNormalization in
the inference graph). On TPU the BN scale/shift after each conv is a pure
linear map at inference time, so it can be folded into the conv kernel and
bias *before* compilation — the compiled trunk then contains only
conv+bias+ELU.

Measured effect (BENCH_MATRIX.json 'bn-folded' rows vs the live-BN rows):
~1% at SSD7 batch 8/32 — XLA already fuses the inference-mode BN affine
into the conv's epilogue, so folding buys little raw speed on this chip.
What it does buy: a params-only serving contract (no ``batch_stats``
collection to thread through predictors/checkpoints) and a trunk whose HLO
is plain conv+bias for downstream tooling, at zero accuracy cost (exact up
to float rounding, pinned by tests/test_optimize.py).

Folding math (per output channel c, Keras BN semantics):

    scale_c   = gamma_c / sqrt(var_c + eps)
    kernel'_c = kernel_c * scale_c
    bias'_c   = beta_c + (bias_c - mean_c) * scale_c

which makes ``conv'(x) == bn(conv(x))`` exactly (up to float rounding).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["fold_batchnorm", "fold_preprocessing"]


def _detect_pairs(params: Dict, batch_stats: Dict) -> List[Tuple[str, str]]:
    """Match each BN layer to its producing conv by the shared name suffix.

    SSD7's reference naming is ``conv{i}`` -> ``bn{i}``
    (/root/reference/models/keras_ssd7.py:30); any custom backbone that
    follows the same convention is detected too. Raises if a BN layer has
    no matching conv — silent partial folding would corrupt the model.
    """
    pairs = []
    for bn_name in batch_stats:
        if not bn_name.startswith("bn"):
            raise ValueError(
                f"Cannot auto-match batch_stats entry {bn_name!r} to a conv; "
                "pass explicit (conv_name, bn_name) pairs."
            )
        conv_name = "conv" + bn_name[len("bn"):]
        if conv_name not in params:
            raise ValueError(
                f"BN layer {bn_name!r} has no matching conv {conv_name!r}; "
                "pass explicit (conv_name, bn_name) pairs."
            )
        pairs.append((conv_name, bn_name))
    return pairs


def fold_batchnorm(
    variables: Dict,
    pairs: Optional[List[Tuple[str, str]]] = None,
    epsilon: float = 1e-3,
) -> Dict:
    """Fold every BatchNorm into its preceding conv; return new variables.

    Args:
      variables: ``{"params": ..., "batch_stats": ...}`` as produced by
        ``model.init`` / training (Keras BN semantics: params hold
        ``scale``/``bias`` = gamma/beta, batch_stats hold ``mean``/``var``).
      pairs: explicit ``(conv_name, bn_name)`` pairs; auto-detected from the
        ``conv{i}``/``bn{i}`` naming convention when omitted.
      epsilon: the BN epsilon the model was built with (Keras default 1e-3,
        matching models/ssd7.py).

    Returns:
      ``{"params": folded}`` — BN entries removed, batch_stats gone. Apply
      with a model built with ``fold_bn=True`` (which skips the BN modules);
      outputs match the unfolded model to float rounding.
    """
    params = dict(variables["params"])
    batch_stats = variables.get("batch_stats", {})
    if not batch_stats:
        raise ValueError("variables has no batch_stats; nothing to fold.")
    if pairs is None:
        pairs = _detect_pairs(params, batch_stats)

    for conv_name, bn_name in pairs:
        conv = params[conv_name]
        bn = params[bn_name]
        stats = batch_stats[bn_name]
        gamma = np.asarray(bn["scale"], np.float64)
        beta = np.asarray(bn["bias"], np.float64)
        mean = np.asarray(stats["mean"], np.float64)
        var = np.asarray(stats["var"], np.float64)
        scale = gamma / np.sqrt(var + epsilon)
        kernel = np.asarray(conv["kernel"], np.float64) * scale
        bias = beta + (np.asarray(conv["bias"], np.float64) - mean) * scale
        dt = np.asarray(conv["kernel"]).dtype
        params[conv_name] = {
            "kernel": jnp.asarray(kernel.astype(dt)),
            "bias": jnp.asarray(bias.astype(dt)),
        }
        del params[bn_name]

    return {"params": params}


def fold_preprocessing(variables: Dict, config, conv_name: str = "conv1_1"):
    """Fold the channel swap + stddev division into the first conv's kernel.

    The reference's in-graph preprocessing (keras_ssd300.py:247-272) is
    mean-sub -> stddev-div -> channel-swap. The last two are a per-channel
    linear map that fixes 0, so they commute with the conv's SAME zero
    padding and fold EXACTLY into the first conv's input-channel axis:

        kernel'[h, w, j, o] = kernel[h, w, inv_swap[j], o] / stddev[j]

    Mean subtraction must STAY in-graph: it does not fix 0, so folding it
    would change what the conv's border padding taps see (zero vs
    -mean/std) and perturb the one-pixel output ring. The returned config
    keeps ``subtract_mean`` and clears ``swap_channels`` /
    ``divide_by_stddev``.

    Args:
      variables: model variables; ``params[conv_name]`` holds the HWIO
        kernel of the first conv that consumes the preprocessed image.
      config: the :class:`SSDConfig` the model was built with.
      conv_name: first conv's parameter name (reference naming: 'conv1_1'
        for SSD300/512, 'conv1' for SSD7).

    Returns:
      ``(variables', config')`` — rebuild the model from ``config'`` and
      apply ``variables'``; outputs match the original to float rounding
      (exact up to reassociation; pinned in tests/test_optimize.py).
    """
    swap = config.swap_channels
    std = config.divide_by_stddev
    if not swap and std is None:
        raise ValueError(
            "Neither swap_channels nor divide_by_stddev is set; "
            "nothing to fold."
        )
    params = dict(variables["params"])
    conv = dict(params[conv_name])
    kernel = np.asarray(conv["kernel"], np.float64)
    cin = kernel.shape[2]
    if swap:
        if sorted(swap) != list(range(cin)):
            raise ValueError(f"swap_channels {swap} is not a permutation "
                             f"of {cin} input channels.")
        inv = np.argsort(np.asarray(swap))
        kernel = kernel[:, :, inv, :]
    if std is not None:
        kernel = kernel / np.asarray(std, np.float64)[None, None, :, None]
    dt = np.asarray(conv["kernel"]).dtype
    conv["kernel"] = jnp.asarray(kernel.astype(dt))
    params[conv_name] = conv
    new_vars = dict(variables)
    new_vars["params"] = params
    new_cfg = dataclasses.replace(
        config, swap_channels=None, divide_by_stddev=None
    )
    return new_vars, new_cfg
