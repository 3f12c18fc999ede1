"""Weight I/O: Keras-layout .h5 import/export and tensor sub-/up-sampling."""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu import weights_io as W
from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.models import ssd_7


@pytest.fixture()
def ssd7_variables():
    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x)


def test_h5_roundtrip(tmp_path, ssd7_variables):
    params = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["batch_stats"]))
    path = str(tmp_path / "w.h5")
    W.save_keras_h5_weights(path, params, stats)

    # Perturb then reload: values must come back from the file.
    perturbed = jax.tree_util.tree_map(lambda a: a + 1.0, params)
    loaded, loaded_stats, names = W.load_keras_h5_weights(path, perturbed, stats)
    assert "conv1" in names and "bn1" in names
    np.testing.assert_allclose(loaded["conv1"]["kernel"], params["conv1"]["kernel"])
    np.testing.assert_allclose(loaded_stats["bn1"]["mean"], stats["bn1"]["mean"])


def test_h5_by_name_skips_unknown_layers(tmp_path, ssd7_variables):
    params = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["params"]))
    path = str(tmp_path / "w.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("conv1").create_group("conv1")
        g.create_dataset("kernel:0", data=np.zeros_like(params["conv1"]["kernel"]))
        g.create_dataset("bias:0", data=np.zeros_like(params["conv1"]["bias"]))
        g2 = f.create_group("nonexistent_layer").create_group("nonexistent_layer")
        g2.create_dataset("kernel:0", data=np.ones((1, 1, 1, 1)))
    loaded, _, names = W.load_keras_h5_weights(path, params, {})
    assert names == ["conv1"]
    assert np.all(loaded["conv1"]["kernel"] == 0)
    # Other layers untouched.
    np.testing.assert_allclose(loaded["conv2"]["kernel"], params["conv2"]["kernel"])


def test_h5_shape_mismatch_raises(tmp_path, ssd7_variables):
    params = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["params"]))
    path = str(tmp_path / "w.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("conv1").create_group("conv1")
        g.create_dataset("kernel:0", data=np.zeros((1, 1, 1, 1)))
    with pytest.raises(ValueError, match="Shape mismatch"):
        W.load_keras_h5_weights(path, params, {})


def test_h5_model_weights_subgroup(tmp_path, ssd7_variables):
    """Keras `model.save()` nests weights under 'model_weights'."""
    params = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["params"]))
    path = str(tmp_path / "w.h5")
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        g = mw.create_group("conv1").create_group("conv1")
        g.create_dataset("kernel:0", data=params["conv1"]["kernel"] * 2)
        g.create_dataset("bias:0", data=params["conv1"]["bias"])
    loaded, _, names = W.load_keras_h5_weights(path, params, {})
    assert names == ["conv1"]
    np.testing.assert_allclose(
        loaded["conv1"]["kernel"], params["conv1"]["kernel"] * 2
    )


def test_sample_tensors_subsample():
    kernel = np.arange(3 * 3 * 4 * 84, dtype=np.float64).reshape(3, 3, 4, 84)
    bias = np.arange(84, dtype=np.float64)
    idx = list(range(0, 84, 2))
    new_k, new_b = W.sample_tensors(
        [kernel, bias], sampling_instructions=[3, 3, 4, idx], axes=[[3]]
    )
    assert new_k.shape == (3, 3, 4, 42)
    np.testing.assert_allclose(new_k, kernel[:, :, :, idx])
    np.testing.assert_allclose(new_b, bias[idx])


def test_sample_tensors_upsample_keeps_originals():
    np.random.seed(0)
    kernel = np.random.randn(3, 3, 4, 10)
    bias = np.random.randn(10)
    new_k, new_b = W.sample_tensors(
        [kernel, bias], sampling_instructions=[3, 3, 4, 20], axes=[[3]],
        init=["gaussian"] * 4,
    )
    assert new_k.shape == (3, 3, 4, 20)
    np.testing.assert_allclose(new_k[..., :10], kernel)
    np.testing.assert_allclose(new_b[:10], bias)


def test_sample_classifier_weights_background_kept():
    """Porting a 21-class head to 6 classes keeps class 0 per box."""
    n_boxes, n_src = 4, 21
    kernel = np.random.randn(3, 3, 16, n_boxes * n_src)
    bias = np.random.randn(n_boxes * n_src)
    classes = [0, 1, 5, 7, 9, 15]
    new_k, new_b = W.sample_classifier_weights(kernel, bias, n_src, classes, n_boxes)
    assert new_k.shape[-1] == n_boxes * len(classes)
    # First kept channel of every box block is the background channel.
    for b in range(n_boxes):
        np.testing.assert_allclose(
            new_k[..., b * len(classes)], kernel[..., b * n_src]
        )


def test_ssd300_h5_name_contract(tmp_path):
    """A reference-style .h5 with ALL SSD300 layer names must load completely
    (the weight-port contract for the ported Caffe VGG/SSD weights)."""
    import jax

    from ssd_keras_tpu.models import ssd_300

    model, _ = ssd_300()
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)["params"]
    # Materialize a fake checkpoint with the reference's names/shapes.
    params = {
        layer: {k: np.zeros(v.shape, np.float32) for k, v in tensors.items()}
        for layer, tensors in shapes.items()
    }
    path = str(tmp_path / "vgg_ssd300.h5")
    with h5py.File(path, "w") as f:
        for layer, tensors in params.items():
            if set(tensors) == {"gamma"}:
                # Real Keras files store L2Normalization's weight as a flat
                # '{layer}_gamma:0' dataset (keras_layer_L2Normalization.py:57).
                f.create_group(layer).create_dataset(
                    f"{layer}_gamma:0", data=tensors["gamma"] + 1.5
                )
                continue
            g = f.create_group(layer).create_group(layer)
            for key, arr in tensors.items():
                keras_key = {"kernel": "kernel:0", "bias": "bias:0"}[key]
                g.create_dataset(keras_key, data=arr + 1.5)
    loaded, _, names = W.load_keras_h5_weights(path, params)
    assert sorted(names) == sorted(params)  # every layer matched by name
    assert len(names) == 36  # 23 trunk convs + L2Norm + 12 heads
    np.testing.assert_allclose(loaded["fc6"]["kernel"], 1.5)
    np.testing.assert_allclose(loaded["conv4_3_norm"]["gamma"], 1.5)


def _write_keras_style_file(path, layers):
    """Write an .h5 byte-faithful to Keras 2.x save_weights output.

    ``layers``: list of (layer_name, {dataset_name: array}) — dataset names
    are full Keras variable names ('conv1_1/kernel:0' or 'norm_gamma:0').
    Weightless layers (empty dict) still get a group + empty weight_names,
    exactly like Keras writes them for Input/Activation/Reshape layers.
    """
    with h5py.File(path, "w") as f:
        f.attrs["backend"] = np.asarray(b"tensorflow")
        f.attrs["keras_version"] = np.asarray(b"2.2.4")
        f.attrs["layer_names"] = np.array(
            [n.encode("utf8") for n, _ in layers], dtype="S64"
        )
        for name, weights in layers:
            g = f.create_group(name)
            g.attrs["weight_names"] = np.array(
                [w.encode("utf8") for w in weights], dtype="S64"
            )
            for wname, arr in weights.items():
                g.create_dataset(wname, data=arr)


def test_load_real_keras_layout_l2norm_gamma(tmp_path):
    """The ported reference checkpoints name L2Norm's weight
    'conv4_3_norm_gamma:0'; it must land on the flax 'gamma' param, not be
    silently skipped (ADVICE r1, high)."""
    gamma = np.full((8,), 3.75, np.float32)
    kernel = np.random.randn(3, 3, 3, 8).astype(np.float32)
    bias = np.zeros((8,), np.float32)
    path = str(tmp_path / "keras_real.h5")
    _write_keras_style_file(path, [
        ("input_1", {}),
        ("conv4_3", {"conv4_3/kernel:0": kernel, "conv4_3/bias:0": bias}),
        ("conv4_3_norm", {"conv4_3_norm_gamma:0": gamma}),
        ("conv4_3_norm_mbox_conf_reshape", {}),
    ])
    params = {
        "conv4_3": {"kernel": np.zeros_like(kernel), "bias": np.ones_like(bias)},
        "conv4_3_norm": {"gamma": np.full((8,), 20.0, np.float32)},
    }
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any unconsumed-dataset warning fails
        loaded, _, names = W.load_keras_h5_weights(path, params)
    assert sorted(names) == ["conv4_3", "conv4_3_norm"]
    np.testing.assert_allclose(loaded["conv4_3_norm"]["gamma"], 3.75)
    np.testing.assert_allclose(loaded["conv4_3"]["kernel"], kernel)


def test_load_warns_on_unconsumed_datasets(tmp_path):
    """A matched layer with an unmappable dataset must warn (or raise),
    never silently leave the model weight at init."""
    path = str(tmp_path / "bad.h5")
    _write_keras_style_file(path, [
        ("conv1", {"conv1/kernel:0": np.zeros((1, 1, 3, 4), np.float32),
                   "conv1/mystery_weight:0": np.zeros((4,), np.float32)}),
    ])
    params = {"conv1": {"kernel": np.ones((1, 1, 3, 4), np.float32)}}
    with pytest.warns(UserWarning, match="mystery_weight"):
        W.load_keras_h5_weights(path, params)
    with pytest.raises(ValueError, match="mystery_weight"):
        W.load_keras_h5_weights(path, params, on_unconsumed="raise")
    # 'ignore' stays silent.
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        W.load_keras_h5_weights(path, params, on_unconsumed="ignore")


def test_save_writes_keras_attrs(tmp_path, ssd7_variables):
    """Exported files must carry the Keras topological attrs
    (layer_names / weight_names / backend) so actual Keras can read them."""
    params = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(ssd7_variables["batch_stats"]))
    path = str(tmp_path / "export.h5")
    W.save_keras_h5_weights(path, params, stats)
    with h5py.File(path, "r") as f:
        layer_names = [n.decode("utf8") for n in f.attrs["layer_names"]]
        assert layer_names == list(params)
        assert f.attrs["backend"] == b"tensorflow"
        for name in layer_names:
            wnames = [w.decode("utf8") for w in f[name].attrs["weight_names"]]
            assert wnames, name
            for w in wnames:  # every advertised weight exists as a dataset
                assert w in f[name], (name, w)
        # Conv layers use the nested '{layer}/{w}:0' path convention.
        assert "conv1/kernel:0" in [
            w.decode("utf8") for w in f["conv1"].attrs["weight_names"]
        ]


def test_save_l2norm_gamma_uses_keras_variable_name(tmp_path):
    """Gamma-only layers export as flat '{layer}_gamma:0', the name real
    Keras produces for the reference's L2Normalization — and round-trip."""
    params = {"conv4_3_norm": {"gamma": np.full((4,), 7.0, np.float32)}}
    path = str(tmp_path / "norm.h5")
    W.save_keras_h5_weights(path, params)
    with h5py.File(path, "r") as f:
        assert "conv4_3_norm_gamma:0" in f["conv4_3_norm"]
        assert [w.decode("utf8") for w in f["conv4_3_norm"].attrs["weight_names"]] \
            == ["conv4_3_norm_gamma:0"]
    target = {"conv4_3_norm": {"gamma": np.zeros((4,), np.float32)}}
    loaded, _, names = W.load_keras_h5_weights(path, target)
    assert names == ["conv4_3_norm"]
    np.testing.assert_allclose(loaded["conv4_3_norm"]["gamma"], 7.0)
