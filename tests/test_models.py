"""Model builders: predictor-size formulas vs traced shapes, output layout,
parameter naming, and preprocessing semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.models import (
    ssd_7,
    ssd_300,
    ssd_512,
    ssd300_predictor_sizes,
    ssd512_predictor_sizes,
    ssd7_predictor_sizes,
)
from ssd_keras_tpu.models.layers import L2Normalization, preprocess_input


def test_ssd300_predictor_size_formula():
    assert ssd300_predictor_sizes(300, 300) == [
        (38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)
    ]


def test_ssd512_predictor_size_formula():
    assert ssd512_predictor_sizes(512, 512) == [
        (64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)
    ]


def test_ssd7_predictor_size_formula():
    assert ssd7_predictor_sizes(300, 480) == [(37, 60), (18, 30), (9, 15), (4, 7)]


@pytest.mark.parametrize(
    "builder,cfg,expected_boxes",
    [
        (ssd_300, SSDConfig.ssd300(), 8732),
        (ssd_512, SSDConfig.ssd512(), 24564),
    ],
)
def test_big_models_traced_shapes(builder, cfg, expected_boxes):
    """Shape-only trace (eval_shape): no FLOPs, validates the formulas against
    the real graph."""
    model, sizes = builder(cfg)
    x = jnp.zeros((1, cfg.img_height, cfg.img_width, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x), variables, x
    )
    assert out.shape == (1, expected_boxes, cfg.n_classes_with_background + 12)


def test_ssd300_parameter_names():
    cfg = SSDConfig.ssd300()
    model, _ = ssd_300(cfg)
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    names = set(variables["params"].keys())
    expected = {
        "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
        "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
        "conv5_3", "fc6", "fc7", "conv6_1", "conv6_2", "conv7_1", "conv7_2",
        "conv8_1", "conv8_2", "conv9_1", "conv9_2", "conv4_3_norm",
    } | {
        f"{src}_mbox_{head}"
        for src in ("conv4_3_norm", "fc7", "conv6_2", "conv7_2", "conv8_2", "conv9_2")
        for head in ("conf", "loc")
    }
    assert names == expected
    # HWIO kernel layout, VGG conv1_1: (3, 3, 3, 64)
    assert variables["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert variables["params"]["fc6"]["kernel"].shape == (3, 3, 512, 1024)
    assert variables["params"]["conv4_3_norm"]["gamma"].shape == (512,)


def test_ssd7_forward_and_softmax_layout():
    cfg = SSDConfig.ssd7(n_classes=4, img_height=64, img_width=96)
    model, sizes = ssd_7(cfg)
    x = np.random.RandomState(0).rand(2, 64, 96, 3).astype(np.float32) * 255
    variables = model.init(jax.random.PRNGKey(0), x)
    y = np.asarray(model.apply(variables, x))
    C = cfg.n_classes_with_background
    assert y.shape == (2, cfg.total_boxes(sizes), C + 12)
    # Confidences are softmaxed: rows sum to 1.
    np.testing.assert_allclose(y[:, :, :C].sum(-1), 1.0, rtol=1e-5)
    # Anchor slots match the shared generator.
    np.testing.assert_allclose(
        y[0, :, -8:], cfg.anchor_tensor(sizes), rtol=1e-5, atol=1e-6
    )


def test_ssd7_s2d_trunk_matches_plain():
    """The space-to-depth conv1 graph (models/layers.py:s2d_conv_kernel) is
    an exact rewrite of conv1+bn1+ELU+pool1: same parameter tree, matching
    outputs and BN batch statistics in both train and eval mode."""
    cfg = SSDConfig.ssd7(n_classes=4, img_height=64, img_width=96)
    m_plain, _ = ssd_7(cfg, s2d_trunk=False)
    m_s2d, _ = ssd_7(cfg, s2d_trunk=True)
    x = np.random.RandomState(1).rand(2, 64, 96, 3).astype(np.float32) * 255
    v = m_plain.init(jax.random.PRNGKey(0), x)
    v2 = m_s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape

    y_plain = np.asarray(m_plain.apply(v, x, train=False))
    y_s2d = np.asarray(m_s2d.apply(v, x, train=False))
    np.testing.assert_allclose(y_s2d, y_plain, rtol=1e-4, atol=1e-4)

    yt_plain, mut_plain = m_plain.apply(v, x, train=True, mutable=["batch_stats"])
    yt_s2d, mut_s2d = m_s2d.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yt_s2d), np.asarray(yt_plain),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mut_plain["batch_stats"]),
                    jax.tree_util.tree_leaves(mut_s2d["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_s2d_conv_kernel_rejects_unsupported_kernels():
    """The block-tap table only covers k<=5; unsupported shapes must raise
    instead of silently dropping taps (ADVICE r3)."""
    from ssd_keras_tpu.models.layers import s2d_conv_kernel

    with pytest.raises(ValueError, match="square"):
        s2d_conv_kernel(jnp.zeros((3, 5, 4, 8)), jnp.zeros((8,)))
    with pytest.raises(ValueError, match="k in"):
        s2d_conv_kernel(jnp.zeros((7, 7, 4, 8)), jnp.zeros((8,)))
    with pytest.raises(ValueError, match="k in"):
        s2d_conv_kernel(jnp.zeros((4, 4, 4, 8)), jnp.zeros((8,)))


def test_ssd300_s2d_trunk_matches_plain():
    """conv1_1 in space-to-depth form (models/ssd300.py:SSD300.s2d_trunk) is
    an exact rewrite: same parameter tree (plain (3,3,3,64) conv1_1 layout,
    so .h5 ports are unaffected), matching predictions."""
    cfg = SSDConfig.ssd300(n_classes=4)
    m_plain, _ = ssd_300(cfg, s2d_trunk=False)
    m_s2d, _ = ssd_300(cfg, s2d_trunk=True)
    x = np.random.RandomState(2).rand(1, 300, 300, 3).astype(np.float32) * 255
    v = m_plain.init(jax.random.PRNGKey(0), x)
    v2 = m_s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    assert v2["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    y_plain = np.asarray(m_plain.apply(v, x))
    y_s2d = np.asarray(m_s2d.apply(v, x))
    # Isolated, the transform matches to conv-accumulation noise (~5e-4 abs
    # on outputs of magnitude ~1e3); through 20 VGG layers + softmax that
    # noise grows to ~1e-3. A wrong tap would err by ~1e1.
    np.testing.assert_allclose(y_s2d, y_plain, rtol=1e-3, atol=1e-3)


def test_ssd512_s2d_trunk_param_tree_and_fallback():
    """SSD512's s2d_trunk keeps the plain conv1_1 parameter layout, and odd
    input sizes degrade gracefully to the plain graph (no s2d possible)."""
    cfg = SSDConfig.ssd512(n_classes=4)
    m, _ = ssd_512(cfg, s2d_trunk=True)
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    assert variables["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)

    cfg_odd = SSDConfig.ssd300(n_classes=4, img_height=301, img_width=300)
    m_odd, _ = ssd_300(cfg_odd, s2d_trunk=True)
    x_odd = jnp.zeros((1, 301, 300, 3), jnp.float32)
    v_odd = jax.eval_shape(m_odd.init, jax.random.PRNGKey(0), x_odd)
    assert v_odd["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)


def test_ssd7_s2d_trunk_odd_input_falls_back():
    """Odd input sizes can't space-to-depth; the flag degrades gracefully."""
    cfg = SSDConfig.ssd7(n_classes=3, img_height=65, img_width=96)
    model, _ = ssd_7(cfg, s2d_trunk=True)
    x = jnp.zeros((1, 65, 96, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    assert variables["params"]["conv1"]["kernel"].shape == (5, 5, 3, 32)


def test_l2_normalization_unit_norm_times_gamma():
    layer = L2Normalization(gamma_init=20.0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 2, 8).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = np.asarray(layer.apply(params, x))
    norms = np.linalg.norm(y, axis=-1)
    np.testing.assert_allclose(norms, 20.0, rtol=1e-5)


def test_preprocessing_mean_swap():
    x = jnp.asarray(np.ones((1, 2, 2, 3), np.float32) * [10, 20, 30])
    out = np.asarray(
        preprocess_input(x, subtract_mean=(1, 2, 3), divide_by_stddev=None,
                         swap_channels=(2, 1, 0))
    )
    np.testing.assert_allclose(out[0, 0, 0], [27, 18, 9])


def test_bfloat16_compute_dtype():
    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, compute_dtype=jnp.bfloat16)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.dtype == jnp.float32  # head assembly promotes back to f32
    assert np.all(np.isfinite(np.asarray(y)))


def test_ssd_predictor_end_to_end():
    from ssd_keras_tpu.predictor import SSDPredictor

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="inference")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    predictor = SSDPredictor(model, variables, batch_size=2)

    rng = np.random.RandomState(0)
    # Three images of different sizes; 3 images > batch 2 forces chunk+pad.
    images = [rng.randint(0, 255, (s, s + 10, 3), dtype=np.uint8)
              for s in (64, 100, 40)]
    results = predictor(images)
    assert len(results) == 3
    for dets in results:
        assert dets.ndim == 2 and dets.shape[1] == 6
        if len(dets):
            assert np.all(dets[:, 0] != 0)  # zero padding rows removed
            assert np.all(dets[:, 1] > 0)

    # Boxes scale with the original image size: force the resize step to
    # produce identical model input, so detections must differ only by the
    # original-frame scale factor (host-resize path so it can be stubbed).
    host_pred = SSDPredictor(model, variables, batch_size=2,
                             resize_on_device=False)
    base = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8).astype(np.float32)
    host_pred._resize_host = lambda image: base
    d_small = host_pred([base])[0]  # 64x64: no resize, scale 1
    d_big = host_pred([np.zeros((128, 128, 3), np.uint8)])[0]  # forced -> base
    assert len(d_small) == len(d_big)
    if len(d_small):
        np.testing.assert_allclose(d_big[:, 2:], d_small[:, 2:] * 2, rtol=1e-4)
        np.testing.assert_allclose(d_big[:, :2], d_small[:, :2], rtol=1e-5)


def test_ssd_predictor_compiled_cache_lru():
    """The per-input-shape program cache is LRU-bounded: serving arbitrary
    resolutions must not retain an unbounded number of compiled programs,
    and eviction must not change results."""
    from ssd_keras_tpu.predictor import SSDPredictor

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="inference")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    predictor = SSDPredictor(model, variables, batch_size=1,
                             max_compiled_shapes=2)

    rng = np.random.RandomState(5)
    imgs = {s: rng.randint(0, 255, (s, s, 3), dtype=np.uint8)
            for s in (64, 72, 80)}
    first = predictor([imgs[64]])[0]
    predictor([imgs[72]])
    predictor([imgs[80]])  # evicts the (64, 64) program
    assert len(predictor._compiled) == 2
    assert (64, 64, "|u1") not in predictor._compiled
    again = predictor([imgs[64]])[0]  # recompiles, same result
    np.testing.assert_allclose(again, first, rtol=1e-5, atol=1e-5)
    assert len(predictor._compiled) == 2


def test_ssd_predictor_stream_pipeline_ordering():
    """A long stream (many chunks) exercises the double-buffered upload
    pipeline's mid-loop drains: per-image results must be identical to
    serving each image alone, in the caller's order."""
    from ssd_keras_tpu.predictor import SSDPredictor

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="inference")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.RandomState(2)
    images = [rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
              for _ in range(9)]  # batch 2 -> 5 chunks, pending caps at 3

    predictor = SSDPredictor(model, variables, batch_size=2)
    streamed = predictor(images)
    assert len(streamed) == len(images)
    # Oracle: one call per chunk (no mid-loop drains) at the SAME batch size,
    # so any mismatch is pipeline bookkeeping, not batching numerics.
    chunked = [d for i in range(0, len(images), 2)
               for d in predictor(images[i:i + 2])]
    for got, want in zip(streamed, chunked):
        np.testing.assert_array_equal(got, want)


def test_device_resize_matches_pil():
    """The fused device resample is numerically interchangeable with the
    reference workflow's PIL bilinear resize (VERDICT r1 weak #1)."""
    from PIL import Image

    from ssd_keras_tpu.predictor import device_resize_batch

    rng = np.random.RandomState(1)
    # Smooth image: bilinear conventions agree away from aliasing edge cases.
    yy, xx = np.mgrid[0:100, 0:120]
    img = np.stack([yy * 2, xx * 1.5, (yy + xx)], axis=-1)
    img = (img / img.max() * 255).astype(np.uint8)
    img += rng.randint(0, 5, img.shape, dtype=np.uint8)

    got = np.asarray(device_resize_batch(jnp.asarray(img[None]), 64, 64))[0]
    want = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.BILINEAR), np.float32
    )
    # PIL quantizes to uint8; allow ~1.5 LSB.
    assert np.abs(got - want).mean() < 1.0
    assert np.abs(got - want).max() < 4.0


def test_ssd_predictor_device_path_vs_host_path():
    """Device-resize detections must match the host(PIL)-resize detections on
    the same inputs (same boxes, confidences within resample tolerance)."""
    from ssd_keras_tpu.predictor import SSDPredictor

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="inference")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    rng = np.random.RandomState(2)
    # Smooth large image so both resizers see the same signal.
    yy, xx = np.mgrid[0:128, 0:96]
    img = ((np.stack([yy, xx, yy + xx], -1) % 97) * 2.6).astype(np.uint8)
    dev = SSDPredictor(model, variables, batch_size=2)([img])[0]
    host = SSDPredictor(model, variables, batch_size=2,
                        resize_on_device=False)([img])[0]
    # Random-init model: near-tied confidences can reorder the tail, so
    # require each top device detection to have a matching host detection
    # (same class, same box, close confidence) rather than rank alignment.
    assert len(dev) and len(host)
    matched = 0
    for det in dev[:5]:
        same_class = host[host[:, 0] == det[0]]
        if len(same_class):
            dist = np.abs(same_class[:, 2:] - det[2:]).max(axis=1)
            conf = np.abs(same_class[:, 1] - det[1])
            if np.any((dist < 3.0) & (conf < 0.05)):
                matched += 1
    assert matched >= min(len(dev), 5) - 1


def test_ssd_predictor_grayscale_fallback():
    """Non-3-channel inputs route through the PIL fallback and still work."""
    from ssd_keras_tpu.predictor import SSDPredictor

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="inference")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    predictor = SSDPredictor(model, variables, batch_size=2)
    gray = np.random.RandomState(3).randint(0, 255, (80, 70), np.uint8)
    rgb = np.random.RandomState(3).randint(0, 255, (80, 70, 3), np.uint8)
    results = predictor([gray, rgb])
    assert len(results) == 2
    for dets in results:
        assert dets.ndim == 2 and dets.shape[1] == 6


def test_ssd_predictor_rejects_training_mode():
    from ssd_keras_tpu.predictor import SSDPredictor

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="training")
    with pytest.raises(ValueError):
        SSDPredictor(model, {})
