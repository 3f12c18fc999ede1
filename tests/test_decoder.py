"""Decoder: host decoders vs the reference oracle; fixed-shape in-graph
decoders vs the host decoders on identical inputs."""

import numpy as np
import pytest

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu import decoder as D

from conftest import requires_reference

SIZES7 = [(8, 8), (4, 4), (2, 2), (1, 1)]


@pytest.fixture(scope="module")
def y_pred():
    """Synthetic raw predictions with plausible confidences and offsets."""
    cfg = SSDConfig.ssd7(n_classes=5, img_height=64, img_width=64)
    anchors8 = cfg.anchor_tensor(SIZES7)
    n = anchors8.shape[0]
    rng = np.random.RandomState(0)
    batch = 3
    logits = rng.randn(batch, n, 6) * 2
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    offsets = rng.randn(batch, n, 4) * 0.5
    anchors = np.broadcast_to(anchors8, (batch, n, 8))
    return np.concatenate([conf, offsets, anchors], axis=2)


def test_decode_offsets_zero_offsets_give_anchor_boxes():
    cfg = SSDConfig.ssd7(n_classes=5, img_height=64, img_width=64)
    anchors8 = cfg.anchor_tensor(SIZES7)
    n = anchors8.shape[0]
    y = np.concatenate(
        [np.zeros((1, n, 6)), np.zeros((1, n, 4)), anchors8[None]], axis=2
    )
    corners = D.decode_offsets(y, "centroids", True, 64, 64)
    cx = (corners[0, :, 0] + corners[0, :, 2]) / 2 / 64
    np.testing.assert_allclose(cx, anchors8[:, 0], atol=1e-5)


@requires_reference
def test_host_decode_parity(y_pred):
    from ssd_encoder_decoder.ssd_output_decoder import (
        decode_detections as ref_decode,
    )

    expected = ref_decode(
        y_pred, confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    got = D.decode_detections(
        y_pred, confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        g = g[np.lexsort((g[:, 1], g[:, 0]))]
        e = e[np.lexsort((e[:, 1], e[:, 0]))]
        np.testing.assert_allclose(g, e, rtol=1e-6, atol=1e-9)


@requires_reference
def test_host_decode_fast_parity(y_pred):
    from ssd_encoder_decoder.ssd_output_decoder import (
        decode_detections_fast as ref_fast,
    )

    expected = ref_fast(
        y_pred, confidence_thresh=0.3, iou_threshold=0.45, top_k="all",
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    got = D.decode_detections_fast(
        y_pred, confidence_thresh=0.3, iou_threshold=0.45, top_k="all",
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    for g, e in zip(got, expected):
        np.testing.assert_allclose(g, e, rtol=1e-6, atol=1e-9)


def test_fixed_decode_matches_host(y_pred):
    """The in-graph fixed-shape decode must select the same boxes as the host
    per-class decoder (up to the zero-padding representation)."""
    kwargs = dict(
        confidence_thresh=0.3, iou_threshold=0.45,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    host = D.decode_detections(y_pred, top_k=20, **kwargs)
    fixed = np.array(D.decode_detections_fixed(y_pred, top_k=20, **kwargs))
    assert fixed.shape == (y_pred.shape[0], 20, 6)
    for b in range(y_pred.shape[0]):
        rows_fixed = fixed[b][fixed[b][:, 1] > 0]
        rows_host = host[b]
        assert rows_fixed.shape[0] == rows_host.shape[0]
        order_f = np.lexsort((rows_fixed[:, 1], rows_fixed[:, 0]))
        order_h = np.lexsort((rows_host[:, 1], rows_host[:, 0]))
        np.testing.assert_allclose(
            rows_fixed[order_f], rows_host[order_h], rtol=1e-4, atol=1e-4
        )


def test_fixed_decode_fast_shape_and_padding(y_pred):
    out = np.array(
        D.decode_detections_fast_fixed(
            y_pred, confidence_thresh=0.5, top_k=50,
            input_coords="centroids", normalize_coords=True,
            img_height=64, img_width=64,
        )
    )
    assert out.shape == (3, 50, 6)
    # Padding rows must be exactly zero.
    pad = out[out[:, :, 1] == 0]
    assert np.all(pad == 0)


def test_nms_cap_larger_than_boxes(y_pred):
    """nms_max_output_size > #anchors must not crash (SSD7 has 340 < 400)."""
    out = np.array(
        D.decode_detections_fixed(
            y_pred, nms_max_output_size=400, top_k=200,
            confidence_thresh=0.3, input_coords="centroids",
            normalize_coords=True, img_height=64, img_width=64,
        )
    )
    assert out.shape == (3, 200, 6)


def test_greedy_nms_suppresses_overlaps():
    rows = np.array([
        [0.9, 0, 0, 10, 10],
        [0.8, 1, 1, 11, 11],   # IoU with first > 0.45 -> suppressed
        [0.7, 50, 50, 60, 60],
    ])
    kept = D.greedy_nms(rows, iou_threshold=0.45)
    assert kept.shape[0] == 2
    assert set(kept[:, 0].tolist()) == {0.9, 0.7}


@requires_reference
def test_debug_decode_parity(y_pred):
    from ssd_encoder_decoder.ssd_output_decoder import (
        decode_detections_debug as ref_debug,
    )

    expected = ref_debug(
        y_pred, confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    got = D.decode_detections_debug(
        y_pred, confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    for g, e in zip(got, expected):
        g = g[np.lexsort((g[:, 2], g[:, 1], g[:, 0]))]
        e = e[np.lexsort((e[:, 2], e[:, 1], e[:, 0]))]
        np.testing.assert_allclose(g, e, rtol=1e-6, atol=1e-9)


def test_get_pred_layers():
    counts = [100, 50, 25]
    decoded = [np.array([[0, 1, 0.9, 0, 0, 1, 1],
                         [120, 1, 0.8, 0, 0, 1, 1],
                         [160, 2, 0.7, 0, 0, 1, 1]])]
    layers = D.get_pred_layers(decoded, counts)
    assert layers == [[0, 1, 2]]
    # layer 1: 4 boxes/cell (ar1 doubled); layer 2: 3 boxes/cell.
    assert D.get_num_boxes_per_pred_layer(
        [(10, 10), (5, 5)], [[1.0, 2.0, 0.5], [1.0, 2.0]], True
    ) == [400, 75]


def test_pallas_nms_interpret_matches_scan(y_pred):
    """The Pallas NMS kernel (interpret mode on CPU) must select exactly the
    same boxes as the XLA scan implementation."""
    kwargs = dict(
        confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    scan = np.array(D.decode_detections_fixed(y_pred, nms_impl="scan", **kwargs))
    pallas = np.array(
        D.decode_detections_fixed(y_pred, nms_impl="pallas_interpret", **kwargs)
    )
    np.testing.assert_allclose(pallas, scan, rtol=1e-5, atol=1e-5)


def test_pallas_nms_mask_direct():
    from ssd_keras_tpu.kernels.nms_pallas import greedy_nms_mask_batched
    from ssd_keras_tpu.ops.nms import greedy_nms_mask
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    L, K = 5, 37
    boxes = rng.rand(L, K, 4).astype(np.float32) * 50
    boxes[..., 2:] = boxes[..., :2] + rng.rand(L, K, 2).astype(np.float32) * 30 + 1
    scores = -np.sort(-rng.rand(L, K).astype(np.float32))  # descending
    valid = scores > 0.3
    expected = np.asarray(
        jax.vmap(lambda b, v: greedy_nms_mask(b, v, 0.5))(
            jnp.asarray(boxes), jnp.asarray(valid)
        )
    )
    got = np.asarray(
        greedy_nms_mask_batched(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True
        )
    )
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("impl", ["fixpoint", "blocked"])
def test_nms_impl_variants_match_scan(y_pred, impl):
    kwargs = dict(
        confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    scan = np.array(D.decode_detections_fixed(y_pred, nms_impl="scan", **kwargs))
    got = np.array(D.decode_detections_fixed(y_pred, nms_impl=impl, **kwargs))
    np.testing.assert_allclose(got, scan, rtol=1e-5, atol=1e-5)


def test_nms_fixpoint_fuzz():
    import jax
    import jax.numpy as jnp

    from ssd_keras_tpu.ops.nms import greedy_nms_mask, greedy_nms_mask_fixpoint

    rng = np.random.RandomState(7)
    for trial in range(5):
        L, K = 6, 50
        # Dense overlaps to force deep suppression chains.
        boxes = rng.rand(L, K, 4).astype(np.float32) * 40
        boxes[..., 2:] = boxes[..., :2] + rng.rand(L, K, 2).astype(np.float32) * 30 + 3
        valid = rng.rand(L, K) > 0.2
        expected = np.asarray(
            jax.vmap(lambda b, v: greedy_nms_mask(b, v, 0.45))(
                jnp.asarray(boxes), jnp.asarray(valid)
            )
        )
        got = np.asarray(
            greedy_nms_mask_fixpoint(jnp.asarray(boxes), jnp.asarray(valid), 0.45)
        )
        np.testing.assert_array_equal(got, expected)
