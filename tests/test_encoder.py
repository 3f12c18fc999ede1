"""Target encoder: parity with the reference encoder and property tests.

Fixtures use non-integer (jittered) coordinates: XLA's FMA contraction makes
IoU values differ from NumPy at the ~1e-15 level, which would flip matches at
*exact* geometric ties (equally valid matchings); jitter removes the ties so
parity can be asserted exactly. See .claude/skills/verify/SKILL.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.encoder import DegenerateBoxError, SSDInputEncoder, pad_labels

from conftest import requires_reference

SIZES7 = [(8, 8), (4, 4), (2, 2), (1, 1)]


@pytest.fixture(scope="module")
def cfg():
    return SSDConfig.ssd7(n_classes=5, img_height=64, img_width=64)


@pytest.fixture(scope="module")
def encoder(cfg):
    return SSDInputEncoder(cfg, SIZES7, max_gt_boxes=8)


def _random_gts(rng, n_images, jitter=True):
    gts = []
    for _ in range(n_images):
        k = rng.randint(1, 8)
        boxes = []
        for _ in range(k):
            x1, y1 = rng.randint(0, 48, 2).astype(float)
            w, h = rng.randint(4, 16, 2).astype(float)
            if jitter:
                x1 += rng.rand() * 0.9
                y1 += rng.rand() * 0.9
                w += rng.rand() * 0.9
                h += rng.rand() * 0.9
            boxes.append([rng.randint(1, 6), x1, y1, x1 + w, y1 + h])
        gts.append(np.array(boxes))
    return gts


def test_output_shape_and_background_default(encoder, cfg):
    y = encoder([np.zeros((0, 5))])
    assert y.shape == (1, 340, cfg.n_classes_with_background + 12)
    # Empty GT: every anchor is background with zero offsets.
    assert np.all(y[0, :, 0] == 1)
    assert np.all(y[0, :, -12:-8] == 0)
    # Anchor slots and variances are filled.
    assert np.all(y[0, :, -4:] == 1.0)  # ssd7 variances


def test_every_gt_gets_a_match(encoder):
    rng = np.random.RandomState(0)
    gts = _random_gts(rng, 4)
    y = encoder(gts)
    for i, gt in enumerate(gts):
        n_pos = int((y[i, :, 1:-12].max(-1) > 0).sum())
        assert n_pos >= len(gt)  # bipartite guarantees >= 1 anchor per GT


def test_degenerate_raises(encoder):
    with pytest.raises(DegenerateBoxError):
        encoder([np.array([[1, 10, 10, 10, 20]])])


def test_diagnostics_zero_offsets(encoder):
    rng = np.random.RandomState(1)
    y, y_matched = encoder(_random_gts(rng, 2), diagnostics=True)
    assert np.all(y_matched[:, :, -12:-8] == 0)
    np.testing.assert_array_equal(y[:, :, :-12], y_matched[:, :, :-12])


def test_pad_labels_counts():
    gts = [np.zeros((0, 5)), np.ones((3, 5))]
    padded, counts = pad_labels(gts, 8)
    assert padded.shape == (2, 8, 5)
    assert counts.tolist() == [0, 3]
    with pytest.raises(ValueError):
        pad_labels([np.ones((9, 5))], 8)


def test_encode_decode_roundtrip(encoder, cfg):
    """Positive anchors' offsets must decode back to the original GT boxes."""
    from ssd_keras_tpu.decoder import decode_offsets

    rng = np.random.RandomState(2)
    gts = _random_gts(rng, 2)
    y = encoder(gts)
    corners = decode_offsets(
        y, input_coords=cfg.coords, normalize_coords=cfg.normalize_coords,
        img_height=64, img_width=64,
    )
    for i, gt in enumerate(gts):
        pos = y[i, :, 1:-12].max(-1) > 0
        decoded = corners[i][pos]
        # Every original GT box appears among the decoded positive anchors.
        for box in gt:
            dists = np.abs(decoded - box[1:]).max(axis=1)
            assert dists.min() < 1e-3, f"gt {box} not recovered"


@requires_reference
def test_parity_with_reference_encoder(cfg, encoder):
    from ssd_encoder_decoder.ssd_input_encoder import SSDInputEncoder as RefEncoder

    ref = RefEncoder(
        img_height=64, img_width=64, n_classes=5, predictor_sizes=SIZES7,
        scales=list(cfg.scales), aspect_ratios_global=[0.5, 1.0, 2.0],
        two_boxes_for_ar1=True, variances=list(cfg.variances),
        matching_type="multi", pos_iou_threshold=0.5, neg_iou_limit=0.3,
        normalize_coords=True,
    )
    rng = np.random.RandomState(3)
    gts = _random_gts(rng, 8, jitter=True)
    expected = ref(gts)
    got = encoder(gts)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@requires_reference
def test_parity_bipartite_mode(cfg):
    from ssd_encoder_decoder.ssd_input_encoder import SSDInputEncoder as RefEncoder

    cfg_b = SSDConfig.ssd7(
        n_classes=5, img_height=64, img_width=64, matching_type="bipartite"
    )
    mine = SSDInputEncoder(cfg_b, SIZES7, max_gt_boxes=8)
    ref = RefEncoder(
        img_height=64, img_width=64, n_classes=5, predictor_sizes=SIZES7,
        scales=list(cfg_b.scales), aspect_ratios_global=[0.5, 1.0, 2.0],
        variances=list(cfg_b.variances), matching_type="bipartite",
        neg_iou_limit=0.3, normalize_coords=True,
    )
    rng = np.random.RandomState(4)
    gts = _random_gts(rng, 4, jitter=True)
    np.testing.assert_allclose(mine(gts), ref(gts), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("coords", ["corners", "minmax"])
def test_alternative_coords_roundtrip(coords):
    """Encoding and decoding must invert each other in every coords mode."""
    from ssd_keras_tpu.decoder import decode_offsets

    cfg_c = SSDConfig.ssd7(
        n_classes=5, img_height=64, img_width=64, coords=coords
    )
    enc = SSDInputEncoder(cfg_c, SIZES7, max_gt_boxes=8)
    rng = np.random.RandomState(7)
    gts = _random_gts(rng, 3)
    y = enc(gts)
    corners = decode_offsets(
        y, input_coords=coords, normalize_coords=True, img_height=64, img_width=64
    )
    for i, gt in enumerate(gts):
        pos = y[i, :, 1:-12].max(-1) > 0
        decoded = corners[i][pos]
        for box in gt:
            dists = np.abs(decoded - box[1:]).max(axis=1)
            assert dists.min() < 1e-2, f"{coords}: gt {box} not recovered"


@requires_reference
@pytest.mark.parametrize("coords", ["corners", "minmax"])
def test_parity_alternative_coords(coords):
    from ssd_encoder_decoder.ssd_input_encoder import SSDInputEncoder as RefEncoder

    cfg_c = SSDConfig.ssd7(n_classes=5, img_height=64, img_width=64, coords=coords)
    mine = SSDInputEncoder(cfg_c, SIZES7, max_gt_boxes=8)
    ref = RefEncoder(
        img_height=64, img_width=64, n_classes=5, predictor_sizes=SIZES7,
        scales=list(cfg_c.scales), aspect_ratios_global=[0.5, 1.0, 2.0],
        variances=list(cfg_c.variances), coords=coords,
        neg_iou_limit=0.3, normalize_coords=True,
    )
    rng = np.random.RandomState(8)
    gts = _random_gts(rng, 4, jitter=True)
    np.testing.assert_allclose(mine(gts), ref(gts), rtol=1e-4, atol=1e-5)


def test_out_of_range_class_raises(encoder):
    with pytest.raises(ValueError, match="class IDs outside"):
        encoder([np.array([[9, 10, 10, 30, 30]])])  # only 5 classes configured
    with pytest.raises(ValueError, match="class IDs outside"):
        encoder([np.array([[0, 10, 10, 30, 30]])])  # background not allowed


def test_pad_labels_truncate_keeps_largest():
    boxes = np.array([
        [1, 0, 0, 10, 10],   # area 100
        [2, 0, 0, 50, 50],   # area 2500 (largest)
        [3, 0, 0, 20, 20],   # area 400
    ], dtype=np.float32)
    padded, counts = pad_labels([boxes], 2, truncate=True)
    assert counts.tolist() == [2]
    kept_classes = set(padded[0, :2, 0].astype(int).tolist())
    assert kept_classes == {2, 3}
