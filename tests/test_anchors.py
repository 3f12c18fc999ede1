"""Anchor generation: golden values, counts, and parity with the reference
encoder's NumPy anchor grids (SSD300 / SSD512 canonical configs)."""

import numpy as np
import pytest

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.ops import anchors as A

from conftest import requires_reference

SSD300_SIZES = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
SSD512_SIZES = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]


def test_total_anchor_counts():
    cfg300 = SSDConfig.ssd300()
    assert cfg300.total_boxes(SSD300_SIZES) == 8732
    cfg512 = SSDConfig.ssd512()
    assert cfg512.total_boxes(SSD512_SIZES) == 24564


def test_wh_geomean_extra_box():
    wh = A.anchor_wh_for_layer(300, 300, [1.0, 2.0, 0.5], 0.1, 0.2)
    assert wh.shape == (4, 2)
    assert np.isclose(wh[0, 0], 30.0)  # scale * size
    assert np.isclose(wh[1, 0], np.sqrt(0.1 * 0.2) * 300)  # geomean box
    assert np.isclose(wh[2, 0], 30.0 * np.sqrt(2))  # ar=2 width
    assert np.isclose(wh[2, 1], 30.0 / np.sqrt(2))  # ar=2 height


def test_center_grid_from_steps_offsets():
    grid, diag = A.anchor_grid_for_layer(
        300, 300, (38, 38), [1.0, 2.0, 0.5], 0.1, 0.2,
        this_steps=8, this_offsets=0.5, normalize_coords=False,
        coords="centroids", diagnostics=True,
    )
    assert np.isclose(diag.centers_cx[0], 4.0)
    assert np.isclose(diag.centers_cx[-1], 0.5 * 8 + 37 * 8)
    assert grid.shape == (38, 38, 4, 4)
    # Every cell shares the same w/h per aspect ratio.
    assert np.allclose(grid[0, 0, :, 2:], grid[20, 20, :, 2:])


def test_clip_boxes():
    grid = A.anchor_grid_for_layer(
        100, 100, (2, 2), [1.0], 0.9, 1.0, two_boxes_for_ar1=False,
        clip_boxes=True, normalize_coords=False, coords="corners",
    )
    assert grid[..., [0, 1]].min() >= 0
    assert grid[..., 2].max() <= 99 and grid[..., 3].max() <= 99


@requires_reference
@pytest.mark.parametrize("which", ["ssd300", "ssd512"])
def test_anchor_tensor_parity_with_reference(which):
    from ssd_encoder_decoder.ssd_input_encoder import SSDInputEncoder as RefEncoder

    if which == "ssd300":
        cfg = SSDConfig.ssd300()
        sizes = SSD300_SIZES
    else:
        cfg = SSDConfig.ssd512()
        sizes = SSD512_SIZES
    ref = RefEncoder(
        img_height=cfg.img_height, img_width=cfg.img_width,
        n_classes=cfg.n_classes, predictor_sizes=sizes,
        scales=list(cfg.scales),
        aspect_ratios_per_layer=[list(a) for a in cfg.aspect_ratios],
        steps=list(cfg.steps), offsets=list(cfg.offsets),
        variances=list(cfg.variances), coords=cfg.coords,
        normalize_coords=cfg.normalize_coords,
    )
    template = ref.generate_encoding_template(batch_size=1)  # (1, N, C+12)
    ref_anchors = template[0, :, -8:]
    mine = cfg.anchor_tensor(sizes)
    np.testing.assert_allclose(mine, ref_anchors, rtol=1e-12, atol=1e-14)


@requires_reference
def test_per_layer_grid_parity_with_reference():
    from ssd_encoder_decoder.ssd_input_encoder import SSDInputEncoder as RefEncoder

    cfg = SSDConfig.ssd300()
    ref = RefEncoder(
        img_height=300, img_width=300, n_classes=20,
        predictor_sizes=SSD300_SIZES, scales=list(cfg.scales),
        aspect_ratios_per_layer=[list(a) for a in cfg.aspect_ratios],
        steps=list(cfg.steps), offsets=list(cfg.offsets),
    )
    for i, size in enumerate(SSD300_SIZES):
        mine = A.anchor_grid_for_layer(
            300, 300, size, cfg.aspect_ratios[i], cfg.scales[i],
            cfg.scales[i + 1], this_steps=cfg.steps[i],
            this_offsets=cfg.offsets[i], coords="centroids",
        )
        np.testing.assert_allclose(mine, ref.boxes_list[i], rtol=1e-12, atol=1e-14)
