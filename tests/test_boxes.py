"""L0 box math: conversions, intersection, IoU — vs hand values and the
reference NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu.ops import boxes as B

from conftest import requires_reference


def test_corners_centroids_roundtrip():
    boxes = np.array([[10.0, 20.0, 50.0, 80.0], [0.0, 0.0, 4.0, 4.0]])
    cent = B.convert_coordinates(boxes, 0, "corners2centroids")
    assert np.allclose(cent[0], [30, 50, 40, 60])
    back = B.convert_coordinates(cent, 0, "centroids2corners")
    assert np.allclose(back, boxes)


def test_minmax_corners_swap():
    boxes = np.array([[1.0, 5.0, 2.0, 6.0]])  # minmax: xmin,xmax,ymin,ymax
    corners = B.convert_coordinates(boxes, 0, "minmax2corners")
    assert np.allclose(corners, [[1, 2, 5, 6]])
    back = B.convert_coordinates(corners, 0, "corners2minmax")
    assert np.allclose(back, boxes)


def test_border_pixels_delta():
    boxes = np.array([[10.0, 20.0, 50.0, 80.0]])
    for border, d in (("half", 0), ("include", 1), ("exclude", -1)):
        cent = B.convert_coordinates(boxes, 0, "corners2centroids", border)
        assert cent[0, 2] == 40 + d and cent[0, 3] == 60 + d


def test_convert_preserves_other_columns():
    rows = np.array([[7.0, 10.0, 20.0, 50.0, 80.0, 3.0]])
    out = B.convert_coordinates(rows, 1, "corners2centroids")
    assert out[0, 0] == 7.0 and out[0, 5] == 3.0


def test_iou_identical_and_disjoint():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    assert np.allclose(B.iou(a, a, coords="corners"), 1.0)
    b = np.array([[20.0, 20.0, 30.0, 30.0]])
    assert np.allclose(B.iou(a, b, coords="corners"), 0.0)


def test_iou_hand_value():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[5.0, 5.0, 15.0, 15.0]])  # inter 25, union 175
    assert np.allclose(B.iou(a, b, coords="corners"), 25 / 175)


def test_iou_outer_product_shape():
    a = np.random.rand(3, 4)
    a[:, 2:] += 1.0
    b = np.random.rand(5, 4)
    b[:, 2:] += 1.0
    assert B.iou(a, b, coords="corners").shape == (3, 5)


def test_jnp_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.rand(6, 4) * 100
    a[:, 2:] = a[:, :2] + rng.rand(6, 2) * 50 + 1
    b = rng.rand(9, 4) * 100
    b[:, 2:] = b[:, :2] + rng.rand(9, 2) * 50 + 1
    got_np = B.iou(a, b, coords="corners")
    got_jnp = np.array(B.iou(jnp.asarray(a), jnp.asarray(b), coords="corners", xp=jnp))
    np.testing.assert_allclose(got_np, got_jnp, rtol=1e-5)


@requires_reference
@pytest.mark.parametrize("coords", ["corners", "minmax", "centroids"])
@pytest.mark.parametrize("border", ["half", "include", "exclude"])
@pytest.mark.parametrize("mode", ["outer_product", "element-wise"])
def test_iou_parity_with_reference(coords, border, mode):
    from bounding_box_utils.bounding_box_utils import iou as ref_iou

    rng = np.random.RandomState(7)
    n = 8
    a = rng.rand(n, 4) * 100
    b = rng.rand(n, 4) * 100
    if coords in ("corners", "minmax"):
        a[:, 2:] = a[:, :2] + rng.rand(n, 2) * 50 + 1
        b[:, 2:] = b[:, :2] + rng.rand(n, 2) * 50 + 1
        if coords == "minmax":
            a = a[:, [0, 2, 1, 3]]
            b = b[:, [0, 2, 1, 3]]
    else:
        a[:, 2:] += 5
        b[:, 2:] += 5
    expected = ref_iou(a, b, coords=coords, mode=mode, border_pixels=border)
    got = B.iou(a, b, coords=coords, mode=mode, border_pixels=border)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


@requires_reference
@pytest.mark.parametrize(
    "conversion",
    ["minmax2centroids", "centroids2minmax", "corners2centroids",
     "centroids2corners", "minmax2corners", "corners2minmax"],
)
@pytest.mark.parametrize("border", ["half", "include", "exclude"])
def test_convert_parity_with_reference(conversion, border):
    from bounding_box_utils.bounding_box_utils import (
        convert_coordinates as ref_convert,
    )

    rng = np.random.RandomState(3)
    t = rng.rand(5, 7) * 100
    expected = ref_convert(t, start_index=2, conversion=conversion, border_pixels=border)
    got = B.convert_coordinates(t, 2, conversion, border)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


@requires_reference
@pytest.mark.parametrize("conversion", ["minmax2centroids", "centroids2minmax"])
def test_convert_coordinates2_parity(conversion):
    from bounding_box_utils.bounding_box_utils import (
        convert_coordinates2 as ref_convert2,
    )

    rng = np.random.RandomState(5)
    t = rng.rand(6, 9) * 100
    expected = ref_convert2(t, start_index=3, conversion=conversion)
    got = B.convert_coordinates2(t, 3, conversion)
    np.testing.assert_allclose(got, expected, rtol=1e-12)
