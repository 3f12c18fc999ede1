"""Axis-aligned 2D bounding-box math (L0 kernel layer).

Pure functions over either NumPy or jax.numpy arrays (pass ``xp``). All
functions are shape-polymorphic in the leading axes and operate on the last
axis, which makes them directly ``vmap``-able and XLA-friendly: no in-place
mutation, no data-dependent shapes.

Coordinate formats
------------------
* ``'minmax'``:    (xmin, xmax, ymin, ymax)
* ``'corners'``:   (xmin, ymin, xmax, ymax)
* ``'centroids'``: (cx, cy, w, h)

``border_pixels`` semantics (``d`` offset added to every width/height
difference): ``'half'`` -> 0, ``'include'`` -> +1, ``'exclude'`` -> -1.

Behavioral parity with the reference implementation
``/root/reference/bounding_box_utils/bounding_box_utils.py`` (``convert_coordinates``
:24, ``intersection_area`` :119, ``iou`` :283), re-designed functionally for XLA.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "border_delta",
    "convert_coordinates",
    "convert_coordinates2",
    "corner_indices",
    "intersection_area",
    "iou",
]

_CONVERSIONS = {
    "minmax2centroids",
    "centroids2minmax",
    "corners2centroids",
    "centroids2corners",
    "minmax2corners",
    "corners2minmax",
}


def border_delta(border_pixels: str) -> int:
    """Map a border-pixel convention to its width/height delta."""
    try:
        return {"half": 0, "include": 1, "exclude": -1}[border_pixels]
    except KeyError:
        raise ValueError(
            "`border_pixels` must be one of 'half', 'include', 'exclude', "
            f"got {border_pixels!r}."
        )


def corner_indices(coords: str):
    """Return (xmin, ymin, xmax, ymax) index positions for a coordinate format."""
    if coords == "corners":
        return 0, 1, 2, 3
    if coords == "minmax":
        return 0, 2, 1, 3
    raise ValueError(f"Expected 'corners' or 'minmax', got {coords!r}.")


def convert_coordinates(tensor, start_index, conversion, border_pixels="half", xp=np):
    """Convert 4 consecutive box coordinates in the last axis between formats.

    Returns a new array with the converted coordinates written over positions
    ``start_index:start_index+4`` of the last axis; all other elements of the
    last axis are preserved. Supports negative ``start_index``.
    """
    if conversion not in _CONVERSIONS:
        raise ValueError(
            f"Unexpected conversion value {conversion!r}. Supported: {sorted(_CONVERSIONS)}."
        )
    d = border_delta(border_pixels)

    tensor = xp.asarray(tensor)
    ind = start_index if start_index >= 0 else tensor.shape[-1] + start_index
    a = tensor[..., ind + 0]
    b = tensor[..., ind + 1]
    c = tensor[..., ind + 2]
    e = tensor[..., ind + 3]

    if conversion == "minmax2centroids":  # (xmin,xmax,ymin,ymax) -> (cx,cy,w,h)
        out = ((a + b) / 2.0, (c + e) / 2.0, b - a + d, e - c + d)
    elif conversion == "centroids2minmax":  # (cx,cy,w,h) -> (xmin,xmax,ymin,ymax)
        out = (a - c / 2.0, a + c / 2.0, b - e / 2.0, b + e / 2.0)
    elif conversion == "corners2centroids":  # (xmin,ymin,xmax,ymax) -> (cx,cy,w,h)
        out = ((a + c) / 2.0, (b + e) / 2.0, c - a + d, e - b + d)
    elif conversion == "centroids2corners":  # (cx,cy,w,h) -> (xmin,ymin,xmax,ymax)
        out = (a - c / 2.0, b - e / 2.0, a + c / 2.0, b + e / 2.0)
    else:  # minmax<->corners: swap the middle two coordinates
        out = (a, c, b, e)

    converted = xp.stack(out, axis=-1)
    result = xp.concatenate(
        [
            tensor[..., :ind].astype(converted.dtype),
            converted,
            tensor[..., ind + 4 :].astype(converted.dtype),
        ],
        axis=-1,
    )
    return result


_M_MINMAX2CENTROIDS = np.array(
    [[0.5, 0.0, -1.0, 0.0],
     [0.5, 0.0, 1.0, 0.0],
     [0.0, 0.5, 0.0, -1.0],
     [0.0, 0.5, 0.0, 1.0]]
)
_M_CENTROIDS2MINMAX = np.array(
    [[1.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 1.0],
     [-0.5, 0.5, 0.0, 0.0],
     [0.0, 0.0, -0.5, 0.5]]
)


def convert_coordinates2(tensor, start_index, conversion, xp=np):
    """Matrix-multiplication variant of :func:`convert_coordinates`.

    Supports 'minmax2centroids' and 'centroids2minmax' only (the two
    conversions expressible as a single linear map); on TPU the 4x4 contraction
    rides the MXU. Capability parity: bounding_box_utils.py:89-117.
    """
    if conversion == "minmax2centroids":
        m = _M_MINMAX2CENTROIDS
    elif conversion == "centroids2minmax":
        m = _M_CENTROIDS2MINMAX
    else:
        raise ValueError(
            "Supported conversions: 'minmax2centroids', 'centroids2minmax'; "
            f"got {conversion!r}."
        )
    tensor = xp.asarray(tensor)
    ind = start_index if start_index >= 0 else tensor.shape[-1] + start_index
    converted = tensor[..., ind : ind + 4] @ xp.asarray(m, dtype=tensor.dtype)
    return xp.concatenate(
        [
            tensor[..., :ind].astype(converted.dtype),
            converted,
            tensor[..., ind + 4 :].astype(converted.dtype),
        ],
        axis=-1,
    )


def _split_corners(boxes, coords):
    xmin, ymin, xmax, ymax = corner_indices(coords)
    return boxes[..., xmin], boxes[..., ymin], boxes[..., xmax], boxes[..., ymax]


def intersection_area(
    boxes1, boxes2, coords="corners", mode="outer_product", border_pixels="half", xp=np
):
    """Intersection areas between two box sets.

    ``mode='outer_product'``: boxes1 ``(m,4)``, boxes2 ``(n,4)`` -> ``(m,n)``.
    ``mode='element-wise'``: broadcast-compatible shapes -> elementwise areas.
    ``coords`` may be 'corners', 'minmax', or 'centroids' (converted internally).
    """
    boxes1 = xp.asarray(boxes1)
    boxes2 = xp.asarray(boxes2)
    if boxes1.ndim == 1:
        boxes1 = boxes1[None, :]
    if boxes2.ndim == 1:
        boxes2 = boxes2[None, :]
    if coords == "centroids":
        boxes1 = convert_coordinates(boxes1, 0, "centroids2corners", xp=xp)
        boxes2 = convert_coordinates(boxes2, 0, "centroids2corners", xp=xp)
        coords = "corners"

    d = border_delta(border_pixels)
    x1a, y1a, x2a, y2a = _split_corners(boxes1, coords)
    x1b, y1b, x2b, y2b = _split_corners(boxes2, coords)

    if mode == "outer_product":
        x1a, y1a, x2a, y2a = (t[..., :, None] for t in (x1a, y1a, x2a, y2a))
        x1b, y1b, x2b, y2b = (t[..., None, :] for t in (x1b, y1b, x2b, y2b))
    elif mode != "element-wise":
        raise ValueError(f"`mode` must be 'outer_product' or 'element-wise', got {mode!r}.")

    iw = xp.maximum(0.0, xp.minimum(x2a, x2b) - xp.maximum(x1a, x1b) + d)
    ih = xp.maximum(0.0, xp.minimum(y2a, y2b) - xp.maximum(y1a, y1b) + d)
    return iw * ih


def iou(boxes1, boxes2, coords="centroids", mode="outer_product", border_pixels="half", xp=np):
    """Jaccard (IoU) similarity between two box sets. See ``intersection_area``."""
    boxes1 = xp.asarray(boxes1)
    boxes2 = xp.asarray(boxes2)
    if boxes1.ndim == 1:
        boxes1 = boxes1[None, :]
    if boxes2.ndim == 1:
        boxes2 = boxes2[None, :]
    if coords == "centroids":
        boxes1 = convert_coordinates(boxes1, 0, "centroids2corners", xp=xp)
        boxes2 = convert_coordinates(boxes2, 0, "centroids2corners", xp=xp)
        coords = "corners"
    elif coords not in ("minmax", "corners"):
        raise ValueError(
            f"Unexpected value for `coords`: {coords!r}. "
            "Supported: 'minmax', 'corners', 'centroids'."
        )

    # Reference quirk preserved: iou() computes the *intersection* with the
    # default 'half' convention regardless of border_pixels (the internal
    # intersection_area_ call at bounding_box_utils.py:345 omits the
    # border_pixels argument), while the union areas below do use it.
    inter = intersection_area(
        boxes1, boxes2, coords=coords, mode=mode, border_pixels="half", xp=xp
    )
    d = border_delta(border_pixels)
    x1a, y1a, x2a, y2a = _split_corners(boxes1, coords)
    x1b, y1b, x2b, y2b = _split_corners(boxes2, coords)
    area1 = (x2a - x1a + d) * (y2a - y1a + d)
    area2 = (x2b - x1b + d) * (y2b - y1b + d)
    if mode == "outer_product":
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    union = area1 + area2 - inter
    return inter / union
