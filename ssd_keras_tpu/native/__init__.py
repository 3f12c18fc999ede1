"""ctypes bindings for the native host-side kernels (ssd_host_ops.cpp).

The shared library is compiled on first use (g++, cached next to the source;
falls back to a temp dir if the package is read-only). Every entry point has
a pure-Python/NumPy fallback, so the framework works without a toolchain —
``available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

__all__ = [
    "available", "greedy_nms_indices", "match_predictions_class", "iou_matrix",
    "jpeg_available", "decode_jpeg_batch",
]

_SRC = os.path.join(os.path.dirname(__file__), "ssd_host_ops.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile(out_path: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out_path, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SSD_KERAS_TPU_NO_NATIVE"):
        return None
    candidates = [
        os.path.join(os.path.dirname(_SRC), "ssd_host_ops.so"),
        os.path.join(tempfile.gettempdir(), "ssd_host_ops.so"),
    ]
    for path in candidates:
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            if not _compile(path):
                continue
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        lib.ssd_greedy_nms.restype = ctypes.c_int
        lib.ssd_greedy_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssd_match_predictions.restype = None
        lib.ssd_match_predictions.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_int,
            ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ssd_iou_matrix.restype = None
        lib.ssd_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return lib
    return None


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def greedy_nms_indices(
    scores: np.ndarray, boxes: np.ndarray, iou_threshold: float,
    border_delta: int = 0,
) -> Optional[np.ndarray]:
    """Selection-order survivor indices, or None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    n = scores.shape[0]
    keep = np.empty(n, dtype=np.int32)
    n_kept = lib.ssd_greedy_nms(
        _fptr(scores), _fptr(boxes), n, ctypes.c_float(iou_threshold),
        border_delta, keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:n_kept]


def match_predictions_class(
    pred_img: np.ndarray,  # (n_preds,) int32 dense image indices, conf-desc order
    pred_boxes: np.ndarray,  # (n_preds, 4) float32
    gt_offsets: np.ndarray,  # (n_images + 1,) int32
    gt_boxes: np.ndarray,  # (total_gt, 4) float32
    gt_neutral: Optional[np.ndarray],  # (total_gt,) uint8 or None
    iou_threshold: float,
    border_delta: int,
):
    """(tp, fp) uint8 arrays, or None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pred_img = np.ascontiguousarray(pred_img, dtype=np.int32)
    pred_boxes = np.ascontiguousarray(pred_boxes, dtype=np.float32)
    gt_offsets = np.ascontiguousarray(gt_offsets, dtype=np.int32)
    gt_boxes = np.ascontiguousarray(gt_boxes, dtype=np.float32)
    n_preds = pred_img.shape[0]
    n_images = gt_offsets.shape[0] - 1
    tp = np.zeros(n_preds, dtype=np.uint8)
    fp = np.zeros(n_preds, dtype=np.uint8)
    neutral_ptr = None
    if gt_neutral is not None:
        gt_neutral = np.ascontiguousarray(gt_neutral, dtype=np.uint8)
        neutral_ptr = gt_neutral.ctypes.data_as(ctypes.c_void_p)
    lib.ssd_match_predictions(
        pred_img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(pred_boxes), n_preds,
        gt_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(gt_boxes), neutral_ptr, n_images,
        ctypes.c_float(iou_threshold), border_delta,
        tp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        fp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return tp, fp


# --------------------------------------------------------------------------- #
# Threaded JPEG batch decode (ssd_jpeg.cpp; its own .so so the core kernels
# never depend on libjpeg being present)
# --------------------------------------------------------------------------- #

_JPEG_SRC = os.path.join(os.path.dirname(__file__), "ssd_jpeg.cpp")
_JPEG_LIB: Optional[ctypes.CDLL] = None
_JPEG_TRIED = False


def _load_jpeg() -> Optional[ctypes.CDLL]:
    global _JPEG_LIB, _JPEG_TRIED
    if _JPEG_LIB is not None or _JPEG_TRIED:
        return _JPEG_LIB
    _JPEG_TRIED = True
    if os.environ.get("SSD_KERAS_TPU_NO_NATIVE"):
        return None
    candidates = [
        os.path.join(os.path.dirname(_JPEG_SRC), "ssd_jpeg.so"),
        os.path.join(tempfile.gettempdir(), "ssd_jpeg.so"),
    ]
    for path in candidates:
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_JPEG_SRC):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", path, _JPEG_SRC,
                   "-ljpeg", "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError):
                continue
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        lib.ssd_jpeg_dims.restype = ctypes.c_int
        lib.ssd_jpeg_dims.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssd_decode_jpeg_batch.restype = ctypes.c_int
        lib.ssd_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _JPEG_LIB = lib
        return lib
    return None


def jpeg_available() -> bool:
    return _load_jpeg() is not None


def decode_jpeg_batch(buffers, n_threads: int = 0):
    """Decode a list of JPEG byte strings to uint8 arrays in parallel.

    Color JPEGs yield (H, W, 3) RGB; grayscale JPEGs yield (H, W) — the same
    shapes ``np.array(PIL.Image.open(...))`` produces, so callers see
    identical batches whether this native path or the PIL fallback ran.
    Exotic component counts (4-component CMYK/YCCK, which plain libjpeg
    cannot convert to RGB) are decoded per-image through PIL, preserving
    PIL's shape for them ((H, W, 4) for CMYK). Returns None if the native
    library is unavailable. Individual corrupt images raise ValueError.
    ``n_threads`` 0 = one thread per available CPU (capped at the batch
    size).
    """
    lib = _load_jpeg()
    if lib is None:
        return None
    n = len(buffers)
    if n == 0:
        return []
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 4)

    bufs = [np.frombuffer(b, dtype=np.uint8) for b in buffers]
    dims = []
    pil_idx = []  # component counts libjpeg can't deliver as RGB
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    for i, b in enumerate(bufs):
        rc = lib.ssd_jpeg_dims(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), b.size,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
        )
        if rc != 0:
            raise ValueError(f"Invalid JPEG header in image {i}.")
        if c.value not in (1, 3):
            pil_idx.append(i)
            dims.append(None)
            continue
        # Grayscale stays (H, W) like PIL; 3-component decodes to RGB.
        dims.append((h.value, w.value, 1 if c.value == 1 else 3))

    pil_outs = {}
    if pil_idx:
        import io

        from PIL import Image

        for i in pil_idx:
            pil_outs[i] = np.array(Image.open(io.BytesIO(buffers[i])))
        n_native = n - len(pil_idx)
        if n_native == 0:
            return [pil_outs[i] for i in range(n)]
        keep = [i for i in range(n) if dims[i] is not None]
        bufs = [bufs[i] for i in keep]
        dims = [dims[i] for i in keep]
        order = keep
        n = n_native
        n_threads = min(n_threads, n)
    else:
        order = list(range(len(bufs)))

    outs = [
        np.empty((hh, ww) if ch == 1 else (hh, ww, ch), np.uint8)
        for hh, ww, ch in dims
    ]
    data_ptrs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs]
    )
    out_ptrs = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs]
    )
    lens = (ctypes.c_int * n)(*[b.size for b in bufs])
    heights = (ctypes.c_int * n)(*[d[0] for d in dims])
    widths = (ctypes.c_int * n)(*[d[1] for d in dims])
    channels = (ctypes.c_int * n)(*[d[2] for d in dims])
    status = (ctypes.c_int * n)()
    failures = lib.ssd_decode_jpeg_batch(
        ctypes.cast(data_ptrs, ctypes.POINTER(ctypes.c_void_p)), lens, n,
        ctypes.cast(out_ptrs, ctypes.POINTER(ctypes.c_void_p)),
        heights, widths, channels, n_threads, status,
    )
    if failures:
        bad = [order[i] for i in range(n) if status[i] != 0]
        raise ValueError(f"JPEG decode failed for images {bad}.")
    if pil_outs:
        merged = dict(zip(order, outs))
        merged.update(pil_outs)
        return [merged[i] for i in sorted(merged)]
    return outs


def iou_matrix(
    boxes1: np.ndarray, boxes2: np.ndarray, border_delta: int = 0
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    boxes1 = np.ascontiguousarray(boxes1, dtype=np.float32)
    boxes2 = np.ascontiguousarray(boxes2, dtype=np.float32)
    m, n = boxes1.shape[0], boxes2.shape[0]
    out = np.empty((m, n), dtype=np.float32)
    lib.ssd_iou_matrix(_fptr(boxes1), m, _fptr(boxes2), n, border_delta, _fptr(out))
    return out
