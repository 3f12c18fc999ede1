"""Fixed-shape greedy non-maximum suppression for XLA/TPU.

TPU requires static shapes, so instead of the reference's dynamic
``tf.image.non_max_suppression`` + pad (keras_layer_DecodeDetections.py:195-214)
this module works on a fixed number of score-sorted candidates and returns a
keep *mask*. Exact greedy NMS is sequentially dependent, so the core is a
``lax.fori_loop`` over candidates with all pairwise IoUs precomputed as one
(K, K) matrix (VPU-friendly); everything is trivially ``vmap``-able over
classes and batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pairwise_iou_corners", "greedy_nms_mask", "select_top_candidates"]


def pairwise_iou_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU for (K, 4) boxes in corners format (xmin, ymin, xmax, ymax)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    iw = jnp.maximum(
        0.0, jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :])
    )
    ih = jnp.maximum(
        0.0, jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :])
    )
    inter = iw * ih
    area = (x2 - x1) * (y2 - y1)
    union = area[:, None] + area[None, :] - inter
    # Guard zero-area pairs (padded/invalid candidates).
    return jnp.where(union > 0, inter / union, 0.0)


def greedy_nms_mask(
    boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Exact greedy NMS over score-descending candidates.

    Args:
      boxes: (K, 4) corners, already sorted by score descending.
      valid: (K,) bool — candidates eligible for selection.
      iou_threshold: boxes with IoU *strictly greater* than this with an
        already-kept box are suppressed (matches tf.image.non_max_suppression).

    Returns:
      (K,) bool keep mask.
    """
    k = boxes.shape[0]
    ious = pairwise_iou_corners(boxes)
    later = jnp.arange(k)  # indices; used to only suppress forward

    def body(i, state):
        kept, suppressed = state
        keep_i = valid[i] & ~suppressed[i]
        kept = kept.at[i].set(keep_i)
        suppressed = suppressed | (keep_i & (ious[i] > iou_threshold) & (later > i))
        return kept, suppressed

    kept0 = jnp.zeros((k,), dtype=bool)
    kept, _ = jax.lax.fori_loop(0, k, body, (kept0, kept0))
    return kept


def select_top_candidates(scores: jnp.ndarray, boxes: jnp.ndarray, k: int):
    """Top-k candidates by score. Returns (scores, boxes, original indices)."""
    top_scores, idx = jax.lax.top_k(scores, k)
    return top_scores, boxes[idx], idx
