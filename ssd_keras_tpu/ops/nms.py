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

    Implementation note: greedy NMS is sequentially dependent, so this is a
    K-step ``lax.scan``; each step computes the current box's IoU row against
    all K boxes *on the fly* (one (K,)-vector of VPU work). Precomputing the
    (K, K) IoU matrix outside the loop looks cheaper but XLA re-fuses the
    matrix computation into every loop iteration, turning O(K^2) into O(K^3)
    HBM traffic — measured ~19s per SSD300 batch on a v5e versus ~2ms for
    this formulation.
    """
    k = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    later = jnp.arange(k)

    def step(suppressed, i):
        keep_i = valid[i] & ~suppressed[i]
        iw = jnp.maximum(0.0, jnp.minimum(x2[i], x2) - jnp.maximum(x1[i], x1))
        ih = jnp.maximum(0.0, jnp.minimum(y2[i], y2) - jnp.maximum(y1[i], y1))
        inter = iw * ih
        union = area[i] + area - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppressed = suppressed | (keep_i & (iou > iou_threshold) & (later > i))
        return suppressed, keep_i

    suppressed0 = jnp.zeros((k,), dtype=bool)
    _, kept = jax.lax.scan(step, suppressed0, jnp.arange(k))
    return kept


def select_top_candidates(scores: jnp.ndarray, boxes: jnp.ndarray, k: int):
    """Top-k candidates by score. Returns (scores, boxes, original indices)."""
    top_scores, idx = jax.lax.top_k(scores, k)
    return top_scores, boxes[idx], idx
