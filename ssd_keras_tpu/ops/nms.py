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

__all__ = [
    "pairwise_iou_corners",
    "greedy_nms_mask",
    "greedy_nms_mask_fixpoint",
    "greedy_nms_mask_blocked",
    "select_top_candidates",
]


def pairwise_iou_corners(boxes: jnp.ndarray, border_delta: float = 0.0) -> jnp.ndarray:
    """All-pairs IoU for (K, 4) boxes in corners format (xmin, ymin, xmax, ymax).

    ``border_delta`` implements the reference's ``border_pixels`` conventions
    (ops/boxes.py:border_delta — 'half'=0, 'include'=+1, 'exclude'=-1).
    """
    d = border_delta
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    iw = jnp.maximum(
        0.0, jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :]) + d
    )
    ih = jnp.maximum(
        0.0, jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :]) + d
    )
    inter = iw * ih
    area = (x2 - x1 + d) * (y2 - y1 + d)
    union = area[:, None] + area[None, :] - inter
    # Guard zero-area pairs (padded/invalid candidates).
    return jnp.where(union > 0, inter / union, 0.0)


def greedy_nms_mask(
    boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float,
    border_delta: float = 0.0,
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
    d = border_delta
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + d) * (y2 - y1 + d)
    later = jnp.arange(k)

    def step(suppressed, i):
        keep_i = valid[i] & ~suppressed[i]
        iw = jnp.maximum(0.0, jnp.minimum(x2[i], x2) - jnp.maximum(x1[i], x1) + d)
        ih = jnp.maximum(0.0, jnp.minimum(y2[i], y2) - jnp.maximum(y1[i], y1) + d)
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


def greedy_nms_mask_fixpoint(
    boxes: jnp.ndarray,  # (L, K, 4) corners, score-descending per lane
    valid: jnp.ndarray,  # (L, K) bool
    iou_threshold: float,
    border_delta: float = 0.0,
) -> jnp.ndarray:
    """Exact greedy NMS as a fixpoint iteration — the TPU-native formulation.

    Greedy NMS selects the lexicographically-first maximal independent set of
    the "IoU > threshold" graph over score-sorted candidates. That set is the
    unique fixpoint of

        keep[i] = valid[i] and not any_{j < i}( keep[j] and iou(j, i) > thr )

    (induction over i), and Jacobi-iterating the equation from ``keep =
    valid`` converges to it in at most the longest suppression-chain depth —
    typically 4-8 iterations in detection workloads, not K. Each iteration is
    one batched matvec against the precomputed suppression adjacency, which
    XLA lowers onto the MXU; the O(K) sequential scan collapses to a handful
    of sequential matrix ops. Returns the (L, K) keep mask, bit-identical to
    :func:`greedy_nms_mask`.
    """
    l, k = boxes.shape[0], boxes.shape[1]
    d = border_delta
    x1, y1, x2, y2 = (boxes[..., c] for c in range(4))
    area = (x2 - x1 + d) * (y2 - y1 + d)
    iw = jnp.maximum(
        0.0,
        jnp.minimum(x2[:, :, None], x2[:, None, :])
        - jnp.maximum(x1[:, :, None], x1[:, None, :]) + d,
    )
    ih = jnp.maximum(
        0.0,
        jnp.minimum(y2[:, :, None], y2[:, None, :])
        - jnp.maximum(y1[:, :, None], y1[:, None, :]) + d,
    )
    inter = iw * ih
    union = area[:, :, None] + area[:, None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    tri = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # suppressor j < target i
    # Boolean adjacency + masked-any iteration: the per-lane "matvec" is a
    # broadcast-AND fused into the reduction on the VPU (measured ~2x faster
    # than batched bf16 matvecs on the MXU, whose (1,K)x(K,K) shapes underfill
    # the systolic array; bool storage is also the minimum HBM footprint).
    adj = (iou > iou_threshold) & tri[None]  # (L, K, K) bool

    def cond(state):
        t, prev, it = state
        return jnp.any(t != prev) & (it < k)

    def body(state):
        t, _, it = state
        suppressed = jnp.any(t[:, :, None] & adj, axis=1)
        return valid & ~suppressed, t, it + 1

    t, _, _ = jax.lax.while_loop(cond, body, (valid, ~valid, 0))
    return t


def greedy_nms_mask_blocked(
    boxes: jnp.ndarray,  # (L, K, 4) corners, score-descending per lane
    valid: jnp.ndarray,  # (L, K) bool
    iou_threshold: float,
    block_size: int = 64,
    border_delta: float = 0.0,
) -> jnp.ndarray:
    """Exact greedy NMS over lanes, block-decomposed for TPU throughput.

    Same selection as :func:`greedy_nms_mask`, but the O(K) sequential chain
    only does O(block) work per step: candidates are processed in blocks of
    ``block_size``; within a block a scan resolves the (small) sequential
    dependency, then ONE batched matrix op applies the block's survivors to
    every later candidate. Work drops from O(K^2 L) scalar-chained steps to
    O(K * block * L) scan work + O(K^2 L / block) well-vectorized matrix work
    — ~4x faster than the flat scan at SSD300 scale (L=160, K=400).
    Returns the (L, K) keep mask.
    """
    l, k = boxes.shape[0], boxes.shape[1]
    nb = -(-k // block_size)
    k_pad = nb * block_size
    if k_pad != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad - k), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, k_pad - k)))

    d = border_delta
    x1, y1, x2, y2 = (boxes[..., c] for c in range(4))  # (L, K)
    area = (x2 - x1 + d) * (y2 - y1 + d)

    def pair_iou(sel):  # sel: (L, B) indices -> IoU (L, B, K)
        bx1 = jnp.take_along_axis(x1, sel, axis=1)[..., None]  # (L, B, 1)
        by1 = jnp.take_along_axis(y1, sel, axis=1)[..., None]
        bx2 = jnp.take_along_axis(x2, sel, axis=1)[..., None]
        by2 = jnp.take_along_axis(y2, sel, axis=1)[..., None]
        barea = jnp.take_along_axis(area, sel, axis=1)[..., None]
        iw = jnp.maximum(0.0, jnp.minimum(bx2, x2[:, None, :]) - jnp.maximum(bx1, x1[:, None, :]) + d)
        ih = jnp.maximum(0.0, jnp.minimum(by2, y2[:, None, :]) - jnp.maximum(by1, y1[:, None, :]) + d)
        inter = iw * ih
        union = barea + area[:, None, :] - inter
        return jnp.where(union > 0, inter / union, 0.0)

    suppressed = jnp.zeros((l, k_pad), dtype=bool)
    keep = jnp.zeros((l, k_pad), dtype=bool)
    col_ids = jnp.arange(k_pad)

    for b in range(nb):
        lo = b * block_size
        sel = jnp.broadcast_to(col_ids[lo : lo + block_size][None, :], (l, block_size))
        # IoU of this block's candidates against every candidate: (L, B, K).
        ious = pair_iou(sel)
        ious_within = ious[:, :, lo : lo + block_size]  # (L, B, B)

        # Resolve the within-block sequential dependency with a B-step scan.
        sup0 = suppressed[:, lo : lo + block_size]  # from earlier blocks
        val0 = valid[:, lo : lo + block_size]

        def step(sup_blk, i):
            keep_i = val0[:, i] & ~sup_blk[:, i]  # (L,)
            new_sup = keep_i[:, None] & (ious_within[:, i, :] > iou_threshold) & (
                jnp.arange(block_size) > i
            )
            return sup_blk | new_sup, keep_i

        sup_blk, keep_cols = jax.lax.scan(step, sup0, jnp.arange(block_size))
        keep_blk = jnp.swapaxes(keep_cols, 0, 1)  # (L, B)
        keep = keep.at[:, lo : lo + block_size].set(keep_blk)

        # One matrix op: the block's survivors suppress all later candidates.
        later = col_ids[None, :] >= lo + block_size  # (1, K)
        sup_later = jnp.any(
            keep_blk[:, :, None] & (ious > iou_threshold), axis=1
        ) & later
        suppressed = suppressed | sup_later

    return keep[:, :k]
