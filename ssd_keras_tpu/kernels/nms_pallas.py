"""Pallas TPU kernel: batched exact greedy NMS over score-sorted candidates.

The flagship custom kernel (BASELINE north star: "DecodeDetections' per-class
confidence filtering + NMS becomes a Pallas top-k/NMS kernel"). The in-graph
decoder feeds it L = batch * (n_classes - 1) independent lanes of K
score-descending candidates; the kernel runs the K-step greedy suppression
with the whole working set resident in VMEM:

* layout ``(K, L)`` per coordinate — step ``i`` reads one *sublane* row and
  suppresses against all K rows with (K, L) VPU ops; L rides the 128-lane
  dimension so all lanes progress in lockstep,
* zero HBM traffic inside the loop (everything fits VMEM: 6 arrays x
  K=512 x L<=1024 f32 = ~12 MB at SSD300 scale),
* the suppression mask update is branch-free select arithmetic.

Equivalent semantics to ops/nms.py:greedy_nms_mask (tf.image.non_max_
suppression selection rule); the XLA scan version remains the fallback for
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["greedy_nms_mask_batched"]

_LANE = 128
_SUBLANE = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, sup_ref,
                *, k_real: int, iou_threshold: float, border_delta: float):
    """All refs are (K_pad, L_pad) f32 in VMEM; sup_ref is scratch.
    ``border_delta`` is the reference's border_pixels convention as a width
    offset ('half'=0, 'include'=+1, 'exclude'=-1; ops/boxes.py:border_delta).
    """
    k_pad = x1_ref.shape[0]
    d = border_delta
    sup_ref[:] = jnp.zeros_like(sup_ref)
    keep_ref[:] = jnp.zeros_like(keep_ref)  # padded rows stay unselected

    area = (x2_ref[:] - x1_ref[:] + d) * (y2_ref[:] - y1_ref[:] + d)  # (K, L)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, x1_ref.shape[1]), 0)

    def body(i, _):
        # Current candidate (row i) broadcast against all rows, per lane.
        x1_i = x1_ref[i, :][None, :]
        y1_i = y1_ref[i, :][None, :]
        x2_i = x2_ref[i, :][None, :]
        y2_i = y2_ref[i, :][None, :]
        keep_i = valid_ref[i, :] * (1.0 - sup_ref[i, :])  # (L,)
        keep_ref[i, :] = keep_i

        iw = jnp.maximum(0.0, jnp.minimum(x2_i, x2_ref[:]) - jnp.maximum(x1_i, x1_ref[:]) + d)
        ih = jnp.maximum(0.0, jnp.minimum(y2_i, y2_ref[:]) - jnp.maximum(y1_i, y1_ref[:]) + d)
        inter = iw * ih
        area_i = (x2_i - x1_i + d) * (y2_i - y1_i + d)
        union = area_i + area - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)

        suppress = (
            keep_i[None, :]
            * jnp.where(iou > iou_threshold, 1.0, 0.0)
            * jnp.where(row_ids > i, 1.0, 0.0)
        )
        sup_ref[:] = jnp.maximum(sup_ref[:], suppress)
        return 0

    jax.lax.fori_loop(0, k_real, body, 0)


# Lanes processed per kernel instance. Independent lanes make the grid
# embarrassingly parallel; the block bounds VMEM residency to
# 7 arrays x K_pad x _LANE_BLOCK x 4B (~5.7 MB at K=512) so arbitrarily
# many (batch x class) lanes — e.g. COCO's 80 classes at batch 32 — never
# overflow VMEM.
_LANE_BLOCK = 512


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "border_delta", "interpret")
)
def greedy_nms_mask_batched(
    boxes: jnp.ndarray,  # (L, K, 4) corners, score-descending per lane
    valid: jnp.ndarray,  # (L, K) bool
    iou_threshold: float = 0.45,
    border_delta: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, K) bool keep mask; Pallas kernel, lanes tiled in blocks of 512."""
    l, k = boxes.shape[0], boxes.shape[1]
    k_pad = _ceil_to(max(k, _SUBLANE), _SUBLANE)
    block = min(_LANE_BLOCK, _ceil_to(max(l, _LANE), _LANE))
    l_pad = _ceil_to(max(l, block), block)

    def prep(c):
        x = boxes[:, :, c].T.astype(jnp.float32)  # (K, L)
        return jnp.pad(x, ((0, k_pad - k), (0, l_pad - l)))

    x1, y1, x2, y2 = prep(0), prep(1), prep(2), prep(3)
    v = jnp.pad(valid.T.astype(jnp.float32), ((0, k_pad - k), (0, l_pad - l)))

    kernel = functools.partial(
        _nms_kernel, k_real=k, iou_threshold=float(iou_threshold),
        border_delta=float(border_delta),
    )
    spec = pl.BlockSpec((k_pad, block), lambda i: (0, i))
    keep = pl.pallas_call(
        kernel,
        grid=(l_pad // block,),
        out_shape=jax.ShapeDtypeStruct((k_pad, l_pad), jnp.float32),
        in_specs=[spec] * 5,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((k_pad, block), jnp.float32)],
        interpret=interpret,
    )(x1, y1, x2, y2, v)
    return keep[:k, :l].T > 0.5
