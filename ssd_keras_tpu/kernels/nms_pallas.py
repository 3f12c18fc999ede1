"""Pallas TPU kernel: batched exact greedy NMS over score-sorted candidates.

The flagship custom kernel (BASELINE north star: "DecodeDetections' per-class
confidence filtering + NMS becomes a Pallas top-k/NMS kernel"). The in-graph
decoder feeds it L = batch * (n_classes - 1) independent lanes of K
score-descending candidates; the kernel runs the greedy suppression with the
whole working set resident in VMEM:

* layout ``(K, L)`` per coordinate — step ``i`` reads one *sublane* row and
  suppresses against later rows with (tail, L) VPU ops; L rides the 128-lane
  dimension so all lanes progress in lockstep,
* **triangular row-blocking**: the suppression update for step ``i`` only
  touches rows of the current 8-row sublane block onward (a candidate can
  only be suppressed by a higher-scoring one), so the total VPU work is
  K²·L/2 instead of the naive K²·L,
* **dynamic trip count** via scalar prefetch: each grid instance loops only
  up to the last valid candidate across its lane block (+1). Real trained
  models pass far fewer than ``nms_max_output_size`` candidates per class
  through the 0.01 confidence threshold, so serving-shaped inputs run a
  small fraction of the worst-case steps. Exact regardless of whether
  ``valid`` is a prefix mask: rows past the bound are invalid in every lane,
  contribute no suppression, and stay unselected,
* zero HBM traffic inside the loop (everything fits VMEM: 8 arrays x
  K_pad x 256-lane blocks f32 — ~3.3 MB at the SSD300 decode shape,
  comfortably inside the 16 MB scoped-VMEM limit at any K <= 512).

Equivalent semantics to ops/nms.py:greedy_nms_mask (tf.image.non_max_
suppression selection rule); the XLA fixpoint version remains the fallback
for non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

__all__ = ["greedy_nms_mask_batched"]

_LANE = 128
_SUBLANE = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _nms_kernel(bound_ref, x1_ref, y1_ref, x2_ref, y2_ref, valid_ref,
                keep_ref, sup_ref, area_ref,
                *, iou_threshold: float, border_delta: float):
    """``bound_ref`` is the scalar-prefetched per-lane-block trip count; all
    other refs are (K_pad, L_block) f32 in VMEM; sup/area are scratch.
    ``border_delta`` is the reference's border_pixels convention as a width
    offset ('half'=0, 'include'=+1, 'exclude'=-1; ops/boxes.py:border_delta).
    """
    k_pad, l_blk = x1_ref.shape
    d = border_delta
    sup_ref[:] = jnp.zeros_like(sup_ref)
    keep_ref[:] = jnp.zeros_like(keep_ref)  # padded rows stay unselected
    area_ref[:] = (x2_ref[:] - x1_ref[:] + d) * (y2_ref[:] - y1_ref[:] + d)

    k_dyn = bound_ref[pl.program_id(0)]

    for start in range(0, k_pad, _SUBLANE):
        tail = k_pad - start

        @pl.when(start < k_dyn)
        def _process_block(start=start, tail=tail):
            row_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (tail, l_blk), 0) + start
            )
            x1_t = x1_ref[start:, :]
            y1_t = y1_ref[start:, :]
            x2_t = x2_ref[start:, :]
            y2_t = y2_ref[start:, :]
            area_t = area_ref[start:, :]

            def body(i, _):
                r = start + i
                # Current candidate (row r) broadcast against the tail rows.
                x1_i = x1_ref[r, :][None, :]
                y1_i = y1_ref[r, :][None, :]
                x2_i = x2_ref[r, :][None, :]
                y2_i = y2_ref[r, :][None, :]
                keep_i = valid_ref[r, :] * (1.0 - sup_ref[r, :])  # (L,)
                keep_ref[r, :] = keep_i

                iw = jnp.maximum(
                    0.0, jnp.minimum(x2_i, x2_t) - jnp.maximum(x1_i, x1_t) + d
                )
                ih = jnp.maximum(
                    0.0, jnp.minimum(y2_i, y2_t) - jnp.maximum(y1_i, y1_t) + d
                )
                inter = iw * ih
                union = area_ref[r, :][None, :] + area_t - inter
                iou = jnp.where(union > 0.0, inter / union, 0.0)

                suppress = (
                    keep_i[None, :]
                    * jnp.where(iou > iou_threshold, 1.0, 0.0)
                    * jnp.where(row_ids > r, 1.0, 0.0)
                )
                sup_ref[start:, :] = jnp.maximum(sup_ref[start:, :], suppress)
                return 0

            jax.lax.fori_loop(0, _SUBLANE, body, 0)


# Lanes processed per kernel instance. Independent lanes make the grid
# embarrassingly parallel; the block bounds VMEM residency (8 arrays x
# K_pad x _LANE_BLOCK x 4B, double-buffered windows) so arbitrarily many
# (batch x class) lanes — e.g. COCO's 80 classes at batch 32 — never
# overflow VMEM. 512 lanes exceeded the 16 MB scoped-VMEM limit by 12 KB
# at K=400 once the area scratch was added (the evaluator's ~1000-lane
# decode hit it); 256 keeps every K<=512 configuration well under the
# limit and is what the batch-8 inference shape (160 lanes) runs anyway.
_LANE_BLOCK = 256


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "border_delta", "interpret")
)
def _greedy_nms_mask_batched_local(
    boxes: jnp.ndarray,  # (L, K, 4) corners, score-descending per lane
    valid: jnp.ndarray,  # (L, K) bool
    iou_threshold: float = 0.45,
    border_delta: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, K) bool keep mask; Pallas kernel, lanes tiled in 256-lane blocks."""
    l, k = boxes.shape[0], boxes.shape[1]
    k_pad = _ceil_to(max(k, _SUBLANE), _SUBLANE)
    block = min(_LANE_BLOCK, _ceil_to(max(l, _LANE), _LANE))
    l_pad = _ceil_to(max(l, block), block)

    def prep(c):
        x = boxes[:, :, c].T.astype(jnp.float32)  # (K, L)
        return jnp.pad(x, ((0, k_pad - k), (0, l_pad - l)))

    x1, y1, x2, y2 = prep(0), prep(1), prep(2), prep(3)
    v = jnp.pad(valid.T.astype(jnp.float32), ((0, k_pad - k), (0, l_pad - l)))

    # Per-lane-block dynamic trip count: one past the last valid row anywhere
    # in the block (rows beyond it can neither be kept nor suppress anything).
    last = jnp.max(
        jnp.where(valid, jnp.arange(1, k + 1, dtype=jnp.int32)[None, :], 0),
        axis=1,
    )  # (L,)
    last = jnp.pad(last, (0, l_pad - l))
    bounds = jnp.max(last.reshape(l_pad // block, block), axis=1)

    kernel = functools.partial(
        _nms_kernel, iou_threshold=float(iou_threshold),
        border_delta=float(border_delta),
    )
    spec = pl.BlockSpec((k_pad, block), lambda i, bounds: (0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l_pad // block,),
        in_specs=[spec] * 5,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((k_pad, block), jnp.float32)] * 2,
    )
    keep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, l_pad), jnp.float32),
        interpret=interpret,
    )(bounds, x1, y1, x2, y2, v)
    return keep[:k, :l].T > 0.5


# --------------------------------------------------------------------------- #
# SPMD partitioning: run the kernel per-shard under a sharded mesh
# --------------------------------------------------------------------------- #
#
# ``pallas_call`` carries no SPMD partitioning rule of its own, so under a
# data-parallel mesh GSPMD/Shardy would have to all-gather the lanes onto
# every device (or fail). The lanes are independent by construction —
# L = batch x (n_classes - 1) with batch on the 'data' axis — so the kernel
# partitions trivially along L. ``custom_partitioning`` states exactly that:
# lanes may shard, the candidate axis must replicate, and the per-shard
# lowering is the local kernel itself (each shard recomputes its own
# scalar-prefetch trip bounds from its local ``valid``). This is what lets
# the decoder's 'auto' policy keep the measured-faster Pallas kernel under
# multi-device serving instead of falling back to the fixpoint
# (VERDICT r3 #5; decoder.py:_resolve_auto_nms_impl).


def _nms_spmd_impl(boxes, valid, iou_threshold, border_delta, interpret):
    return _greedy_nms_mask_batched_local(
        boxes, valid, iou_threshold, border_delta, interpret
    )


_nms_spmd = custom_partitioning(_nms_spmd_impl, static_argnums=(2, 3, 4))


def _nms_partition(iou_threshold, border_delta, interpret, mesh, arg_shapes,
                   result_shape):
    arg_shardings = jax.tree_util.tree_map(lambda s: s.sharding, arg_shapes)
    result_sharding = result_shape.sharding

    def lower_fn(boxes, valid):
        return _nms_spmd_impl(boxes, valid, iou_threshold, border_delta,
                              interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


def _nms_infer_sharding(iou_threshold, border_delta, interpret, mesh,
                        arg_shapes, result_shape):
    # Keep mask inherits the lane sharding of ``boxes``; K replicated.
    from jax.sharding import NamedSharding, PartitionSpec

    spec = arg_shapes[0].sharding.spec
    lane_axis = spec[0] if len(spec) else None
    return NamedSharding(mesh, PartitionSpec(lane_axis, None))


_nms_spmd.def_partition(
    _nms_partition,
    infer_sharding_from_operands=_nms_infer_sharding,
    # Shardy rule: lanes ('l') pass through; candidates ('k') and the corner
    # coordinate axis ('c') must be replicated on every shard.
    sharding_rule="l k c, l k -> l k",
    need_replication_factors=("k", "c"),
)


def greedy_nms_mask_batched(
    boxes: jnp.ndarray,  # (L, K, 4) corners, score-descending per lane
    valid: jnp.ndarray,  # (L, K) bool
    iou_threshold: float = 0.45,
    border_delta: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, K) bool keep mask (Pallas kernel; see module docstring).

    Safe under jit with sharded inputs: the op partitions along the lane
    axis (each device runs the kernel on its local lanes) and replicates K.
    Single-device calls lower to the plain kernel unchanged.
    """
    return _nms_spmd(boxes, valid, float(iou_threshold), float(border_delta),
                     bool(interpret))
