"""Shared SSD head assembly and the model-output contract.

The prediction tensor layout is the cross-module contract (identical to the
reference, see ssd_input_encoder.py:550-611 and keras_ssd300.py:363-419):

``(batch, total_boxes, n_classes + 4 + 8)`` =
``[softmaxed class confidences | 4 box offsets | 4 anchor coords | 4 variances]``

with boxes ordered as the C-order flatten of each predictor layer's
``(fh, fw, n_boxes_per_cell)`` grid, layers concatenated in order.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu import decoder as decoder_mod

__all__ = ["assemble_predictions", "apply_mode", "same_pool_size", "valid_size"]


def same_pool_size(s: int) -> int:
    """Output size of a stride-2 'SAME' pool."""
    return -(-s // 2)


def valid_size(s: int, kernel: int, stride: int = 1, pad: int = 0) -> int:
    """Output size of a VALID conv with optional symmetric zero padding."""
    return (s + 2 * pad - kernel) // stride + 1


def assemble_predictions(
    conf_maps: List[jnp.ndarray],
    loc_maps: List[jnp.ndarray],
    anchors8: np.ndarray,
    n_classes_with_bg: int,
) -> jnp.ndarray:
    """Reshape + concatenate head outputs and append the anchor constants.

    ``conf_maps[i]``: (B, fh, fw, n_boxes*C); ``loc_maps[i]``: (B, fh, fw, n_boxes*4).
    Output is float32 regardless of compute dtype (softmax in f32 for accuracy).
    """
    b = conf_maps[0].shape[0]
    conf = jnp.concatenate(
        [m.reshape(b, -1, n_classes_with_bg) for m in conf_maps], axis=1
    )
    loc = jnp.concatenate([m.reshape(b, -1, 4) for m in loc_maps], axis=1)
    conf = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)
    loc = loc.astype(jnp.float32)
    anchors = jnp.broadcast_to(
        jnp.asarray(anchors8, dtype=jnp.float32)[None], (b,) + anchors8.shape
    )
    return jnp.concatenate([conf, loc, anchors], axis=2)


def validate_mode(mode: str) -> str:
    """Reject unknown modes at build time, like the reference builders do
    (keras_ssd300.py raises in ``ssd_300`` before constructing the graph)."""
    if mode not in ("training", "inference", "inference_fast"):
        raise ValueError(
            f"`mode` must be 'training', 'inference' or 'inference_fast', "
            f"got {mode!r}."
        )
    return mode


def apply_mode(predictions: jnp.ndarray, mode: str, config: SSDConfig) -> jnp.ndarray:
    """Append the in-graph decode stage for 'inference' / 'inference_fast' modes."""
    if mode == "training":
        return predictions
    kwargs = dict(
        confidence_thresh=config.confidence_thresh,
        iou_threshold=config.iou_threshold,
        top_k=config.top_k,
        nms_max_output_size=config.nms_max_output_size,
        input_coords=config.coords,
        normalize_coords=config.normalize_coords,
        img_height=config.img_height,
        img_width=config.img_width,
    )
    if mode == "inference":
        return decoder_mod.decode_detections_fixed(predictions, **kwargs)
    if mode == "inference_fast":
        return decoder_mod.decode_detections_fast_fixed(predictions, **kwargs)
    raise ValueError(
        f"`mode` must be 'training', 'inference' or 'inference_fast', got {mode!r}."
    )
