"""SSD7: a small 7-layer trainable-from-scratch SSD (flax.linen).

Capability parity with /root/reference/models/keras_ssd7.py (``build_model``
:30): 7 Conv+BN+ELU blocks (32/48/64/64/48/48/32 channels, 5x5 first kernel),
VALID 2x2 max pools, predictor heads on conv4..conv7, same layer names
(conv1..conv7, bn1..bn7, classes4..7, boxes4..7), same prediction layout.
Doubles as the template for custom backbones.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.models.common import apply_mode, assemble_predictions, validate_mode
from ssd_keras_tpu.models.layers import conv_ssd, fused_prediction_heads, preprocess_input

__all__ = ["SSD7", "build_model", "ssd_7", "ssd7_predictor_sizes"]

_CHANNELS = (32, 48, 64, 64, 48, 48, 32)
_HEAD_LAYERS = (4, 5, 6, 7)


def ssd7_predictor_sizes(img_height: int, img_width: int) -> List[Tuple[int, int]]:
    """Static (fh, fw) of the 4 predictor layers (VALID 2x2 pools)."""
    h, w = img_height, img_width
    sizes = []
    for i in range(1, 8):
        if i >= 2:  # conv_i sees the input downsampled by pool_{i-1}
            h, w = h // 2, w // 2
        if i in _HEAD_LAYERS:
            sizes.append((h, w))
    if sizes[-1][0] < 1 or sizes[-1][1] < 1:
        raise ValueError(
            f"Input {img_height}x{img_width} is too small for SSD7's six 2x "
            "pools; both dimensions must be >= 64."
        )
    return sizes


class SSD7(nn.Module):
    config: SSDConfig
    mode: str = "training"
    compute_dtype: Any = jnp.float32
    # Serve with BatchNorm folded into the conv kernels (see
    # ssd_keras_tpu/optimize.py): the module skips its BN layers and expects
    # variables produced by ``optimize.fold_batchnorm``. Inference only.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and train:
            raise ValueError("fold_bn=True is an inference-only graph; "
                             "train with fold_bn=False.")
        cfg = self.config
        n_classes = cfg.n_classes_with_background
        n_boxes = cfg.n_boxes_per_cell
        dt = self.compute_dtype

        x = preprocess_input(
            x.astype(dt), cfg.subtract_mean, cfg.divide_by_stddev, cfg.swap_channels
        )

        feats = {}
        for i, ch in enumerate(_CHANNELS, start=1):
            kernel = (5, 5) if i == 1 else (3, 3)
            x = conv_ssd(ch, kernel, f"conv{i}", dtype=dt)(x)
            if not self.fold_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.99,
                    epsilon=1e-3,  # Keras BatchNormalization default
                    dtype=dt,
                    name=f"bn{i}",
                )(x)
            x = nn.elu(x)
            feats[i] = x
            if i < 7:
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")

        conf_maps, loc_maps = [], []
        for j, layer in enumerate(_HEAD_LAYERS):
            conf_map, loc_map = fused_prediction_heads(
                self, feats[layer], f"__head{layer}", n_boxes[j], n_classes, dt,
                conf_name=f"classes{layer}", loc_name=f"boxes{layer}",
            )
            conf_maps.append(conf_map)
            loc_maps.append(loc_map)

        predictor_sizes = [m.shape[1:3] for m in loc_maps]
        anchors8 = cfg.anchor_tensor(predictor_sizes)
        predictions = assemble_predictions(conf_maps, loc_maps, anchors8, n_classes)
        return apply_mode(predictions, self.mode, cfg)


def build_model(
    config: Optional[SSDConfig] = None,
    mode: str = "training",
    compute_dtype: Any = jnp.float32,
    fold_bn: bool = False,
    **config_overrides,
):
    """Build an SSD7 model (reference-parity name). Returns (module, sizes)."""
    if config is None:
        config = SSDConfig.ssd7(**config_overrides)
    elif config_overrides:
        raise ValueError("Pass either a config or overrides, not both.")
    module = SSD7(config=config, mode=validate_mode(mode),
                  compute_dtype=compute_dtype, fold_bn=fold_bn)
    sizes = ssd7_predictor_sizes(config.img_height, config.img_width)
    return module, np.array(sizes)


ssd_7 = build_model
