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
import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.models.common import apply_mode, assemble_predictions, validate_mode
from ssd_keras_tpu.models.layers import (
    ConvParams,
    conv_ssd,
    fused_prediction_heads,
    preprocess_input,
    s2d_conv_kernel,
    space_to_depth,
)

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
    # Run conv1 (+ bn1, ELU and pool1) as its space-to-depth equivalent
    # (exact; see models/layers.py:s2d_conv_kernel). The 5x5 cin=3 conv1 on
    # the full-res image is the single most expensive op in the trunk
    # (~2 ms of a ~3.1 ms batch-8 forward on a v5e, 64% of the trunk)
    # because 3 input channels fill 3 of the MXU's 128 lanes; the transform
    # runs it at 12-in/128-out lanes on a 4x smaller grid and absorbs pool1
    # into a free max over the 4 output phases. Parameters are stored
    # untransformed (the .h5 layout is unchanged). Applies when the input
    # size is even; exact in all modes.
    s2d_trunk: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and train:
            raise ValueError("fold_bn=True is an inference-only graph; "
                             "train with fold_bn=False.")
        cfg = self.config
        n_classes = cfg.n_classes_with_background
        n_boxes = cfg.n_boxes_per_cell
        dt = self.compute_dtype
        use_s2d = self.s2d_trunk

        x = preprocess_input(
            x.astype(dt), cfg.subtract_mean, cfg.divide_by_stddev, cfg.swap_channels
        )

        feats = {}
        for i, ch in enumerate(_CHANNELS, start=1):
            kernel = (5, 5) if i == 1 else (3, 3)
            # Only conv1 wins from the space-to-depth form: its 5x5 kernel
            # inflates just 1.44x in FLOPs for a 4x lane-fill gain (2.0 ms
            # -> ~0.3 ms at batch 8 on a v5e, pool1 absorbed). A 3x3 conv
            # inflates 4x, and conv2 measured slower in s2d form at batch
            # 1-8. conv1's feature map is not a head input (_HEAD_LAYERS
            # starts at 4), so skipping its full-res tensor is safe.
            if use_s2d and i == 1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                x = self._s2d_conv_block(x, i, ch, kernel, dt, train)
                continue
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

    def _s2d_conv_block(self, x, i, ch, kernel_size, dt, train):
        """conv{i} + bn{i} + ELU + pool{i} in space-to-depth form (exact).

        Parameters keep the plain layout: ``conv{i}`` stores the original
        (k,k,cin,ch) kernel, ``bn{i}`` its (ch,) stats — the kernel is
        transformed at apply time, so checkpoints and .h5 round-trips are
        unaffected. BN batch statistics reduce over (batch, h, w, phase),
        the identical element set as the full-resolution layout. The
        trailing 2x2/2 VALID pool is the max over the 4 output phases of
        one block.
        """
        b, h, w, cin = x.shape
        kernel, bias = ConvParams(ch, kernel_size, name=f"conv{i}",
                                  parent=self)(cin)
        kp, bp = s2d_conv_kernel(kernel.astype(dt), bias.astype(dt))
        y = jax.lax.conv_general_dilated(
            space_to_depth(x), kp, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bp
        y = y.reshape(b, h // 2, w // 2, 4, ch)
        if not self.fold_bn:
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=dt,
                name=f"bn{i}",
            )(y)
        return jnp.max(nn.elu(y), axis=3)


def build_model(
    config: Optional[SSDConfig] = None,
    mode: str = "training",
    compute_dtype: Any = jnp.float32,
    fold_bn: bool = False,
    s2d_trunk: bool = True,
    **config_overrides,
):
    """Build an SSD7 model (reference-parity name). Returns (module, sizes)."""
    if config is None:
        config = SSDConfig.ssd7(**config_overrides)
    elif config_overrides:
        raise ValueError("Pass either a config or overrides, not both.")
    module = SSD7(config=config, mode=validate_mode(mode),
                  compute_dtype=compute_dtype, fold_bn=fold_bn,
                  s2d_trunk=s2d_trunk)
    sizes = ssd7_predictor_sizes(config.img_height, config.img_width)
    return module, np.array(sizes)


ssd_7 = build_model
