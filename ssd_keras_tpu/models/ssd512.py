"""SSD512: VGG-16 backbone + 5 extra stages + 7 multibox heads (flax.linen).

Capability parity with /root/reference/models/keras_ssd512.py (``ssd_512`` :31):
the SSD300 topology with a stride-2 conv8 stage, a stride-2 conv9 stage, and a
final conv10 stage (pad 1, 4x4 VALID), giving 7 predictor layers and 24564
anchors at 512x512. Same layer names for .h5 weight-port compatibility.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.models.common import (
    apply_mode,
    assemble_predictions,
    same_pool_size,
    valid_size,
    validate_mode,
)
from ssd_keras_tpu.models.layers import (
    L2Normalization,
    conv_ssd,
    depth_to_space,
    fused_prediction_heads,
    preprocess_input,
    s2d_conv_apply,
)

__all__ = ["SSD512", "ssd_512", "ssd512_predictor_sizes"]

_HEAD_SOURCES = (
    "conv4_3_norm",
    "fc7",
    "conv6_2",
    "conv7_2",
    "conv8_2",
    "conv9_2",
    "conv10_2",
)


def ssd512_predictor_sizes(img_height: int, img_width: int) -> List[Tuple[int, int]]:
    """Static (fh, fw) of the 7 predictor layers for a given input size."""

    def both(f, h, w, *args):
        return f(h, *args), f(w, *args)

    h, w = both(same_pool_size, img_height, img_width)  # pool1
    h, w = both(same_pool_size, h, w)  # pool2
    h, w = both(same_pool_size, h, w)  # pool3
    conv4_3 = (h, w)
    h, w = both(same_pool_size, h, w)  # pool4; pool5 stride 1
    fc7 = (h, w)
    h, w = both(valid_size, h, w, 3, 2, 1)
    conv6_2 = (h, w)
    h, w = both(valid_size, h, w, 3, 2, 1)
    conv7_2 = (h, w)
    h, w = both(valid_size, h, w, 3, 2, 1)  # conv8_2 is stride 2 in SSD512
    conv8_2 = (h, w)
    h, w = both(valid_size, h, w, 3, 2, 1)  # conv9_2 stride 2
    conv9_2 = (h, w)
    h, w = both(valid_size, h, w, 4, 1, 1)  # conv10_2: pad 1, 4x4 VALID
    conv10_2 = (h, w)
    return [conv4_3, fc7, conv6_2, conv7_2, conv8_2, conv9_2, conv10_2]


class SSD512(nn.Module):
    config: SSDConfig
    mode: str = "training"
    compute_dtype: Any = jnp.float32
    # conv1_1 in space-to-depth form (exact; see SSD300.s2d_trunk — same
    # plain parameter layout on disk). Measured off by default: a net loss
    # at 512 scale (docs/benchmarks/s2d_trunk.md).
    s2d_trunk: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        n_classes = cfg.n_classes_with_background
        n_boxes = cfg.n_boxes_per_cell
        dt = self.compute_dtype

        x = preprocess_input(
            x.astype(dt), cfg.subtract_mean, cfg.divide_by_stddev, cfg.swap_channels
        )

        def conv(feat, k, name, **kw):
            return conv_ssd(feat, k, name, dtype=dt, **kw)

        def block(x, feats, names):
            for f, n in zip(feats, names):
                x = nn.relu(conv(f, (3, 3), n)(x))
            return x

        pool = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")

        if self.s2d_trunk and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = depth_to_space(nn.relu(
                s2d_conv_apply(self, x, 64, (3, 3), "conv1_1", dt)))
            x = nn.relu(conv(64, (3, 3), "conv1_2")(x))
        else:
            x = block(x, (64, 64), ("conv1_1", "conv1_2"))
        x = pool(x)
        x = block(x, (128, 128), ("conv2_1", "conv2_2"))
        x = pool(x)
        x = block(x, (256, 256, 256), ("conv3_1", "conv3_2", "conv3_3"))
        x = pool(x)
        x = block(x, (512, 512, 512), ("conv4_1", "conv4_2", "conv4_3"))
        conv4_3 = x
        x = pool(x)
        x = block(x, (512, 512, 512), ("conv5_1", "conv5_2", "conv5_3"))
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")  # pool5

        x = nn.relu(conv(1024, (3, 3), "fc6", dilation=(6, 6))(x))
        fc7 = nn.relu(conv(1024, (1, 1), "fc7")(x))

        pad1 = ((1, 1), (1, 1))
        x = nn.relu(conv(256, (1, 1), "conv6_1")(fc7))
        conv6_2 = nn.relu(conv(512, (3, 3), "conv6_2", strides=(2, 2), padding=pad1)(x))
        x = nn.relu(conv(128, (1, 1), "conv7_1")(conv6_2))
        conv7_2 = nn.relu(conv(256, (3, 3), "conv7_2", strides=(2, 2), padding=pad1)(x))
        x = nn.relu(conv(128, (1, 1), "conv8_1")(conv7_2))
        conv8_2 = nn.relu(conv(256, (3, 3), "conv8_2", strides=(2, 2), padding=pad1)(x))
        x = nn.relu(conv(128, (1, 1), "conv9_1")(conv8_2))
        conv9_2 = nn.relu(conv(256, (3, 3), "conv9_2", strides=(2, 2), padding=pad1)(x))
        x = nn.relu(conv(128, (1, 1), "conv10_1")(conv9_2))
        conv10_2 = nn.relu(conv(256, (4, 4), "conv10_2", padding=pad1)(x))

        conv4_3_norm = L2Normalization(name="conv4_3_norm")(conv4_3)

        features = dict(
            conv4_3_norm=conv4_3_norm,
            fc7=fc7,
            conv6_2=conv6_2,
            conv7_2=conv7_2,
            conv8_2=conv8_2,
            conv9_2=conv9_2,
            conv10_2=conv10_2,
        )
        conf_maps, loc_maps = [], []
        for i, src in enumerate(_HEAD_SOURCES):
            conf_map, loc_map = fused_prediction_heads(
                self, features[src], src, n_boxes[i], n_classes, dt
            )
            conf_maps.append(conf_map)
            loc_maps.append(loc_map)

        predictor_sizes = [m.shape[1:3] for m in loc_maps]
        anchors8 = cfg.anchor_tensor(predictor_sizes)
        predictions = assemble_predictions(conf_maps, loc_maps, anchors8, n_classes)
        return apply_mode(predictions, self.mode, cfg)


def ssd_512(
    config: Optional[SSDConfig] = None,
    mode: str = "training",
    compute_dtype: Any = jnp.float32,
    s2d_trunk: bool = False,
    **config_overrides,
):
    """Build an SSD512 model. Returns ``(module, predictor_sizes)``."""
    if config is None:
        config = SSDConfig.ssd512(**config_overrides)
    elif config_overrides:
        raise ValueError("Pass either a config or overrides, not both.")
    module = SSD512(config=config, mode=validate_mode(mode),
                    compute_dtype=compute_dtype, s2d_trunk=s2d_trunk)
    sizes = ssd512_predictor_sizes(config.img_height, config.img_width)
    return module, np.array(sizes)
