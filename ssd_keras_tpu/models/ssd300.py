"""SSD300: VGG-16 backbone + extras + multibox heads (flax.linen).

Capability parity with /root/reference/models/keras_ssd300.py (``ssd_300`` :31):
same topology (VGG-16 conv1_1..pool5, dilated fc6, fc7, conv6..conv9 extras,
L2-normalized conv4_3, 6 predictor layers, 8732 anchors at 300x300), same
layer/parameter names (the ``.h5`` weight-port contract), same prediction
tensor layout. Re-designed TPU-first: a single pure flax module compiled by
XLA (convs hit the MXU; bfloat16 compute supported via ``compute_dtype``),
anchors folded in as constants from the shared generator instead of a
runtime-tiled layer.
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

__all__ = ["SSD300", "ssd_300", "ssd300_predictor_sizes"]

# (feature source name, head name prefix) per predictor layer, in order.
_HEAD_SOURCES = (
    "conv4_3_norm",
    "fc7",
    "conv6_2",
    "conv7_2",
    "conv8_2",
    "conv9_2",
)


def ssd300_predictor_sizes(img_height: int, img_width: int) -> List[Tuple[int, int]]:
    """Static (fh, fw) of the 6 predictor layers for a given input size."""

    def both(f, h, w, *args):
        return f(h, *args), f(w, *args)

    h = w = None
    h, w = both(same_pool_size, img_height, img_width)  # pool1
    h, w = both(same_pool_size, h, w)  # pool2
    h, w = both(same_pool_size, h, w)  # pool3
    conv4_3 = (h, w)
    h, w = both(same_pool_size, h, w)  # pool4; pool5 is stride 1
    fc7 = (h, w)
    h, w = both(valid_size, h, w, 3, 2, 1)  # conv6_2: pad 1, 3x3/s2 valid
    conv6_2 = (h, w)
    h, w = both(valid_size, h, w, 3, 2, 1)  # conv7_2
    conv7_2 = (h, w)
    h, w = both(valid_size, h, w, 3, 1, 0)  # conv8_2: 3x3/s1 valid
    conv8_2 = (h, w)
    h, w = both(valid_size, h, w, 3, 1, 0)  # conv9_2
    conv9_2 = (h, w)
    return [conv4_3, fc7, conv6_2, conv7_2, conv8_2, conv9_2]


class SSD300(nn.Module):
    """The SSD300 network. ``__call__`` returns the mode-dependent output:

    * 'training': ``(batch, 8732, n_classes + 13)`` raw predictions
    * 'inference' / 'inference_fast': ``(batch, top_k, 6)`` decoded detections
    """

    config: SSDConfig
    mode: str = "training"
    compute_dtype: Any = jnp.float32
    # Run conv1_1 as its space-to-depth equivalent (exact; see
    # models/layers.py:s2d_conv_kernel). The 3x3 cin=3 conv on the full-res
    # image fills 27 of the MXU's 128 contraction lanes; the transform runs
    # it at 108 lanes on a 4x smaller grid. Measured OFF by default at
    # 300/512 scale: the 4x FLOP inflation of the overlapping-tap s2d form
    # plus the depth_to_space relayout costs more than the underfill saves
    # on grids this large (docs/benchmarks/s2d_trunk.md — batch-8 e2e
    # 1277 -> 1100 img/s with it on). SSD7's 128x128 conv1 is the case
    # where it wins (models/ssd7.py). Parameters keep the plain (3,3,3,64)
    # layout either way, so checkpoints and .h5 ports are unaffected.
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

        x = nn.relu(conv(256, (1, 1), "conv6_1")(fc7))
        conv6_2 = nn.relu(
            conv(512, (3, 3), "conv6_2", strides=(2, 2), padding=((1, 1), (1, 1)))(x)
        )
        x = nn.relu(conv(128, (1, 1), "conv7_1")(conv6_2))
        conv7_2 = nn.relu(
            conv(256, (3, 3), "conv7_2", strides=(2, 2), padding=((1, 1), (1, 1)))(x)
        )
        x = nn.relu(conv(128, (1, 1), "conv8_1")(conv7_2))
        conv8_2 = nn.relu(conv(256, (3, 3), "conv8_2", padding="VALID")(x))
        x = nn.relu(conv(128, (1, 1), "conv9_1")(conv8_2))
        conv9_2 = nn.relu(conv(256, (3, 3), "conv9_2", padding="VALID")(x))

        conv4_3_norm = L2Normalization(name="conv4_3_norm")(conv4_3)

        features = dict(
            conv4_3_norm=conv4_3_norm,
            fc7=fc7,
            conv6_2=conv6_2,
            conv7_2=conv7_2,
            conv8_2=conv8_2,
            conv9_2=conv9_2,
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


def ssd_300(
    config: Optional[SSDConfig] = None,
    mode: str = "training",
    compute_dtype: Any = jnp.float32,
    s2d_trunk: bool = False,
    **config_overrides,
):
    """Build an SSD300 model. Returns ``(module, predictor_sizes)``.

    With no ``config``, the canonical Pascal-VOC SSD300 configuration is used;
    ``config_overrides`` are forwarded to :meth:`SSDConfig.ssd300`.
    """
    if config is None:
        config = SSDConfig.ssd300(**config_overrides)
    elif config_overrides:
        raise ValueError("Pass either a config or overrides, not both.")
    module = SSD300(config=config, mode=validate_mode(mode),
                    compute_dtype=compute_dtype, s2d_trunk=s2d_trunk)
    sizes = ssd300_predictor_sizes(config.img_height, config.img_width)
    return module, np.array(sizes)
