"""Shared model building blocks (flax.linen).

Parameter names deliberately match the reference's Keras layer names so that
ported ``.h5`` weights load by name unchanged (the name->tensor mapping is the
weight-port contract, see /root/reference/models/keras_ssd300.py and
weights_io.py here).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "L2Normalization",
    "AnchorBoxes",
    "preprocess_input",
    "conv_ssd",
    "ConvParams",
    "fused_prediction_heads",
]


class L2Normalization(nn.Module):
    """Channel-wise L2 normalization with a learnable per-channel scale.

    ParseNet-style; the reference applies it to conv4_3 only with gamma
    initialized to 20 (keras_layers/keras_layer_L2Normalization.py:25-63).
    Keras' ``K.l2_normalize`` uses ``x / sqrt(max(sum(x^2), 1e-12))``.
    """

    gamma_init: float = 20.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.gamma_init, dtype=jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), 1e-12))
        return x / norm * gamma.astype(x.dtype)


class AnchorBoxes(nn.Module):
    """Anchor constants for one predictor layer, for custom model builders.

    The built-in SSD300/512/7 modules fold anchors straight into the
    prediction tensor via the shared generator; this module exists for users
    composing their own backbones in the style of the reference's
    ``AnchorBoxes`` Keras layer (keras_layers/keras_layer_AnchorBoxes.py:27):
    given a feature map ``(B, fh, fw, ch)`` it returns the matching
    ``(B, fh, fw, n_boxes, 8)`` anchors+variances tensor. The values are a
    compile-time constant (XLA folds them); nothing is recomputed at runtime.
    """

    img_height: int
    img_width: int
    this_scale: float
    next_scale: float
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    two_boxes_for_ar1: bool = True
    this_steps: Optional[float] = None
    this_offsets: Optional[float] = None
    clip_boxes: bool = False
    variances: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    coords: str = "centroids"
    normalize_coords: bool = True

    @nn.compact
    def __call__(self, feature_map):
        import numpy as np

        from ssd_keras_tpu.ops.anchors import anchor_grid_for_layer

        fh, fw = feature_map.shape[1], feature_map.shape[2]
        grid = anchor_grid_for_layer(
            self.img_height, self.img_width, (fh, fw), list(self.aspect_ratios),
            self.this_scale, self.next_scale,
            two_boxes_for_ar1=self.two_boxes_for_ar1,
            this_steps=self.this_steps, this_offsets=self.this_offsets,
            clip_boxes=self.clip_boxes, normalize_coords=self.normalize_coords,
            coords=self.coords,
        )
        var = np.broadcast_to(np.asarray(self.variances, np.float64), grid.shape)
        anchors = jnp.asarray(
            np.concatenate([grid, var], axis=-1), dtype=jnp.float32
        )
        b = feature_map.shape[0]
        return jnp.broadcast_to(anchors[None], (b,) + anchors.shape)


def preprocess_input(
    x,
    subtract_mean: Optional[Sequence[float]],
    divide_by_stddev: Optional[Sequence[float]],
    swap_channels: Optional[Sequence[int]],
):
    """In-graph Caffe-style input preprocessing.

    Mean subtraction, stddev division, then channel reordering — the same
    pipeline as the reference's Lambda layers (keras_ssd300.py:247-272).
    """
    if subtract_mean is not None:
        x = x - jnp.asarray(subtract_mean, dtype=x.dtype)
    if divide_by_stddev is not None:
        x = x / jnp.asarray(divide_by_stddev, dtype=x.dtype)
    if swap_channels:
        x = x[..., list(swap_channels)]
    return x


class ConvParams(nn.Module):
    """Declares a Conv2D's parameters without applying them.

    Used by :func:`fused_prediction_heads` to keep the reference's per-head
    parameter names (the .h5 weight contract) while executing the conf+loc
    pair as one fused convolution.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            self.kernel_size + (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


def fused_prediction_heads(parent, feat, src: str, n_boxes: int,
                           n_classes: int, dtype,
                           conf_name: Optional[str] = None,
                           loc_name: Optional[str] = None):
    """Run the conf and loc heads of one feature map as a single conv.

    The two 3x3 heads have small output-channel counts (n_boxes * 21 and
    n_boxes * 4) that underfill the MXU's 128-wide tiles; concatenating their
    kernels and running ONE convolution is ~3x faster while computing
    bit-identical per-channel results (each output channel is an independent
    sum). Parameters still live under the reference names
    ``{src}_mbox_conf`` / ``{src}_mbox_loc`` (or explicit ``conf_name`` /
    ``loc_name`` — SSD7 uses ``classes{i}`` / ``boxes{i}``).
    """
    cin = feat.shape[-1]
    kc, bc = ConvParams(n_boxes * n_classes,
                        name=conf_name or f"{src}_mbox_conf",
                        parent=parent)(cin)
    kl, bl = ConvParams(n_boxes * 4, name=loc_name or f"{src}_mbox_loc",
                        parent=parent)(cin)
    kernel = jnp.concatenate([kc, kl], axis=-1).astype(dtype)
    bias = jnp.concatenate([bc, bl]).astype(dtype)
    out = jax.lax.conv_general_dilated(
        feat, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    n_conf = n_boxes * n_classes
    return out[..., :n_conf], out[..., n_conf:]


def s2d_conv_kernel(kernel, bias):
    """Space-to-depth(2) transform of a stride-1 SAME square conv kernel,
    k in {1, 3, 5}.

    Rewrites a ``(k, k, cin, cout)`` convolution over ``(H, W, cin)`` as an
    equivalent 3-tap convolution over the 2x2-space-to-depth input
    ``(H/2, W/2, 4*cin)`` producing ``(H/2, W/2, 4*cout)`` — one output block
    of 2x2 pixels per position, channel index ``(p*2+q)*cout + o`` for output
    phase ``(p, q)``. Exact (the extra taps are zeros); the payoff is MXU
    utilization: a 5x5 conv with cin=3 uses 3/128 input lanes, its
    space-to-depth form uses 12 input and 4x the output lanes. With an even
    input and a following 2x2/2 VALID max pool, the pool collapses to a free
    ``max`` over the 4 phase channels (it reduces exactly one output block).

    The reference has no counterpart (its conv1 runs as-is through cuDNN,
    /root/reference/models/keras_ssd7.py:277-284); this is the TPU-native
    answer to the same layer. Returns ``(kernel', bias')`` with ``kernel'``
    of shape ``(kb, kb, 4*cin, 4*cout)``; apply with explicit padding
    ``((1, 1), (1, 1))`` on the space-to-depth input.
    """
    k, kw, cin, cout = kernel.shape
    if k != kw:
        raise ValueError(
            f"s2d_conv_kernel expects a square kernel, got ({k}, {kw})"
        )
    if k not in (1, 3, 5):
        # The 3-wide block-tap table below (a in {0, 1, 2}) only covers
        # receptive fields up to 5; k >= 7 would silently drop taps.
        raise ValueError(f"s2d_conv_kernel supports k in (1, 3, 5), got {k}")
    pad = k // 2
    # Input row 2A+pp feeding output row 2H+p via tap dh satisfies
    # 2(A-H) = dh + p - pp - pad; block taps a = A-H+1 span {0,1,2} for
    # k in {3,5}. Out-of-range taps index the zero row appended below.
    a_idx = np.arange(3)[:, None, None]          # (a, pp, p)
    pp_idx = np.arange(2)[None, :, None]
    p_idx = np.arange(2)[None, None, :]
    dh = 2 * (a_idx - 1) + pp_idx - p_idx + pad  # tap into the original kernel
    dh = np.where((dh >= 0) & (dh < k), dh, k)   # k = zero row
    kz = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    gathered = kz[
        dh[:, None, :, None, :, None],           # rows:    (a, pp, p)
        dh[None, :, None, :, None, :],           # columns: (b, qq, q) — same table
    ]                                            # -> (a,b,pp,qq,p,q,cin,cout)
    kp = gathered.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(3, 3, 4 * cin, 4 * cout)
    return kp, jnp.tile(bias, 4)


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel index (pp*2+qq)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`: (B, H, W, 4C) -> (B, 2H, 2W, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def s2d_conv_apply(parent, x, features: int, kernel_size: Tuple[int, int],
                   name: str, dtype):
    """Apply a named stride-1 SAME conv via its space-to-depth form (exact).

    Declares the conv's parameters in their plain ``(k, k, cin, features)``
    layout under ``name`` — the checkpoint/.h5 layout is unchanged — and
    transforms them with :func:`s2d_conv_kernel` at apply time. Returns the
    phase-layout output ``(B, H/2, W/2, 4*features)``; follow with
    :func:`depth_to_space` to restore full resolution, or with a phase-max
    to absorb a trailing 2x2/2 pool. Requires even input height/width and
    ``kernel_size`` in {1, 3, 5} square.
    """
    kernel, bias = ConvParams(features, kernel_size, name=name,
                              parent=parent)(x.shape[-1])
    kp, bp = s2d_conv_kernel(kernel.astype(dtype), bias.astype(dtype))
    return jax.lax.conv_general_dilated(
        space_to_depth(x), kp, window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp


def conv_ssd(
    features: int,
    kernel: Tuple[int, int],
    name: str,
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    dilation: Tuple[int, int] = (1, 1),
    dtype=None,
) -> nn.Conv:
    """A named Conv2D in HWIO layout (matches Keras/TF kernel layout on disk)."""
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=strides,
        padding=padding,
        kernel_dilation=dilation,
        use_bias=True,
        kernel_init=nn.initializers.he_normal(),
        dtype=dtype,
        name=name,
    )
