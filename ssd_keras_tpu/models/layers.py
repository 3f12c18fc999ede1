"""Shared model building blocks (flax.linen).

Parameter names deliberately match the reference's Keras layer names so that
ported ``.h5`` weights load by name unchanged (the name->tensor mapping is the
weight-port contract, see /root/reference/models/keras_ssd300.py and
weights_io.py here).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["L2Normalization", "preprocess_input", "conv_ssd"]


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
