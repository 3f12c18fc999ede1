"""Inference-graph optimizations: host-side parameter transforms.

The reference serves its Keras graphs exactly as trained
(/root/reference/models/keras_ssd7.py:30 keeps every BatchNormalization in
the inference graph). On TPU the BN scale/shift after each conv is a pure
linear map at inference time, so it can be folded into the conv kernel and
bias *before* compilation — the compiled trunk then contains only
conv+bias+ELU.

Measured effect (BENCH_MATRIX.json 'bn-folded' rows vs the live-BN rows):
~1% at SSD7 batch 8/32 — XLA already fuses the inference-mode BN affine
into the conv's epilogue, so folding buys little raw speed on this chip.
What it does buy: a params-only serving contract (no ``batch_stats``
collection to thread through predictors/checkpoints) and a trunk whose HLO
is plain conv+bias for downstream tooling, at zero accuracy cost (exact up
to float rounding, pinned by tests/test_optimize.py).

Folding math (per output channel c, Keras BN semantics):

    scale_c   = gamma_c / sqrt(var_c + eps)
    kernel'_c = kernel_c * scale_c
    bias'_c   = beta_c + (bias_c - mean_c) * scale_c

which makes ``conv'(x) == bn(conv(x))`` exactly (up to float rounding).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["fold_batchnorm"]


def _detect_pairs(params: Dict, batch_stats: Dict) -> List[Tuple[str, str]]:
    """Match each BN layer to its producing conv by the shared name suffix.

    SSD7's reference naming is ``conv{i}`` -> ``bn{i}``
    (/root/reference/models/keras_ssd7.py:30); any custom backbone that
    follows the same convention is detected too. Raises if a BN layer has
    no matching conv — silent partial folding would corrupt the model.
    """
    pairs = []
    for bn_name in batch_stats:
        if not bn_name.startswith("bn"):
            raise ValueError(
                f"Cannot auto-match batch_stats entry {bn_name!r} to a conv; "
                "pass explicit (conv_name, bn_name) pairs."
            )
        conv_name = "conv" + bn_name[len("bn"):]
        if conv_name not in params:
            raise ValueError(
                f"BN layer {bn_name!r} has no matching conv {conv_name!r}; "
                "pass explicit (conv_name, bn_name) pairs."
            )
        pairs.append((conv_name, bn_name))
    return pairs


def fold_batchnorm(
    variables: Dict,
    pairs: Optional[List[Tuple[str, str]]] = None,
    epsilon: float = 1e-3,
) -> Dict:
    """Fold every BatchNorm into its preceding conv; return new variables.

    Args:
      variables: ``{"params": ..., "batch_stats": ...}`` as produced by
        ``model.init`` / training (Keras BN semantics: params hold
        ``scale``/``bias`` = gamma/beta, batch_stats hold ``mean``/``var``).
      pairs: explicit ``(conv_name, bn_name)`` pairs; auto-detected from the
        ``conv{i}``/``bn{i}`` naming convention when omitted.
      epsilon: the BN epsilon the model was built with (Keras default 1e-3,
        matching models/ssd7.py).

    Returns:
      ``{"params": folded}`` — BN entries removed, batch_stats gone. Apply
      with a model built with ``fold_bn=True`` (which skips the BN modules);
      outputs match the unfolded model to float rounding.
    """
    params = dict(variables["params"])
    batch_stats = variables.get("batch_stats", {})
    if not batch_stats:
        raise ValueError("variables has no batch_stats; nothing to fold.")
    if pairs is None:
        pairs = _detect_pairs(params, batch_stats)

    for conv_name, bn_name in pairs:
        conv = params[conv_name]
        bn = params[bn_name]
        stats = batch_stats[bn_name]
        gamma = np.asarray(bn["scale"], np.float64)
        beta = np.asarray(bn["bias"], np.float64)
        mean = np.asarray(stats["mean"], np.float64)
        var = np.asarray(stats["var"], np.float64)
        scale = gamma / np.sqrt(var + epsilon)
        kernel = np.asarray(conv["kernel"], np.float64) * scale
        bias = beta + (np.asarray(conv["bias"], np.float64) - mean) * scale
        dt = np.asarray(conv["kernel"]).dtype
        params[conv_name] = {
            "kernel": jnp.asarray(kernel.astype(dt)),
            "bias": jnp.asarray(bias.astype(dt)),
        }
        del params[bn_name]

    return {"params": params}
