"""GT-to-anchor matching as XLA-compilable fixed-shape programs.

Behavioral parity with /root/reference/ssd_encoder_decoder/matching_utils.py
(``match_bipartite_greedy`` :22, ``match_multi`` :81), re-designed for TPU:
the inherently sequential greedy bipartite loop becomes a ``lax.scan`` of
masked argmaxes over a padded, fixed-shape weight matrix, and ragged ground
truth is handled with validity counts instead of dynamic shapes.

Tie-breaking parity: NumPy's ``argmax`` picks the first maximum. A flat
C-order argmax over the ``(m, n)`` matrix selects the lowest row index first
and the lowest column within that row — exactly equivalent to the reference's
per-row argmax followed by across-row argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["match_bipartite_greedy", "match_bipartite_greedy_topk", "match_multi"]


def match_bipartite_greedy(weight_matrix: jnp.ndarray, n_valid: jnp.ndarray):
    """Greedy bipartite matching over a padded weight matrix.

    Args:
      weight_matrix: ``(m, n)`` similarities, rows = ground-truth boxes
        (padded to ``m``), columns = anchors. Padded rows must contain values
        ``< 0`` so they can never outrank a live row (live entries are IoUs,
        which are >= 0).
      n_valid: scalar int — the number of real (non-padding) rows. Exactly
        ``n_valid`` matches are produced, mirroring the reference's
        ``for _ in range(num_ground_truth_boxes)`` loop.

    Returns:
      ``(matches, consumed)`` where ``matches`` is ``(m,)`` int32 with the
      matched anchor column per row (``n`` = no match, i.e. padded row), and
      ``consumed`` is the weight matrix after matched rows/columns were zeroed
      (the reference mutates its copy the same way; callers reuse it).
    """
    m, n = weight_matrix.shape
    matches0 = jnp.full((m,), n, dtype=jnp.int32)

    def step(state, i):
        w, matches = state
        live = i < n_valid
        flat_idx = jnp.argmax(w)  # C-order flat argmax == reference tie-breaking
        gt = (flat_idx // n).astype(jnp.int32)
        anchor = (flat_idx % n).astype(jnp.int32)
        # Guard with `live`: steps beyond n_valid leave the state untouched.
        gt_w = jnp.where(live, gt, m)  # out-of-bounds index -> dropped scatter
        anchor_w = jnp.where(live, anchor, n)
        matches = matches.at[gt_w].set(anchor_w, mode="drop")
        # Zero the matched row and column (to 0, as the reference does — not
        # -inf — preserving its behavior for degenerate all-zero rows).
        w = w.at[gt_w, :].set(0.0, mode="drop")
        w = w.at[:, anchor_w].set(0.0, mode="drop")
        return (w, matches), None

    (w_final, matches), _ = jax.lax.scan(
        step, (weight_matrix, matches0), jnp.arange(m, dtype=jnp.int32)
    )
    return matches, w_final


def match_bipartite_greedy_topk(weight_matrix: jnp.ndarray, n_valid: jnp.ndarray):
    """Greedy bipartite matching via a top-M reduced matrix (TPU fast path).

    Exactly the same matches as :func:`match_bipartite_greedy` for live rows,
    but the m-step scan runs on an ``(m, m)`` matrix instead of ``(m, n)``:
    since at most ``m - 1`` anchor columns are consumed before any row's turn,
    every row's greedy match lies within its own top-``m`` columns by weight.
    ``lax.top_k`` is stable (first-occurring wins among equals), preserving
    NumPy argmax tie-breaking. For SSD scales (m <= 64, n ~ 8732-24564) the
    scan state shrinks ~n/m-fold.

    Returns only the ``(m,)`` matches (column ``n`` = no match); callers that
    need the consumed matrix can zero the matched columns themselves.
    """
    m, n = weight_matrix.shape
    top_vals, top_cols = jax.lax.top_k(weight_matrix, min(m, n))  # (m, m)
    matches0 = jnp.full((m,), n, dtype=jnp.int32)

    def step(state, i):
        vals, matches = state
        live = i < n_valid
        flat_idx = jnp.argmax(vals)
        gt = (flat_idx // vals.shape[1]).astype(jnp.int32)
        slot = flat_idx % vals.shape[1]
        anchor = top_cols[gt, slot].astype(jnp.int32)
        gt_w = jnp.where(live, gt, m)
        anchor_w = jnp.where(live, anchor, n)
        matches = matches.at[gt_w].set(anchor_w, mode="drop")
        # Consume: zero the matched row, and every slot referencing the
        # matched column (reduced-matrix analogue of zeroing the column).
        vals = vals.at[gt_w, :].set(0.0, mode="drop")
        vals = jnp.where((top_cols == anchor) & live, 0.0, vals)
        return (vals, matches), None

    (_, matches), _ = jax.lax.scan(
        step, (top_vals, matches0), jnp.arange(m, dtype=jnp.int32)
    )
    return matches


def match_multi(weight_matrix: jnp.ndarray, threshold: float):
    """Per-anchor best-ground-truth matching with an IoU threshold.

    Args:
      weight_matrix: ``(m, n)``; padded/ignored rows must hold values below
        ``threshold`` (the reference documents the same contract).
      threshold: minimum weight for a match.

    Returns:
      ``(gt_indices, matched)`` — ``(n,)`` int32 best row per column (first
      maximum wins, as with ``np.argmax``), and ``(n,)`` bool mask of columns
      whose best weight met the threshold.
    """
    gt_indices = jnp.argmax(weight_matrix, axis=0).astype(jnp.int32)
    best = jnp.max(weight_matrix, axis=0)
    return gt_indices, best >= threshold
