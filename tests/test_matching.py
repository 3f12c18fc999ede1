"""Matching: lax.scan bipartite-greedy and multi-matching vs the reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu.ops.matching import match_bipartite_greedy, match_multi

from conftest import requires_reference


def _pad(weights, max_rows):
    m, n = weights.shape
    out = np.full((max_rows, n), -1.0)
    out[:m] = weights
    return out


def test_bipartite_hand_case():
    w = np.array([
        [0.1, 0.9, 0.3],
        [0.8, 0.85, 0.2],
    ])
    matches, _ = match_bipartite_greedy(jnp.asarray(_pad(w, 4)), jnp.int32(2))
    matches = np.array(matches)
    # Global max 0.9 -> gt0/anchor1; gt1 then takes its best remaining: anchor0.
    assert matches[0] == 1 and matches[1] == 0
    assert matches[2] == 3 and matches[3] == 3  # padded rows -> n (= no match)


def test_bipartite_exactly_n_valid_matches():
    rng = np.random.RandomState(0)
    w = rng.rand(3, 10)
    matches, _ = match_bipartite_greedy(jnp.asarray(_pad(w, 6)), jnp.int32(3))
    matches = np.array(matches)
    assert np.all(matches[:3] < 10) and np.all(matches[3:] == 10)
    assert len(set(matches[:3].tolist())) == 3  # distinct anchors


def test_multi_threshold():
    w = np.array([
        [0.6, 0.2, 0.55],
        [0.1, 0.7, 0.50],
    ])
    gt_idx, ok = match_multi(jnp.asarray(w), 0.5)
    assert np.array_equal(np.array(gt_idx), [0, 1, 0])
    assert np.array_equal(np.array(ok), [True, True, True])
    _, ok2 = match_multi(jnp.asarray(w), 0.65)
    assert np.array_equal(np.array(ok2), [False, True, False])


@requires_reference
def test_bipartite_parity_with_reference():
    from ssd_encoder_decoder.matching_utils import (
        match_bipartite_greedy as ref_bip,
    )

    rng = np.random.RandomState(42)
    for _ in range(20):
        m = rng.randint(1, 8)
        n = rng.randint(m, 40)
        w = rng.rand(m, n)
        expected = ref_bip(np.copy(w))
        got, _ = match_bipartite_greedy(jnp.asarray(_pad(w, 8)), jnp.int32(m))
        np.testing.assert_array_equal(np.array(got)[:m], expected)


@requires_reference
def test_multi_parity_with_reference():
    from ssd_encoder_decoder.matching_utils import match_multi as ref_multi

    rng = np.random.RandomState(11)
    for _ in range(20):
        w = rng.rand(5, 30)
        gt_ref, anchor_ref = ref_multi(np.copy(w), threshold=0.5)
        gt_idx, ok = match_multi(jnp.asarray(w), 0.5)
        got_anchors = np.nonzero(np.array(ok))[0]
        np.testing.assert_array_equal(got_anchors, anchor_ref)
        np.testing.assert_array_equal(np.array(gt_idx)[got_anchors], gt_ref)


def test_topk_matches_full_bipartite_fuzz():
    from ssd_keras_tpu.ops.matching import match_bipartite_greedy_topk

    rng = np.random.RandomState(9)
    for _ in range(30):
        m = rng.randint(1, 8)
        n = rng.randint(max(m, 4), 60)
        w = rng.rand(m, n)
        full, _ = match_bipartite_greedy(jnp.asarray(_pad(w, 8)), jnp.int32(m))
        topk = match_bipartite_greedy_topk(jnp.asarray(_pad(w, 8)), jnp.int32(m))
        np.testing.assert_array_equal(np.array(topk), np.array(full))
