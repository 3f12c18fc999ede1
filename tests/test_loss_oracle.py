"""Cross-framework loss parity: the reference's OWN compute_loss as oracle.

Model y_pred is cross-framework verified (tests/test_keras_parity.py); this
covers the other half of the training step. The reference loss
(/root/reference/keras_loss_function/keras_ssd_loss.py:98-211) is TF1-style
but runs under TF2 eager with four one-line API shims (``tf.to_float``,
``tf.to_int32``, ``tf.log``, ``tf.count_nonzero``) — none of which change
numerics. Random y_true/y_pred fixtures cover multi/zero positives, exact
loss ties at the top-k cut, ``n_neg_min > 0``, all-neutral images, and the
n_neg_losses == 0 tf.cond branch; the JAX ``SSDLoss`` must match the
per-batch-item loss vector to fp32 tolerance.
"""

import sys

import numpy as np
import pytest

from conftest import requires_reference

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from ssd_keras_tpu.loss import SSDLoss


@pytest.fixture(scope="module")
def ref_loss_cls():
    # TF1 -> TF2 shims (same trick tests/tf_oracle.py plays for the models).
    if not hasattr(tf, "to_float"):
        tf.to_float = lambda x: tf.cast(x, tf.float32)
    if not hasattr(tf, "to_int32"):
        tf.to_int32 = lambda x: tf.cast(x, tf.int32)
    if not hasattr(tf, "log"):
        tf.log = tf.math.log
    if not hasattr(tf, "count_nonzero"):
        tf.count_nonzero = tf.math.count_nonzero
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from keras_loss_function.keras_ssd_loss import SSDLoss as RefSSDLoss

    return RefSSDLoss


def _make_batch(rng, batch=4, n_boxes=64, n_classes=5, pos_per_item=3,
                neutral_per_item=2, tie_block=0):
    """Random (y_true, y_pred) in the (B, N, C+12) contract.

    ``tie_block`` > 0 plants a run of boxes whose predicted background
    probability is identical, creating exact ties in the negative
    classification loss right where the top-k cut lands.
    """
    C = n_classes + 1  # with background
    y_true = np.zeros((batch, n_boxes, C + 12), np.float32)
    y_pred = np.zeros((batch, n_boxes, C + 12), np.float32)

    # Predicted class probabilities: random softmax.
    logits = rng.randn(batch, n_boxes, C).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    y_pred[:, :, :C] = probs
    y_pred[:, :, C:] = rng.randn(batch, n_boxes, 12).astype(np.float32)

    for b in range(batch):
        perm = rng.permutation(n_boxes)
        pos = perm[:pos_per_item]
        neutral = perm[pos_per_item:pos_per_item + neutral_per_item]
        rest = perm[pos_per_item + neutral_per_item:]
        y_true[b, rest, 0] = 1.0  # background
        for i in pos:
            y_true[b, i, 1 + rng.randint(n_classes)] = 1.0
            y_true[b, i, C:C + 4] = rng.randn(4).astype(np.float32)
        # neutral rows keep an all-zero one-hot: ignored by the loss.

    if tie_block:
        # Identical background prob for a run of background boxes in every
        # item -> their neg losses tie exactly; k typically cuts mid-run.
        y_pred[:, :tie_block, :C] = probs[0, 0]
        y_true[:, :tie_block, :] = 0.0
        y_true[:, :tie_block, 0] = 1.0
    return y_true, y_pred


def _compare(ref_loss_cls, y_true, y_pred, neg_pos_ratio=3, n_neg_min=0,
             alpha=1.0):
    ref = ref_loss_cls(neg_pos_ratio=neg_pos_ratio, n_neg_min=n_neg_min,
                       alpha=alpha)
    ours = SSDLoss(neg_pos_ratio=neg_pos_ratio, n_neg_min=n_neg_min,
                   alpha=alpha)
    ref_vec = ref.compute_loss(
        tf.constant(y_true), tf.constant(y_pred)
    ).numpy()
    our_vec = np.asarray(ours.compute_loss(jnp.asarray(y_true),
                                           jnp.asarray(y_pred)))
    np.testing.assert_allclose(our_vec, ref_vec, rtol=2e-5, atol=2e-5)
    return ref_vec


@requires_reference
def test_loss_matches_reference_random(ref_loss_cls):
    rng = np.random.RandomState(0)
    for seed in range(5):
        rng = np.random.RandomState(seed)
        y_true, y_pred = _make_batch(rng, batch=4, n_boxes=96, n_classes=6,
                                     pos_per_item=4)
        vec = _compare(ref_loss_cls, y_true, y_pred)
        assert vec.shape == (4,) and np.all(vec > 0)


@requires_reference
def test_loss_matches_reference_zero_positives(ref_loss_cls):
    """No positive boxes anywhere: n_positive == 0 path (max(1, n_pos)),
    k = max(0, n_neg_min)."""
    rng = np.random.RandomState(1)
    y_true, y_pred = _make_batch(rng, pos_per_item=0)
    _compare(ref_loss_cls, y_true, y_pred)
    _compare(ref_loss_cls, y_true, y_pred, n_neg_min=7)


@requires_reference
def test_loss_matches_reference_all_neutral(ref_loss_cls):
    """Every one-hot row all-zero: n_neg_losses == 0 exercises the
    reference's tf.cond f1 branch (keras_ssd_loss.py:170-171)."""
    rng = np.random.RandomState(2)
    y_true, y_pred = _make_batch(rng, pos_per_item=0, neutral_per_item=0)
    y_true[:, :, 0] = 0.0  # nothing is background either
    ref_vec = _compare(ref_loss_cls, y_true, y_pred)
    np.testing.assert_allclose(ref_vec, 0.0, atol=1e-7)


@requires_reference
def test_loss_matches_reference_ties_at_cut(ref_loss_cls):
    """Exact ties in the negative loss across the top-k boundary: both
    implementations break ties by first occurrence, and tied values make the
    kept-sum identical regardless."""
    rng = np.random.RandomState(3)
    y_true, y_pred = _make_batch(rng, batch=2, n_boxes=48, n_classes=4,
                                 pos_per_item=2, tie_block=24)
    _compare(ref_loss_cls, y_true, y_pred)


@requires_reference
def test_loss_matches_reference_n_neg_min(ref_loss_cls):
    """n_neg_min > 3*n_pos forces the max() branch to pick n_neg_min."""
    rng = np.random.RandomState(4)
    y_true, y_pred = _make_batch(rng, batch=2, n_boxes=128, n_classes=5,
                                 pos_per_item=1)
    _compare(ref_loss_cls, y_true, y_pred, n_neg_min=50)
    _compare(ref_loss_cls, y_true, y_pred, neg_pos_ratio=5, alpha=0.5)
