"""SSD loss: hand-computed values, hard-negative-mining edge cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu.loss import SSDLoss, smooth_l1_loss, softmax_log_loss


def test_smooth_l1_regions():
    y_true = jnp.array([[[0.0, 0.0, 0.0, 0.0]]])
    y_pred = jnp.array([[[0.5, 2.0, -3.0, 0.0]]])
    # |0.5| < 1 -> 0.5*0.25 = 0.125 ; |2| -> 1.5 ; |-3| -> 2.5 ; 0 -> 0
    expected = 0.125 + 1.5 + 2.5
    np.testing.assert_allclose(float(smooth_l1_loss(y_true, y_pred)[0, 0]), expected)


def test_log_loss_clamp():
    y_true = jnp.array([[[1.0, 0.0]]])
    y_pred = jnp.array([[[0.0, 1.0]]])  # zero prob clamped at 1e-15
    got = float(softmax_log_loss(y_true, y_pred)[0, 0])
    np.testing.assert_allclose(got, -np.log(1e-15), rtol=1e-6)


def _make_case(n_classes=3, n_boxes=6, batch=2, seed=0):
    """y_true with one positive per item; softmaxed y_pred."""
    rng = np.random.RandomState(seed)
    C = n_classes  # includes background
    y_true = np.zeros((batch, n_boxes, C + 12))
    y_true[:, :, 0] = 1.0  # all background
    for b in range(batch):
        y_true[b, b + 1, 0] = 0.0
        y_true[b, b + 1, 1] = 1.0  # one positive of class 1
        y_true[b, b + 1, C : C + 4] = rng.randn(4)
    logits = rng.randn(batch, n_boxes, C)
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    loc = rng.randn(batch, n_boxes, 4)
    y_pred = np.concatenate(
        [conf, loc, np.zeros((batch, n_boxes, 8))], axis=2
    )
    return jnp.asarray(y_true), jnp.asarray(y_pred)


def _numpy_reference_loss(y_true, y_pred, neg_pos_ratio=3, n_neg_min=0, alpha=1.0):
    """Independent NumPy transcription of the documented loss semantics."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    batch, n_boxes = y_pred.shape[:2]
    cls_loss = -np.sum(
        y_true[:, :, :-12] * np.log(np.maximum(y_pred[:, :, :-12], 1e-15)), axis=-1
    )
    diff = y_true[:, :, -12:-8] - y_pred[:, :, -12:-8]
    ad = np.abs(diff)
    loc_loss = np.sum(np.where(ad < 1, 0.5 * diff**2, ad - 0.5), axis=-1)
    negatives = y_true[:, :, 0]
    positives = y_true[:, :, 1:-12].max(-1)
    n_pos = positives.sum()
    pos_cls = (cls_loss * positives).sum(-1)
    neg_all = (cls_loss * negatives).reshape(-1)
    n_neg_losses = int((neg_all > 0).sum())
    k = int(min(max(neg_pos_ratio * n_pos, n_neg_min), n_neg_losses))
    keep = np.zeros_like(neg_all)
    if k > 0:
        idx = np.argsort(-neg_all, kind="stable")[:k]
        keep[idx] = 1
    neg_cls = (neg_all * keep).reshape(batch, n_boxes).sum(-1)
    loc = (loc_loss * positives).sum(-1)
    total = (pos_cls + neg_cls + alpha * loc) / max(1.0, n_pos) * batch
    return total


def test_loss_matches_numpy_transcription():
    y_true, y_pred = _make_case()
    got = np.asarray(SSDLoss().compute_loss(y_true, y_pred))
    expected = _numpy_reference_loss(y_true, y_pred)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_hard_negative_count():
    """Exactly min(3*n_pos, nonzero negs) negatives enter the loss."""
    y_true, y_pred = _make_case(n_boxes=20)
    # 2 positives total -> 6 negatives kept.
    expected = _numpy_reference_loss(y_true, y_pred, neg_pos_ratio=3)
    got = np.asarray(SSDLoss(neg_pos_ratio=3).compute_loss(y_true, y_pred))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_n_neg_min():
    y_true, y_pred = _make_case(n_boxes=20, seed=3)
    expected = _numpy_reference_loss(y_true, y_pred, n_neg_min=10)
    got = np.asarray(SSDLoss(n_neg_min=10).compute_loss(y_true, y_pred))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_no_positives_no_nan():
    C = 3
    y_true = np.zeros((1, 4, C + 12))
    y_true[:, :, 0] = 1.0  # all background, zero positives
    conf = np.full((1, 4, C), 1.0 / C)
    y_pred = np.concatenate([conf, np.zeros((1, 4, 4 + 8))], axis=2)
    got = np.asarray(SSDLoss().compute_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert np.all(np.isfinite(got))
    # k = min(max(0, 0), nonzero) = 0 -> only (empty) positive terms remain.
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_neutral_boxes_ignored():
    """Anchors with all-zero class vectors contribute nothing."""
    C = 3
    y_true = np.zeros((1, 4, C + 12))
    y_true[0, 0, 1] = 1.0  # one positive
    # rows 1..3 all-zero class vector = neutral
    conf = np.full((1, 4, C), 1.0 / C)
    y_pred = np.concatenate([conf, np.zeros((1, 4, 12))], axis=2)
    got = float(SSDLoss()(jnp.asarray(y_true), jnp.asarray(y_pred)))
    expected = -np.log(1.0 / 3)  # only the positive's CE, /1 positive * 1 batch
    # XLA:CPU's f32 log is a fast approximation (~4e-5 relative error).
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_alpha_scales_localization():
    y_true, y_pred = _make_case(seed=5)
    l1 = np.asarray(SSDLoss(alpha=1.0).compute_loss(y_true, y_pred))
    l2 = np.asarray(SSDLoss(alpha=2.0).compute_loss(y_true, y_pred))
    expected1 = _numpy_reference_loss(y_true, y_pred, alpha=1.0)
    expected2 = _numpy_reference_loss(y_true, y_pred, alpha=2.0)
    np.testing.assert_allclose(l1, expected1, rtol=1e-4)
    np.testing.assert_allclose(l2, expected2, rtol=1e-4)
