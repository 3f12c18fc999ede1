"""On-device batched augmentation: cv2 parity of primitives, distributional
properties of the sampled geometry, end-to-end composition with the encoder."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu.data import device_aug as DA


def test_rgb_hsv_matches_cv2_within_quantization():
    img = np.random.RandomState(0).randint(0, 256, (32, 32, 3)).astype(np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    got = np.asarray(DA.rgb_to_hsv(jnp.asarray(img, jnp.float32)))
    # cv2 quantizes to uint8; ours is continuous -> within 1 step everywhere.
    dh = np.abs(ref[..., 0] - got[..., 0])
    dh = np.minimum(dh, 180.0 - dh)  # hue is circular mod 180
    assert dh.max() <= 1.0
    assert np.abs(ref[..., 1] - got[..., 1]).max() <= 1.0  # saturation
    np.testing.assert_allclose(ref[..., 2], got[..., 2], atol=1e-3)  # value


def test_hsv_roundtrip_identity():
    img = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (16, 16, 3)).astype(np.float32)
    )
    back = DA.hsv_to_rgb(DA.rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-3)


def test_apply_geometry_crop_matches_cv2():
    """A pure in-bounds crop+resize must be bit-comparable to cv2 INTER_LINEAR."""
    img = np.random.RandomState(2).randint(0, 256, (40, 60, 3)).astype(np.float32)
    rect = jnp.array([8.0, 10.0, 32.0, 50.0])  # y0, x0, y1, x1
    boxes = jnp.zeros((4, 4))
    out, _, _ = DA.apply_geometry(
        jnp.asarray(img), boxes, jnp.int32(0), rect, jnp.bool_(False),
        16, 20, jnp.array([0.0, 0.0, 0.0]),
    )
    expected = cv2.resize(img[8:32, 10:50], (20, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-2)


def test_apply_geometry_pad_uses_background():
    img = np.full((10, 10, 3), 200.0, np.float32)
    rect = jnp.array([-10.0, -10.0, 30.0, 30.0])  # view 4x the image
    out, _, _ = DA.apply_geometry(
        jnp.asarray(img), jnp.zeros((1, 4)), jnp.int32(0), rect,
        jnp.bool_(False), 40, 40, jnp.array([123.0, 117.0, 104.0]),
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0], [123, 117, 104], atol=1e-3)  # corner: bg
    np.testing.assert_allclose(out[15, 15], [200, 200, 200], atol=1e-3)  # center: img


def test_apply_geometry_boxes_and_flip():
    img = jnp.zeros((100, 100, 3))
    boxes = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    rect = jnp.array([0.0, 0.0, 100.0, 100.0])
    _, nb, keep = DA.apply_geometry(
        img, boxes, jnp.int32(1), rect, jnp.bool_(True), 100, 100,
        jnp.zeros(3),
    )
    assert bool(keep[0])
    # Horizontal flip: x -> 100 - x (then clipped to width-1).
    np.testing.assert_allclose(np.asarray(nb[0]), [70, 20, 90, 40], atol=1.0)


def test_sample_geometry_distribution():
    """Crop acceptance: most samples crop (prob .857 * success) and rects stay
    within the sane range; every accepted crop keeps >= some GT overlap."""
    boxes = jnp.array([[100.0, 100.0, 200.0, 200.0]])
    n = 200
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    rects, flips = jax.vmap(
        lambda k: DA.sample_geometry(k, boxes, jnp.int32(1), 300, 300)
    )(keys)
    rects = np.asarray(rects)
    h = rects[:, 2] - rects[:, 0]
    w = rects[:, 3] - rects[:, 1]
    assert h.min() >= 0.3 * 300 - 1
    # Flips are roughly balanced.
    frac = float(np.mean(np.asarray(flips)))
    assert 0.3 < frac < 0.7
    # A healthy fraction of samples are genuine crops (not identity/expand).
    is_crop = (h < 300) & (w < 300)
    assert is_crop.mean() > 0.4
    ars = w / h
    assert np.all((ars[is_crop] > 0.49) & (ars[is_crop] < 2.01))


def test_device_chain_end_to_end_with_encoder():
    from ssd_keras_tpu.config import SSDConfig
    from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
    from ssd_keras_tpu.encoder import SSDInputEncoder

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    sizes = [(8, 8), (4, 4), (2, 2), (1, 1)]
    enc = SSDInputEncoder(cfg, sizes, max_gt_boxes=8)
    aug = DeviceSSDAugmentation(64, 64, n_candidates=8)

    B = 4
    images = np.random.RandomState(0).randint(0, 256, (B, 96, 128, 3)).astype(np.uint8)
    labels = np.zeros((B, 8, 5), np.float32)
    labels[:, 0] = [1, 20, 30, 70, 80]
    labels[:, 1] = [2, 60, 10, 120, 90]
    n_valid = np.full((B,), 2, np.int32)

    out, new_labels, new_n = aug(jax.random.PRNGKey(0), images, labels, n_valid)
    assert out.shape == (B, 64, 64, 3)
    y = enc.encode_padded(new_labels, new_n)
    y = np.asarray(y)
    assert y.shape == (B, 340, cfg.n_classes_with_background + 12)
    assert np.all(np.isfinite(y))
    # Images with surviving boxes get positive anchors.
    new_n = np.asarray(new_n)
    for b in range(B):
        n_pos = int((y[b, :, 1:-12].max(-1) > 0).sum())
        assert n_pos >= new_n[b]


def test_determinism_same_key():
    aug = DA.DeviceSSDAugmentation(64, 64, n_candidates=4)
    images = np.random.RandomState(0).randint(0, 256, (2, 80, 80, 3)).astype(np.uint8)
    labels = np.zeros((2, 4, 5), np.float32)
    labels[:, 0] = [1, 10, 10, 50, 50]
    nv = np.full((2,), 1, np.int32)
    a = aug(jax.random.PRNGKey(3), images, labels, nv)
    b = aug(jax.random.PRNGKey(3), images, labels, nv)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
