"""Mesh-sharded device input pipeline (VERDICT r3 #2).

Under data parallelism, augmentation + target encoding must run sharded on
the 'data' axis — each device processes only its own batch shard — and agree
per-sample with the single-device path (the per-sample vmap has no op that
crosses the batch axis, so equality is exact up to fp reassociation-free ops).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ssd_keras_tpu import SSDConfig, SSDInputEncoder
from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
from ssd_keras_tpu.models import ssd_7
from ssd_keras_tpu.parallel import sharding as sh

BATCH = 16
MAX_GT = 8


def _mesh():
    return sh.make_mesh(jax.devices()[:8])


def _fake_batch(seed=0, h=64, w=64):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, (BATCH, h, w, 3)).astype(np.uint8)
    labels = np.zeros((BATCH, MAX_GT, 5), np.float32)
    counts = rng.randint(1, MAX_GT, (BATCH,)).astype(np.int32)
    for b in range(BATCH):
        for m in range(counts[b]):
            x0, y0 = rng.randint(0, w - 12), rng.randint(0, h - 12)
            bw, bh = rng.randint(8, 12, 2)
            labels[b, m] = (rng.randint(1, 4), x0, y0, x0 + bw, y0 + bh)
    return images, labels, counts


def test_upload_sharded_roundtrip_and_placement():
    mesh = _mesh()
    arr = np.arange(32 * 3, dtype=np.float32).reshape(32, 3)
    out = sh.upload_sharded(arr, mesh, chunk=3)
    assert out.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), arr.ndim)
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_upload_sharded_rejects_ragged():
    mesh = _mesh()
    try:
        sh.upload_sharded(np.zeros((9, 2)), mesh)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for 9 rows on 8 devices")


def test_sharded_augmentation_matches_single_device():
    mesh = _mesh()
    images, labels, counts = _fake_batch()
    key = jax.random.PRNGKey(42)

    aug1 = DeviceSSDAugmentation(64, 64)
    augm = DeviceSSDAugmentation(64, 64, mesh=mesh)

    img1, lbl1, cnt1 = aug1(key, images, labels, counts)
    imgs, lbls, cnts = augm(
        key,
        sh.upload_sharded(images, mesh),
        sh.upload_sharded(labels, mesh),
        sh.upload_sharded(counts, mesh),
    )
    assert imgs.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), imgs.ndim)
    assert lbls.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), lbls.ndim)
    np.testing.assert_array_equal(np.asarray(cnt1), np.asarray(cnts))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(imgs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lbl1), np.asarray(lbls), atol=1e-4)


def test_sharded_encoder_matches_single_device():
    mesh = _mesh()
    _, labels, counts = _fake_batch(seed=3)
    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    _, sizes = ssd_7(cfg)

    enc1 = SSDInputEncoder(cfg, sizes, max_gt_boxes=MAX_GT)
    encm = SSDInputEncoder(cfg, sizes, max_gt_boxes=MAX_GT, mesh=mesh)

    y1 = enc1.encode_padded(labels, counts)
    ym = encm.encode_padded(
        sh.upload_sharded(labels, mesh), sh.upload_sharded(counts, mesh)
    )
    assert ym.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), ym.ndim)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ym), atol=1e-5)


def test_sharded_pipeline_accepts_unsharded_inputs():
    """jit in_shardings must also place plain host arrays (the resharding
    path the training example relies on after an on-device gather)."""
    mesh = _mesh()
    images, labels, counts = _fake_batch(seed=7)
    augm = DeviceSSDAugmentation(64, 64, mesh=mesh)
    imgs, lbls, cnts = augm(jax.random.PRNGKey(0), images, labels, counts)
    assert imgs.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), imgs.ndim)
    assert np.isfinite(np.asarray(imgs)).all()
