"""Streaming device input pipeline (VERDICT r3 #6).

For datasets bigger than HBM, ``StreamingDeviceInput`` double-buffers uint8
uploads into the same fused on-device augment + encode programs the
HBM-resident path uses. These tests pin: streamed batches equal the direct
(unpipelined) path for the same pixels and PRNG key sequence, host errors
propagate, mesh-sharded streams match unsharded ones, and mismatched
aug/encoder meshes are rejected up front.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssd_keras_tpu import SSDConfig, SSDInputEncoder
from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
from ssd_keras_tpu.data.streaming import StreamingDeviceInput
from ssd_keras_tpu.models import ssd_7
from ssd_keras_tpu.parallel import sharding as sh

BATCH = 16
MAX_GT = 8
H = W = 64


def _host_batches(n, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        images = rng.randint(0, 256, (BATCH, H, W, 3)).astype(np.uint8)
        labels = np.zeros((BATCH, MAX_GT, 5), np.float32)
        counts = rng.randint(1, MAX_GT, (BATCH,)).astype(np.int32)
        for b in range(BATCH):
            for m in range(counts[b]):
                x0, y0 = rng.randint(0, W - 12), rng.randint(0, H - 12)
                bw, bh = rng.randint(8, 12, 2)
                labels[b, m] = (rng.randint(1, 4), x0, y0, x0 + bw, y0 + bh)
        yield images, labels, counts


def _pipeline(mesh=None):
    cfg = SSDConfig.ssd7(n_classes=3, img_height=H, img_width=W)
    _, sizes = ssd_7(cfg)
    aug = DeviceSSDAugmentation(H, W, mesh=mesh)
    enc = SSDInputEncoder(cfg, sizes, max_gt_boxes=MAX_GT, mesh=mesh)
    return aug, enc


def test_stream_matches_direct_path():
    """Pipelining must not change content: each yielded batch equals the
    direct aug+encode of the same host batch with the same per-batch key
    (the key chain is iterated jax.random.split, preserved exactly by the
    block-precomputed `_split_chain`). Pixels are bit-equal; encoded targets
    match to float32 rounding — the stream runs augment+encode as ONE fused
    XLA program (one launch per batch), whose fusion boundaries may round
    intermediate box coordinates 1 ulp differently than the two-program
    direct path."""
    aug, enc = _pipeline()
    key = jax.random.PRNGKey(7)
    stream = StreamingDeviceInput(_host_batches(5), aug, enc, key=key,
                                  depth=3, n_workers=1)
    got = [(np.asarray(i), np.asarray(y)) for i, y in stream]
    assert len(got) == 5

    k = key
    for (gi, gy), (u8, padded, counts) in zip(got, _host_batches(5)):
        k, sub = jax.random.split(k)
        di, dl, dc = aug(sub, u8, padded, counts)
        dy = enc.encode_padded(dl, dc)
        np.testing.assert_array_equal(gi, np.asarray(di))
        np.testing.assert_allclose(gy, np.asarray(dy), rtol=1e-5, atol=1e-6)


def test_stream_host_error_propagates():
    def bad_gen():
        yield from _host_batches(1)
        raise RuntimeError("decoder exploded")

    aug, enc = _pipeline()
    stream = StreamingDeviceInput(bad_gen(), aug, enc, n_workers=1)
    it = iter(stream)
    with pytest.raises(RuntimeError, match="decoder exploded"):
        for _ in range(3):
            next(it)


def test_stream_sharded_matches_unsharded():
    mesh = sh.make_mesh(jax.devices()[:8])
    aug1, enc1 = _pipeline()
    augm, encm = _pipeline(mesh=mesh)
    key = jax.random.PRNGKey(3)

    plain = [(np.asarray(i), np.asarray(y)) for i, y in StreamingDeviceInput(
        _host_batches(3, seed=2), aug1, enc1, key=key, n_workers=1)]
    sharded = StreamingDeviceInput(_host_batches(3, seed=2), augm, encm,
                                   key=key, n_workers=1)
    n = 0
    for (pi, py), (si, sy) in zip(plain, sharded):
        assert si.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data")), si.ndim)
        assert sy.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data")), sy.ndim)
        np.testing.assert_allclose(pi, np.asarray(si), atol=1e-4)
        np.testing.assert_allclose(py, np.asarray(sy), atol=1e-5)
        n += 1
    assert n == 3


def test_stream_rejects_mismatched_meshes():
    mesh = sh.make_mesh(jax.devices()[:8])
    aug, _ = _pipeline(mesh=mesh)
    _, enc = _pipeline(mesh=None)
    with pytest.raises(ValueError, match="same mesh"):
        StreamingDeviceInput(_host_batches(1), aug, enc)
