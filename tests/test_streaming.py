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


def _small_dataset(n=12, seed=3):
    import os
    import tempfile

    from PIL import Image

    from ssd_keras_tpu.data import DataGenerator

    rng = np.random.RandomState(seed)
    d = tempfile.mkdtemp(prefix="stream_shard_ds_")
    filenames, labels = [], []
    for i in range(n):
        arr = rng.randint(0, 256, (40 + i % 3, 50, 3)).astype(np.uint8)
        fp = os.path.join(d, f"im{i}.png")
        Image.fromarray(arr).save(fp)
        filenames.append(fp)
        labels.append(np.array([[1 + i % 3, 5, 5, 25, 30]]))
    return DataGenerator(load_images_into_memory=True, filenames=filenames,
                         labels=labels, verbose=False)


def test_host_decode_batches_sharding_disjoint_and_complete():
    """Per-process dataset sharding (VERDICT r4 #3): every process runs the
    identically-seeded generator and takes every num_shards-th batch, so
    shard 0 and shard 1 together reproduce the unsharded batch sequence —
    disjoint local shards forming the global stream. (Each shard's stream
    must be consumed exclusively — one process per shard — because the
    reference-parity generator draws from the global NumPy RNG.)"""
    from ssd_keras_tpu.data.streaming import host_decode_batches

    def take(shard_index, num_shards, k):
        ds = _small_dataset()
        gen = host_decode_batches(ds, batch_size=4, img_height=32,
                                  img_width=32, max_gt_boxes=4,
                                  shard_index=shard_index,
                                  num_shards=num_shards, seed=99)
        return [next(gen) for _ in range(k)]

    full = take(0, 1, 4)
    s0 = take(0, 2, 2)
    s1 = take(1, 2, 2)
    interleaved = [s0[0], s1[0], s0[1], s1[1]]
    for (fu, fl, fc), (gu, gl, gc) in zip(full, interleaved):
        np.testing.assert_array_equal(fu, gu)
        np.testing.assert_array_equal(fl, gl)
        np.testing.assert_array_equal(fc, gc)


def test_host_decode_batches_sharding_validation():
    from ssd_keras_tpu.data.streaming import host_decode_batches

    ds = _small_dataset()
    with pytest.raises(ValueError, match="out of range"):
        next(host_decode_batches(ds, 4, 32, 32, 4, shard_index=2,
                                 num_shards=2))
    with pytest.raises(ValueError, match="needs a seed"):
        next(host_decode_batches(ds, 4, 32, 32, 4, shard_index=0,
                                 num_shards=2))


def test_fused_program_shared_across_instances():
    """Regression (r5): each StreamingDeviceInput used to wrap a private
    ``jax.jit`` closure, so every new stream over the same (augmentation,
    encoder) pair re-traced and re-loaded the fused program — 11-13 s per
    stream through the TPU tunnel even with a warm persistent compilation
    cache, which is what sank the r4/r5-interim streaming-bench fractions
    (docs/benchmarks/streaming_pipeline.md). The jitted callable must be
    one shared object per (aug, encoder, key-style) triple."""
    aug, enc = _pipeline()
    key = jax.random.PRNGKey(0)
    s1 = StreamingDeviceInput(_host_batches(1), aug, enc, key=key,
                              n_workers=1)
    s2 = StreamingDeviceInput(_host_batches(1), aug, enc, key=key,
                              n_workers=1)
    assert s1._fused is s2._fused
    # A different pipeline gets its own program.
    aug2, enc2 = _pipeline()
    s3 = StreamingDeviceInput(_host_batches(1), aug2, enc2, key=key,
                              n_workers=1)
    assert s3._fused is not s1._fused
    for s in (s1, s2, s3):
        s.stop()
