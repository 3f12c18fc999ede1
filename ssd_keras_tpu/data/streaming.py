"""Streaming device input pipeline for datasets bigger than HBM.

The HBM-resident delivery path (examples/ssd300_training.py) uploads the
whole decoded uint8 train split once and moves zero image bytes per step;
it caps out at the chip's (or, sharded, the slice's) HBM. This module keeps
the fused on-device augment + encode chain for arbitrarily large datasets
(BASELINE config #4: COCO trainval35k is ~31 GB of decoded uint8) by
streaming batches through a double-buffered host->device pipeline instead:

* host workers decode + fixed-size-resize images and pad labels
  (:class:`~ssd_keras_tpu.data.prefetch.PrefetchGenerator` keeps
  ``prefetch_depth`` batches ready),
* uploads keep ``depth`` batches in flight — ``jax.device_put`` and jitted
  programs dispatch asynchronously, so batch N+1's host stacking and uint8
  H2D transfer overlap batch N's augment/encode and the train step consuming
  batch N-1 (the same pipelining the predictor uses for inference,
  predictor.py:142-172),
* the device runs the identical fused ``DeviceSSDAugmentation`` ->
  ``SSDInputEncoder.encode_padded`` programs as the resident path — under a
  mesh they are the batch-sharded programs, and each device receives only
  its own shard of the upload. In multi-process (multi-host) runs each
  process uploads only its local shard of the global batch
  (``jax.make_array_from_process_local_data``; SURVEY.md §5.8).

Per batch the pipeline costs exactly TWO runtime operations — one
``jax.device_put`` of the whole ``(images, labels, counts, key)`` pytree and
one fused augment+encode program launch; the per-batch PRNG ``split`` is
precomputed in blocks (one scan dispatch per ``key_block`` batches). Pixels
cross the link as uint8 (4x cheaper than float32); the augmentation chain's
first op is the float cast it would do anyway. On a slow link the pipeline
sits on the link's uint8 ceiling (measured fraction in
docs/benchmarks/streaming_pipeline.md); on a directly-attached host the
ceiling is PCIe and the chain feeds multi-thousand-img/s train steps.

Reference counterpart: the reference streams host batches straight into
``model.fit`` (/root/reference/data_generator/
object_detection_2d_data_generator.py:1078 ``generate``) — there is no
device-side chain to keep fed. This is the TPU-native design for the same
"dataset does not fit in accelerator memory" regime.
"""

from __future__ import annotations

import functools
import itertools
from collections import deque
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.data.prefetch import PrefetchGenerator

__all__ = ["StreamingDeviceInput", "host_decode_batches"]


def host_decode_batches(dataset, batch_size: int, img_height: int,
                        img_width: int, max_gt_boxes: int,
                        shuffle: bool = True,
                        shard_index: int = 0, num_shards: int = 1,
                        seed: Optional[int] = None):
    """Endless host batches ``(uint8 images, padded labels, counts)``.

    The host's entire per-step job: decode, 3-channel conversion, one
    fixed-size resize, label padding. Augmentation and encoding happen on
    device. Labels are resized along with the image (the device chain
    expects boxes in the resized frame, the same contract as the resident
    path's ``materialize_split``).

    Multi-host sharding (``shard_index`` / ``num_shards``): every process
    runs the identical generator and takes every ``num_shards``-th batch,
    so the processes' local batches are disjoint and together form the
    global batch sequence. With ``shuffle=True`` this requires a ``seed``
    so all processes draw the same permutations (the generator seeds the
    global NumPy RNG, matching the reference's use of global ``np.random``
    in object_detection_2d_data_generator.py:933-945).
    """
    from ssd_keras_tpu.data.geometric import Resize
    from ssd_keras_tpu.data.photometric import ConvertTo3Channels
    from ssd_keras_tpu.encoder import pad_labels

    if not (0 <= shard_index < num_shards):
        raise ValueError(
            f"shard_index {shard_index} out of range for {num_shards} shards.")
    if num_shards > 1 and shuffle and seed is None:
        raise ValueError(
            "Sharded host_decode_batches with shuffle=True needs a seed so "
            "every process draws identical permutations (disjoint shards).")
    if seed is not None:
        np.random.seed(seed)

    gen = dataset.generate(
        batch_size=batch_size,
        shuffle=shuffle,
        transformations=[ConvertTo3Channels(), Resize(img_height, img_width)],
        label_encoder=None,
        returns=["processed_images", "processed_labels"],
        keep_images_without_gt=True,
    )
    if num_shards > 1:
        gen = itertools.islice(gen, shard_index, None, num_shards)
    for images, labels in gen:
        u8 = np.clip(np.rint(np.asarray(images)), 0, 255).astype(np.uint8)
        padded, counts = pad_labels(list(labels), max_gt_boxes, truncate=True)
        yield u8, padded, counts


@functools.lru_cache(maxsize=8)
def _fused_program(device_aug, encoder, typed_key: bool):
    """One jitted augment+encode program per (device_aug, encoder) pair.

    Shared across :class:`StreamingDeviceInput` instances: a per-instance
    ``jax.jit`` closure would be a fresh jit cache entry each time, so every
    new stream over the same pipeline would re-trace and re-load the
    compiled program (measured at 11-13 s per stream through the access
    tunnel even with a warm persistent compilation cache, ~8 min cold —
    docs/benchmarks/streaming_pipeline.md). The small ``lru_cache`` keeps
    the jitted callable (and with it the in-memory executable) alive for
    the pipelines in active use.
    """

    def fused(sub, imgs, lbls, cnts):
        if typed_key:
            sub = jax.random.wrap_key_data(sub)
        aug_imgs, aug_lbls, aug_counts = device_aug(sub, imgs, lbls, cnts)
        return aug_imgs, encoder.encode_padded(aug_lbls, aug_counts)

    return jax.jit(fused)


@functools.partial(jax.jit, static_argnames=("n",))
def _split_chain(key, n: int):
    """``n`` iterated ``jax.random.split`` steps in one program.

    Bit-identical to calling ``key, sub = jax.random.split(key)`` ``n``
    times (the streaming contract pinned by tests/test_streaming.py), but
    costs one dispatch + one small device_get per ``n`` batches instead of
    one dispatch per batch.
    """
    def step(k, _):
        k2, sub = jax.random.split(k)
        return k2, sub

    return jax.lax.scan(step, key, None, length=n)


class StreamingDeviceInput:
    """Double-buffered host->device feed for the on-device train pipeline.

    Iterating yields ``(images, y_encoded)`` device batches ready for the
    train step, matching the HBM-resident path's batches for the same pixels
    and PRNG keys — pixels bit-equal, encoded targets to float32 rounding
    (the fused single-program augment+encode may round intermediates 1 ulp
    differently than the two-program direct path; tests/test_streaming.py
    pins both). Construction is cheap: the fused program is shared across
    instances (``_fused_program``), so opening a new stream over an
    existing pipeline neither re-traces nor re-compiles.

    Parameters
    ----------
    host_batches:
        Iterator of ``(uint8 images (B,H,W,3), padded labels (B,M,5),
        counts (B,)) `` host arrays, e.g. :func:`host_decode_batches`.
        In multi-process runs each process passes its *local* shard of the
        global batch (``host_decode_batches(..., shard_index, num_shards)``)
        and the yielded device arrays are the assembled *global* batches.
    device_aug / encoder:
        A ``DeviceSSDAugmentation`` and ``SSDInputEncoder``; pass both
        constructed with the same ``mesh`` (or both without) — the stream
        uploads straight into the sharding their programs expect. In
        multi-process runs the mesh spans all processes' devices and the
        ctor ``key`` must be identical on every process (it drives the
        replicated augmentation RNG).
    depth:
        Upload lookahead: how many batches are in flight beyond the one
        being consumed. 2 = classic double buffering; more helps only when
        per-batch time is jittery.
    prefetch_depth / n_workers:
        Host-side decode queue depth and worker threads.
    key_block:
        How many per-batch subkeys each `_split_chain` refill produces.
    """

    def __init__(self, host_batches: Iterator, device_aug, encoder,
                 key: Optional[jax.Array] = None, depth: int = 2,
                 prefetch_depth: int = 4, n_workers: int = 2,
                 key_block: int = 64):
        if getattr(device_aug, "mesh", None) is not getattr(
                encoder, "mesh", None):
            raise ValueError(
                "device_aug and encoder must be built with the same mesh")
        self._host = PrefetchGenerator(host_batches,
                                       buffer_size=prefetch_depth,
                                       n_workers=n_workers)
        self._aug = device_aug
        self._encoder = encoder
        self._key = jax.random.PRNGKey(0) if key is None else key
        # Typed keys (jax.random.key) cross the host as raw key data and are
        # re-wrapped inside the fused program (free under jit).
        self._typed_key = jnp.issubdtype(
            jnp.asarray(self._key).dtype, jax.dtypes.prng_key)
        self._subkeys: deque = deque()
        self._key_block = max(1, int(key_block))
        self._depth = max(1, int(depth))
        self._multiprocess = jax.process_count() > 1
        mesh = getattr(device_aug, "mesh", None)
        if mesh is not None:
            from ssd_keras_tpu.parallel.sharding import (
                batch_sharding, replicated_sharding)
            data = batch_sharding(mesh, device_aug.axis_name)
            self._sharding = data
            self._put_shardings = (data, data, data, replicated_sharding(mesh))
        else:
            self._sharding = None
            self._put_shardings = None

        # One fused augment+encode program: a single launch per batch
        # instead of two. The inner jits' sharding constraints (device_aug
        # and encode_padded carry their own in/out shardings) propagate
        # through the outer jit unchanged. The jitted callable is shared
        # across instances (see _fused_program) so constructing a new
        # stream over an existing pipeline costs no re-trace/re-compile.
        self._fused = _fused_program(device_aug, encoder, self._typed_key)

    def _next_subkey(self) -> np.ndarray:
        """Next key of the iterated-split chain, refilled in blocks."""
        if not self._subkeys:
            self._key, subs = _split_chain(self._key, self._key_block)
            if self._typed_key:
                subs = jax.random.key_data(subs)
            # Tiny (key_block, key_size) transfer, once per key_block batches.
            self._subkeys.extend(np.asarray(jax.device_get(subs)))
        return self._subkeys.popleft()

    def _upload(self, u8, padded, counts, sub):
        imgs = np.ascontiguousarray(u8)
        lbls = np.asarray(padded, np.float32)
        cnts = np.asarray(counts, np.int32)
        if self._multiprocess and self._sharding is not None:
            # Each process contributes only its local shard of the global
            # batch; the key rides along as a plain (replicated) host array.
            put = functools.partial(
                jax.make_array_from_process_local_data, self._sharding)
            return put(imgs), put(lbls), put(cnts), sub
        if self._sharding is None:
            return jax.device_put((imgs, lbls, cnts, sub))
        # One device_put for the whole batch pytree: a single host->device
        # operation per batch instead of three.
        return jax.device_put((imgs, lbls, cnts, sub), self._put_shardings)

    def _issue(self, item):
        """Dispatch one batch's upload + fused augment/encode; returns device
        values immediately (everything is asynchronous)."""
        u8, padded, counts = item
        imgs, lbls, cnts, sub = self._upload(u8, padded, counts,
                                             self._next_subkey())
        return self._fused(sub, imgs, lbls, cnts)

    def __iter__(self):
        pending = deque()
        try:
            for item in self._host:
                pending.append(self._issue(item))
                if len(pending) >= self._depth:
                    yield pending.popleft()
            while pending:
                yield pending.popleft()
        finally:
            self._host.stop()

    def stop(self):
        self._host.stop()
