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
  its own shard of the upload.

Pixels cross the link as uint8 (4x cheaper than float32); the augmentation
chain's first op is the float cast it would do anyway. On a slow link the
pipeline's throughput IS the link's uint8 ceiling (measured at >=95% of it,
docs/benchmarks/streaming_pipeline.md); on a directly-attached host the
ceiling is PCIe and the chain feeds multi-thousand-img/s train steps.

Reference counterpart: the reference streams host batches straight into
``model.fit`` (/root/reference/data_generator/
object_detection_2d_data_generator.py:1078 ``generate``) — there is no
device-side chain to keep fed. This is the TPU-native design for the same
"dataset does not fit in accelerator memory" regime.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu.data.prefetch import PrefetchGenerator

__all__ = ["StreamingDeviceInput", "host_decode_batches"]


def host_decode_batches(dataset, batch_size: int, img_height: int,
                        img_width: int, max_gt_boxes: int,
                        shuffle: bool = True):
    """Endless host batches ``(uint8 images, padded labels, counts)``.

    The host's entire per-step job: decode, 3-channel conversion, one
    fixed-size resize, label padding. Augmentation and encoding happen on
    device. Labels are resized along with the image (the device chain
    expects boxes in the resized frame, the same contract as the resident
    path's ``materialize_split``).
    """
    from ssd_keras_tpu.data.geometric import Resize
    from ssd_keras_tpu.data.photometric import ConvertTo3Channels
    from ssd_keras_tpu.encoder import pad_labels

    gen = dataset.generate(
        batch_size=batch_size,
        shuffle=shuffle,
        transformations=[ConvertTo3Channels(), Resize(img_height, img_width)],
        label_encoder=None,
        returns=["processed_images", "processed_labels"],
        keep_images_without_gt=True,
    )
    for images, labels in gen:
        u8 = np.clip(np.rint(np.asarray(images)), 0, 255).astype(np.uint8)
        padded, counts = pad_labels(list(labels), max_gt_boxes, truncate=True)
        yield u8, padded, counts


class StreamingDeviceInput:
    """Double-buffered host->device feed for the on-device train pipeline.

    Iterating yields ``(images, y_encoded)`` device batches ready for the
    train step, identical in content to the HBM-resident path's batches for
    the same pixels and PRNG keys (tests/test_streaming.py pins this).

    Parameters
    ----------
    host_batches:
        Iterator of ``(uint8 images (B,H,W,3), padded labels (B,M,5),
        counts (B,))`` host arrays, e.g. :func:`host_decode_batches`.
    device_aug / encoder:
        A ``DeviceSSDAugmentation`` and ``SSDInputEncoder``; pass both
        constructed with the same ``mesh`` (or both without) — the stream
        uploads straight into the sharding their programs expect.
    depth:
        Upload lookahead: how many batches are in flight beyond the one
        being consumed. 2 = classic double buffering; more helps only when
        per-batch time is jittery.
    prefetch_depth / n_workers:
        Host-side decode queue depth and worker threads.
    """

    def __init__(self, host_batches: Iterator, device_aug, encoder,
                 key: Optional[jax.Array] = None, depth: int = 2,
                 prefetch_depth: int = 4, n_workers: int = 2):
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
        self._depth = max(1, int(depth))
        mesh = getattr(device_aug, "mesh", None)
        if mesh is not None:
            from ssd_keras_tpu.parallel.sharding import batch_sharding
            self._sharding = batch_sharding(mesh, device_aug.axis_name)
        else:
            self._sharding = None

    def _upload(self, arr):
        if self._sharding is None:
            return jax.device_put(np.ascontiguousarray(arr))
        return jax.device_put(np.ascontiguousarray(arr), self._sharding)

    def _issue(self, item):
        """Dispatch one batch's upload + augment + encode; returns device
        values immediately (everything is asynchronous)."""
        u8, padded, counts = item
        self._key, sub = jax.random.split(self._key)
        imgs = self._upload(u8)
        lbls = self._upload(np.asarray(padded, np.float32))
        cnts = self._upload(np.asarray(counts, np.int32))
        aug_imgs, aug_lbls, aug_counts = self._aug(sub, imgs, lbls, cnts)
        return aug_imgs, self._encoder.encode_padded(aug_lbls, aug_counts)

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
