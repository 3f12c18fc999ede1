"""High-level serving API: images in, detections in original coordinates out.

The reference's inference workflow is manual (resize to the model size,
``model.predict``, scale boxes back — ssd300_inference.ipynb cells 9-11).
:class:`SSDPredictor` packages that as one object: arbitrary-sized inputs are
resized **on device** — the resample is fused into the compiled forward pass
(one jitted program per distinct input shape, uint8 upload), so no host-side
image loop sits in front of the model. Inputs that PIL must normalize first
(grayscale, RGBA, palette) fall back to a host resize. Batches are
chunked/padded to the compiled batch size and detections are mapped back to
each image's original pixel frame.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SSDPredictor", "device_resize_batch"]


def device_resize_batch(images, out_height: int, out_width: int):
    """Bilinear-resize a (B, H, W, 3) batch to (B, out_h, out_w, 3) float32.

    ``jax.image.resize`` with ``method='linear', antialias=True`` — the same
    triangle-filter convention PIL's ``Image.BILINEAR`` uses (Pillow applies
    the filter with support scaled by the downscale factor), so the device
    path is numerically interchangeable with the reference workflow's host
    resize. Runs as part of whatever jit traces it.
    """
    x = images.astype(jnp.float32)
    return jax.image.resize(
        x, (x.shape[0], out_height, out_width, 3), method="linear",
        antialias=True,
    )


class SSDPredictor:
    """Batched, jit-compiled end-to-end SSD inference.

    Args:
      module: an 'inference' or 'inference_fast'-mode model (ssd_300 / ssd_512
        / ssd_7 builder output).
      variables: flax variables dict (``{"params": ...}`` and, for SSD7,
        ``"batch_stats"``).
      batch_size: the compiled batch size; requests are chunked/padded to it.
      confidence_thresh: post-filter on returned rows (the in-graph decode
        already applied the model's configured threshold/NMS/top-k).
      resize_on_device: fuse the input resample into the compiled forward
        (default). ``False`` forces the host PIL path for every non-model-size
        input (useful to reproduce the reference's exact PIL numerics).
      max_compiled_shapes: each distinct (height, width, dtype) input shape
        compiles (and retains) its own XLA program; serving arbitrary
        resolutions would otherwise grow that cache without bound. Beyond
        this many shapes the least-recently-used program is dropped (it is
        recompiled if that shape comes back). Callers with truly variable
        inputs should bucket sizes upstream.
    """

    def __init__(self, module, variables, batch_size: int = 8,
                 confidence_thresh: float = 0.0, resize_on_device: bool = True,
                 max_compiled_shapes: int = 16):
        if module.mode == "training":
            raise ValueError(
                "SSDPredictor needs an 'inference' or 'inference_fast' model."
            )
        self.module = module
        self.config = module.config
        self.variables = variables
        self.batch_size = int(batch_size)
        self.confidence_thresh = confidence_thresh
        self.resize_on_device = resize_on_device
        self._model_hw = (self.config.img_height, self.config.img_width)
        # One compiled resize+forward program per (in_h, in_w, dtype),
        # LRU-bounded at max_compiled_shapes.
        from collections import OrderedDict

        self._compiled: "OrderedDict[Tuple, object]" = OrderedDict()
        self._max_compiled = max(1, int(max_compiled_shapes))

    def _fused_run(self, ih: int, iw: int, dtype):
        """Jitted resize(ih, iw -> model size) + forward, cached per shape."""
        key = (ih, iw, np.dtype(dtype).str)
        fn = self._compiled.get(key)
        if fn is not None:
            self._compiled.move_to_end(key)
        if fn is None:
            h, w = self._model_hw
            module = self.module
            if (ih, iw) == (h, w):
                def f(variables, imgs):
                    return module.apply(variables, imgs.astype(jnp.float32))
            else:
                def f(variables, imgs):
                    return module.apply(variables, device_resize_batch(imgs, h, w))
            fn = jax.jit(f)
            self._compiled[key] = fn
            while len(self._compiled) > self._max_compiled:
                self._compiled.popitem(last=False)
        return fn

    def _resize_host(self, image: np.ndarray) -> np.ndarray:
        """PIL fallback for inputs the device path can't take directly
        (grayscale, RGBA, palette arrays) or when resize_on_device=False."""
        from PIL import Image

        h, w = self._model_hw
        return np.asarray(
            Image.fromarray(np.asarray(image, np.uint8)).convert("RGB").resize(
                (w, h), Image.BILINEAR
            ),
            dtype=np.float32,
        )

    def predict(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Detections per image: rows ``[class_id, conf, xmin, ymin, xmax, ymax]``
        in each input image's own pixel coordinates, zero rows removed."""
        h, w = self._model_hw
        scales = []
        groups: Dict[Tuple, Tuple[List[int], List[np.ndarray]]] = {}
        for i, image in enumerate(images):
            image = np.asarray(image)
            ih, iw = image.shape[:2]
            scales.append((iw / w, ih / h))
            device_ok = image.ndim == 3 and image.shape[2] == 3 and (
                self.resize_on_device or (ih, iw) == (h, w)
            )
            if not device_ok:
                image = self._resize_host(image)
                ih, iw = h, w
            key = (ih, iw, image.dtype.str)
            idxs, arrs = groups.setdefault(key, ([], []))
            idxs.append(i)
            arrs.append(image)

        outputs: List[np.ndarray] = [None] * len(images)
        for (ih, iw, _), (idxs, arrs) in groups.items():
            run = self._fused_run(ih, iw, arrs[0].dtype)
            # Double-buffered uploads: ``jax.device_put`` and the jitted
            # forward both dispatch asynchronously, so chunk N+1's host
            # stacking and H2D transfer proceed while chunk N computes and
            # while N-1's small decoded result returns. The only syncs are
            # the drains. With a slow host->device link the transfer is the
            # throughput floor (see docs/benchmarks/h2d_ceiling.md); the
            # pipeline keeps compute and both transfer directions inside
            # that floor instead of adding to it.
            from collections import deque

            pending = deque()  # (chunk_start, n_valid, device_out)

            def _drain_one():
                start, n, out = pending.popleft()
                dets = np.asarray(out)
                for j in range(n):
                    outputs[idxs[start + j]] = dets[j]

            for start in range(0, len(arrs), self.batch_size):
                chunk = arrs[start : start + self.batch_size]
                n = len(chunk)
                if n < self.batch_size:  # pad to the compiled shape
                    chunk = chunk + [np.zeros_like(chunk[0])] * (
                        self.batch_size - n
                    )
                dev_in = jax.device_put(np.stack(chunk))
                pending.append((start, n, run(self.variables, dev_in)))
                if len(pending) > 2:
                    _drain_one()
            while pending:
                _drain_one()

        results = []
        for dets, (sx, sy) in zip(outputs, scales):
            keep = (dets[:, 0] != 0) & (dets[:, 1] > self.confidence_thresh)
            dets = dets[keep].copy()
            dets[:, [2, 4]] *= sx
            dets[:, [3, 5]] *= sy
            results.append(dets)
        return results

    def __call__(self, images):
        return self.predict(images)
