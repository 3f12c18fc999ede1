"""High-level serving API: images in, detections in original coordinates out.

The reference's inference workflow is manual (resize to the model size,
``model.predict``, scale boxes back — ssd300_inference.ipynb cells 9-11).
:class:`SSDPredictor` packages that as one object with a fixed compiled batch
shape: arbitrary-sized inputs are resized on device (one fused resample per
image after host decode), padded to the compiled batch size, run through the
in-graph decode, and mapped back to each image's original pixel frame.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SSDPredictor"]


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
    """

    def __init__(self, module, variables, batch_size: int = 8,
                 confidence_thresh: float = 0.0):
        if module.mode == "training":
            raise ValueError(
                "SSDPredictor needs an 'inference' or 'inference_fast' model."
            )
        self.module = module
        self.config = module.config
        self.variables = variables
        self.batch_size = int(batch_size)
        self.confidence_thresh = confidence_thresh
        h, w = self.config.img_height, self.config.img_width

        def run(variables, images):
            # images: (B, H, W, 3) float32 already at the model size.
            return module.apply(variables, images)

        self._run = jax.jit(run)
        self._model_hw = (h, w)

    def _resize_host(self, image: np.ndarray) -> np.ndarray:
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
        resized, scales = [], []
        for image in images:
            image = np.asarray(image)
            ih, iw = image.shape[:2]
            scales.append((iw / w, ih / h))
            resized.append(
                image.astype(np.float32)
                if image.shape[:2] == (h, w) and image.ndim == 3
                else self._resize_host(image)
            )

        outputs: List[np.ndarray] = []
        for start in range(0, len(resized), self.batch_size):
            chunk = resized[start : start + self.batch_size]
            n = len(chunk)
            if n < self.batch_size:  # pad to the compiled shape
                chunk = chunk + [np.zeros((h, w, 3), np.float32)] * (
                    self.batch_size - n
                )
            dets = np.asarray(self._run(self.variables, jnp.asarray(np.stack(chunk))))
            outputs.extend(dets[:n])

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
