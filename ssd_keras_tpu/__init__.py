"""ssd_keras_tpu: a TPU-native SSD object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
pierluigiferrari/ssd_keras: SSD300/SSD512/SSD7 model families, on-device
ground-truth encoding and detection decoding, the SSD multitask loss with
hard negative mining, the full 2D-detection data pipeline with augmentation
chains, Pascal-VOC / COCO evaluation, reference .h5 weight import, and
data-parallel training over a ``jax.sharding.Mesh``.
"""

from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.encoder import DegenerateBoxError, SSDInputEncoder
from ssd_keras_tpu.loss import SSDLoss
from ssd_keras_tpu.optimize import fold_batchnorm, fold_preprocessing
from ssd_keras_tpu.predictor import SSDPredictor
from ssd_keras_tpu.decoder import (
    decode_detections,
    decode_detections_fast,
    decode_detections_fast_fixed,
    decode_detections_fixed,
)

__version__ = "0.1.0"

__all__ = [
    "SSDConfig",
    "SSDInputEncoder",
    "DegenerateBoxError",
    "SSDLoss",
    "SSDPredictor",
    "fold_batchnorm",
    "fold_preprocessing",
    "decode_detections",
    "decode_detections_fast",
    "decode_detections_fixed",
    "decode_detections_fast_fixed",
]
