from ssd_keras_tpu.models.ssd300 import SSD300, ssd_300, ssd300_predictor_sizes
from ssd_keras_tpu.models.ssd512 import SSD512, ssd_512, ssd512_predictor_sizes
from ssd_keras_tpu.models.ssd7 import SSD7, build_model, ssd_7, ssd7_predictor_sizes
from ssd_keras_tpu.models.layers import L2Normalization

__all__ = [
    "SSD300",
    "SSD512",
    "SSD7",
    "ssd_300",
    "ssd_512",
    "ssd_7",
    "build_model",
    "L2Normalization",
    "ssd300_predictor_sizes",
    "ssd512_predictor_sizes",
    "ssd7_predictor_sizes",
]
