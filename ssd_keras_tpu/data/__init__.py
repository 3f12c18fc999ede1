from ssd_keras_tpu.data.datasets import DataGenerator, DatasetError, DegenerateBatchError
from ssd_keras_tpu.data.validation import BoundGenerator, BoxFilter, ImageValidator
from ssd_keras_tpu.data.misc import apply_inverse_transforms
from ssd_keras_tpu.data import chains, geometric, patch_sampling, photometric

__all__ = [
    "DataGenerator",
    "DatasetError",
    "DegenerateBatchError",
    "BoundGenerator",
    "BoxFilter",
    "ImageValidator",
    "apply_inverse_transforms",
    "chains",
    "geometric",
    "patch_sampling",
    "photometric",
]
