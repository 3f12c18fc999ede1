from ssd_keras_tpu.data.datasets import DataGenerator, DatasetError, DegenerateBatchError
from ssd_keras_tpu.data.validation import BoundGenerator, BoxFilter, ImageValidator
from ssd_keras_tpu.data.misc import apply_inverse_transforms
from ssd_keras_tpu.data import chains, device_aug, geometric, patch_sampling, photometric
from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
from ssd_keras_tpu.data.prefetch import PrefetchGenerator, prefetch
from ssd_keras_tpu.data.streaming import StreamingDeviceInput, host_decode_batches

__all__ = [
    "DataGenerator",
    "DatasetError",
    "DegenerateBatchError",
    "BoundGenerator",
    "BoxFilter",
    "ImageValidator",
    "apply_inverse_transforms",
    "chains",
    "device_aug",
    "DeviceSSDAugmentation",
    "PrefetchGenerator",
    "prefetch",
    "StreamingDeviceInput",
    "host_decode_batches",
    "geometric",
    "patch_sampling",
    "photometric",
]
