"""Photometric (color-space) augmentation transforms, host-side.

Capability parity with
/root/reference/data_generator/object_detection_2d_photometric_ops.py.
Every transform is a callable ``(image, labels=None) -> (image, labels)`` with
the ``Random*`` variants applying their deterministic core with probability
``prob`` (the draw ``p >= 1 - prob`` mirrors the reference so random streams
line up). The pixel work runs in OpenCV's native C++ kernels; the on-device
batched equivalents live in ``ssd_keras_tpu.data.device_aug``.
"""

from __future__ import annotations

import cv2
import numpy as np

__all__ = [
    "ConvertColor",
    "ConvertDataType",
    "ConvertTo3Channels",
    "Hue",
    "RandomHue",
    "Saturation",
    "RandomSaturation",
    "Brightness",
    "RandomBrightness",
    "Contrast",
    "RandomContrast",
    "Gamma",
    "RandomGamma",
    "HistogramEqualization",
    "RandomHistogramEqualization",
    "ChannelSwap",
    "RandomChannelSwap",
]


def _ret(image, labels):
    return image if labels is None else (image, labels)


class _Probabilistic:
    """Mixin: apply ``self._apply`` with probability ``self.prob``."""

    prob = 0.5

    def __call__(self, image, labels=None):
        if np.random.uniform(0, 1) >= (1.0 - self.prob):
            self._draw()
            return _ret(*self._split(self._apply(image), labels))
        return _ret(image, labels)

    def _split(self, image, labels):
        return image, labels

    def _draw(self):
        pass


class ConvertColor:
    """RGB <-> HSV <-> GRAY conversion (cv2.cvtColor wrapper)."""

    _MODES = {
        ("RGB", "HSV"): cv2.COLOR_RGB2HSV,
        ("RGB", "GRAY"): cv2.COLOR_RGB2GRAY,
        ("HSV", "RGB"): cv2.COLOR_HSV2RGB,
    }

    def __init__(self, current="RGB", to="HSV", keep_3ch=True):
        if current not in ("RGB", "HSV") or to not in ("RGB", "HSV", "GRAY"):
            raise NotImplementedError(f"Unsupported conversion {current}->{to}.")
        self.current, self.to, self.keep_3ch = current, to, keep_3ch

    def __call__(self, image, labels=None):
        if self.current == "HSV" and self.to == "GRAY":
            image = cv2.cvtColor(image, cv2.COLOR_HSV2RGB)
            image = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        elif (self.current, self.to) in self._MODES:
            image = cv2.cvtColor(image, self._MODES[(self.current, self.to)])
        if self.to == "GRAY" and self.keep_3ch:
            image = np.stack([image] * 3, axis=-1)
        return _ret(image, labels)


class ConvertDataType:
    """uint8 <-> float32 conversion; rounds before casting down to uint8."""

    def __init__(self, to="uint8"):
        if to not in ("uint8", "float32"):
            raise ValueError("`to` must be 'uint8' or 'float32'.")
        self.to = to

    def __call__(self, image, labels=None):
        if self.to == "uint8":
            image = np.round(image, decimals=0).astype(np.uint8)
        else:
            image = image.astype(np.float32)
        return _ret(image, labels)


class ConvertTo3Channels:
    """1ch/4ch -> 3ch; 3-channel images pass through unchanged."""

    def __call__(self, image, labels=None):
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        elif image.ndim == 3 and image.shape[2] == 1:
            image = np.concatenate([image] * 3, axis=-1)
        elif image.ndim == 3 and image.shape[2] == 4:
            image = image[:, :, :3]
        return _ret(image, labels)


class Hue:
    """Shift the H channel of a float HSV image, wrapping modulo 180."""

    def __init__(self, delta):
        if not -180 <= delta <= 180:
            raise ValueError("`delta` must be within [-180, 180].")
        self.delta = delta

    def __call__(self, image, labels=None):
        image[:, :, 0] = (image[:, :, 0] + self.delta) % 180.0
        return _ret(image, labels)


class RandomHue(_Probabilistic):
    def __init__(self, max_delta=18, prob=0.5):
        if not 0 <= max_delta <= 180:
            raise ValueError("`max_delta` must be within [0, 180].")
        self.max_delta = max_delta
        self.prob = prob
        self._op = Hue(delta=0)

    def _draw(self):
        self._op.delta = np.random.uniform(-self.max_delta, self.max_delta)

    def _apply(self, image):
        return self._op(image)


class Saturation:
    """Scale the S channel of a float HSV image, clipped to [0, 255]."""

    def __init__(self, factor):
        if factor <= 0.0:
            raise ValueError("`factor` must be > 0.")
        self.factor = factor

    def __call__(self, image, labels=None):
        image[:, :, 1] = np.clip(image[:, :, 1] * self.factor, 0, 255)
        return _ret(image, labels)


class RandomSaturation(_Probabilistic):
    def __init__(self, lower=0.3, upper=2.0, prob=0.5):
        if lower >= upper:
            raise ValueError("`upper` must be greater than `lower`.")
        self.lower, self.upper, self.prob = lower, upper, prob
        self._op = Saturation(factor=1.0)

    def _draw(self):
        self._op.factor = np.random.uniform(self.lower, self.upper)

    def _apply(self, image):
        return self._op(image)


class Brightness:
    """Add a constant to a float RGB image, clipped to [0, 255]."""

    def __init__(self, delta):
        self.delta = delta

    def __call__(self, image, labels=None):
        return _ret(np.clip(image + self.delta, 0, 255), labels)


class RandomBrightness(_Probabilistic):
    def __init__(self, lower=-84, upper=84, prob=0.5):
        if lower >= upper:
            raise ValueError("`upper` must be greater than `lower`.")
        self.lower, self.upper, self.prob = float(lower), float(upper), prob
        self._op = Brightness(delta=0)

    def _draw(self):
        self._op.delta = np.random.uniform(self.lower, self.upper)

    def _apply(self, image):
        return self._op(image)


class Contrast:
    """Scale a float RGB image around the 127.5 pivot, clipped to [0, 255]."""

    def __init__(self, factor):
        if factor <= 0.0:
            raise ValueError("`factor` must be > 0.")
        self.factor = factor

    def __call__(self, image, labels=None):
        return _ret(np.clip(127.5 + self.factor * (image - 127.5), 0, 255), labels)


class RandomContrast(_Probabilistic):
    def __init__(self, lower=0.5, upper=1.5, prob=0.5):
        if lower >= upper:
            raise ValueError("`upper` must be greater than `lower`.")
        self.lower, self.upper, self.prob = lower, upper, prob
        self._op = Contrast(factor=1.0)

    def _draw(self):
        self._op.factor = np.random.uniform(self.lower, self.upper)

    def _apply(self, image):
        return self._op(image)


class Gamma:
    """Gamma-correct a uint8 RGB image via a 256-entry LUT."""

    def __init__(self, gamma):
        if gamma <= 0.0:
            raise ValueError("`gamma` must be > 0.")
        self.gamma = gamma
        inv = 1.0 / gamma
        self.table = np.array(
            [((i / 255.0) ** inv) * 255 for i in range(256)]
        ).astype("uint8")

    def __call__(self, image, labels=None):
        return _ret(cv2.LUT(image, self.table), labels)


class RandomGamma(_Probabilistic):
    def __init__(self, lower=0.25, upper=2.0, prob=0.5):
        if lower >= upper:
            raise ValueError("`upper` must be greater than `lower`.")
        self.lower, self.upper, self.prob = lower, upper, prob

    def _draw(self):
        self._op = Gamma(gamma=np.random.uniform(self.lower, self.upper))

    def _apply(self, image):
        return self._op(image)


class HistogramEqualization:
    """Equalize the V channel of a uint8 HSV image."""

    def __call__(self, image, labels=None):
        image[:, :, 2] = cv2.equalizeHist(image[:, :, 2])
        return _ret(image, labels)


class RandomHistogramEqualization(_Probabilistic):
    def __init__(self, prob=0.5):
        self.prob = prob
        self._op = HistogramEqualization()

    def _apply(self, image):
        return self._op(image)


class ChannelSwap:
    """Reorder image channels."""

    def __init__(self, order):
        self.order = order

    def __call__(self, image, labels=None):
        return _ret(image[:, :, self.order], labels)


class RandomChannelSwap(_Probabilistic):
    _PERMS = ((0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))

    def __init__(self, prob=0.5):
        self.prob = prob
        self._op = ChannelSwap(order=(0, 1, 2))

    def _draw(self):
        self._op.order = self._PERMS[np.random.randint(5)]

    def _apply(self, image):
        return self._op(image)
