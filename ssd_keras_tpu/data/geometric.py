"""Geometric augmentation transforms (resize, flip, translate, scale, rotate).

Capability parity with
/root/reference/data_generator/object_detection_2d_geometric_ops.py.
Transforms are callables ``(image, labels=None, return_inverter=False)``;
inverters are closures that map predicted boxes (rows ``[class, conf, xmin,
ymin, xmax, ymax]``) back to the pre-transform coordinate frame.
"""

from __future__ import annotations

import random as _pyrandom

import cv2
import numpy as np

from ssd_keras_tpu.data.validation import DEFAULT_LABELS_FORMAT

__all__ = [
    "Resize",
    "ResizeRandomInterp",
    "Flip",
    "RandomFlip",
    "Translate",
    "RandomTranslate",
    "Scale",
    "RandomScale",
    "Rotate",
    "RandomRotate",
]


def _fmt(labels_format):
    fx = labels_format
    return fx["xmin"], fx["ymin"], fx["xmax"], fx["ymax"]


class Resize:
    """Resize to a fixed (height, width); rescales and optionally filters boxes."""

    def __init__(
        self,
        height,
        width,
        interpolation_mode=cv2.INTER_LINEAR,
        box_filter=None,
        labels_format=None,
    ):
        self.out_height = height
        self.out_width = width
        self.interpolation_mode = interpolation_mode
        self.box_filter = box_filter
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)

    def __call__(self, image, labels=None, return_inverter=False):
        img_height, img_width = image.shape[:2]
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)

        image = cv2.resize(
            image,
            dsize=(self.out_width, self.out_height),
            interpolation=self.interpolation_mode,
        )

        if return_inverter:
            hs, ws = img_height / self.out_height, img_width / self.out_width

            def inverter(preds):
                preds = np.copy(preds)
                preds[:, [ymin + 1, ymax + 1]] = np.round(preds[:, [ymin + 1, ymax + 1]] * hs)
                preds[:, [xmin + 1, xmax + 1]] = np.round(preds[:, [xmin + 1, xmax + 1]] * ws)
                return preds

        if labels is None:
            return (image, inverter) if return_inverter else image

        labels = np.copy(labels)
        labels[:, [ymin, ymax]] = np.round(labels[:, [ymin, ymax]] * (self.out_height / img_height))
        labels[:, [xmin, xmax]] = np.round(labels[:, [xmin, xmax]] * (self.out_width / img_width))
        if self.box_filter is not None:
            self.box_filter.labels_format = self.labels_format
            labels = self.box_filter(labels, image_height=self.out_height, image_width=self.out_width)
        return (image, labels, inverter) if return_inverter else (image, labels)


class ResizeRandomInterp:
    """Resize with a randomly chosen OpenCV interpolation mode."""

    DEFAULT_MODES = (
        cv2.INTER_NEAREST,
        cv2.INTER_LINEAR,
        cv2.INTER_CUBIC,
        cv2.INTER_AREA,
        cv2.INTER_LANCZOS4,
    )

    def __init__(self, height, width, interpolation_modes=None, box_filter=None, labels_format=None):
        self.interpolation_modes = list(interpolation_modes or self.DEFAULT_MODES)
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)
        self.resize = Resize(height, width, box_filter=box_filter, labels_format=self.labels_format)

    def __call__(self, image, labels=None, return_inverter=False):
        self.resize.interpolation_mode = np.random.choice(self.interpolation_modes)
        self.resize.labels_format = self.labels_format
        return self.resize(image, labels, return_inverter)


class Flip:
    """Deterministic horizontal or vertical mirror."""

    def __init__(self, dim="horizontal", labels_format=None):
        if dim not in ("horizontal", "vertical"):
            raise ValueError("`dim` must be 'horizontal' or 'vertical'.")
        self.dim = dim
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)

    def __call__(self, image, labels=None, return_inverter=False):
        img_height, img_width = image.shape[:2]
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)
        if self.dim == "horizontal":
            image = image[:, ::-1]
            if labels is None:
                return image
            labels = np.copy(labels)
            labels[:, [xmin, xmax]] = img_width - labels[:, [xmax, xmin]]
        else:
            image = image[::-1]
            if labels is None:
                return image
            labels = np.copy(labels)
            labels[:, [ymin, ymax]] = img_height - labels[:, [ymax, ymin]]
        return image, labels


class RandomFlip:
    def __init__(self, dim="horizontal", prob=0.5, labels_format=None):
        self.dim = dim
        self.prob = prob
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)
        self.flip = Flip(dim=dim, labels_format=self.labels_format)

    def __call__(self, image, labels=None):
        if np.random.uniform(0, 1) >= (1.0 - self.prob):
            self.flip.labels_format = self.labels_format
            return self.flip(image, labels)
        return image if labels is None else (image, labels)


class Translate:
    """Shift an image by (dy, dx) image-size fractions; constant background."""

    def __init__(self, dy, dx, clip_boxes=True, box_filter=None, background=(0, 0, 0), labels_format=None):
        self.dy_rel = dy
        self.dx_rel = dx
        self.clip_boxes = clip_boxes
        self.box_filter = box_filter
        self.background = background
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)

    def __call__(self, image, labels=None):
        img_height, img_width = image.shape[:2]
        dy_abs = int(round(img_height * self.dy_rel))
        dx_abs = int(round(img_width * self.dx_rel))
        M = np.float32([[1, 0, dx_abs], [0, 1, dy_abs]])
        image = cv2.warpAffine(
            image, M=M, dsize=(img_width, img_height),
            borderMode=cv2.BORDER_CONSTANT, borderValue=self.background,
        )
        if labels is None:
            return image
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)
        labels = np.copy(labels)
        labels[:, [xmin, xmax]] += dx_abs
        labels[:, [ymin, ymax]] += dy_abs
        if self.box_filter is not None:
            self.box_filter.labels_format = self.labels_format
            labels = self.box_filter(labels, image_height=img_height, image_width=img_width)
        if self.clip_boxes:
            labels[:, [ymin, ymax]] = np.clip(labels[:, [ymin, ymax]], 0, img_height - 1)
            labels[:, [xmin, xmax]] = np.clip(labels[:, [xmin, xmax]], 0, img_width - 1)
        return image, labels


class _TrialBased:
    """Shared retry-loop driver for RandomTranslate / RandomScale.

    Draws candidate transform parameters up to ``n_trials_max`` times,
    accepting the first whose transformed boxes pass the image validator;
    falls back to the unaltered input.
    """

    def __call__(self, image, labels=None):
        if np.random.uniform(0, 1) < (1.0 - self.prob):
            return image if labels is None else (image, labels)

        img_height, img_width = image.shape[:2]
        if self.image_validator is not None:
            self.image_validator.labels_format = self.labels_format
        self._op.labels_format = self.labels_format

        for _ in range(max(1, self.n_trials_max)):
            self._draw(img_height, img_width)
            if labels is None or self.image_validator is None:
                return self._op(image, labels)
            candidate = self._transform_labels(labels, img_height, img_width)
            if self.image_validator(candidate, image_height=img_height, image_width=img_width):
                return self._op(image, labels)
        return image if labels is None else (image, labels)


class RandomTranslate(_TrialBased):
    def __init__(
        self,
        dy_minmax=(0.03, 0.3),
        dx_minmax=(0.03, 0.3),
        prob=0.5,
        clip_boxes=True,
        box_filter=None,
        image_validator=None,
        n_trials_max=3,
        background=(0, 0, 0),
        labels_format=None,
    ):
        if dy_minmax[0] > dy_minmax[1] or dx_minmax[0] > dx_minmax[1]:
            raise ValueError("min must not exceed max in dy_minmax/dx_minmax.")
        if dy_minmax[0] < 0 or dx_minmax[0] < 0:
            raise ValueError("dy_minmax/dx_minmax must be non-negative.")
        self.dy_minmax = dy_minmax
        self.dx_minmax = dx_minmax
        self.prob = prob
        self.image_validator = image_validator
        self.n_trials_max = n_trials_max
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)
        self._op = Translate(
            dy=0, dx=0, clip_boxes=clip_boxes, box_filter=box_filter,
            background=background, labels_format=self.labels_format,
        )

    def _draw(self, img_height, img_width):
        dy_abs = np.random.uniform(self.dy_minmax[0], self.dy_minmax[1])
        dx_abs = np.random.uniform(self.dx_minmax[0], self.dx_minmax[1])
        self._op.dy_rel = np.random.choice([-dy_abs, dy_abs])
        self._op.dx_rel = np.random.choice([-dx_abs, dx_abs])

    def _transform_labels(self, labels, img_height, img_width):
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)
        out = np.copy(labels)
        out[:, [ymin, ymax]] += int(round(img_height * self._op.dy_rel))
        out[:, [xmin, xmax]] += int(round(img_width * self._op.dx_rel))
        return out


class Scale:
    """Zoom in/out about the image center; box corners follow the affine map."""

    def __init__(self, factor, clip_boxes=True, box_filter=None, background=(0, 0, 0), labels_format=None):
        if factor <= 0:
            raise ValueError("`factor` must be > 0.")
        self.factor = factor
        self.clip_boxes = clip_boxes
        self.box_filter = box_filter
        self.background = background
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)

    def __call__(self, image, labels=None):
        img_height, img_width = image.shape[:2]
        M = cv2.getRotationMatrix2D(
            center=(img_width / 2, img_height / 2), angle=0, scale=self.factor
        )
        image = cv2.warpAffine(
            image, M=M, dsize=(img_width, img_height),
            borderMode=cv2.BORDER_CONSTANT, borderValue=self.background,
        )
        if labels is None:
            return image
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)
        labels = np.copy(labels)
        labels = _affine_corners(labels, M, xmin, ymin, xmax, ymax)
        if self.box_filter is not None:
            self.box_filter.labels_format = self.labels_format
            labels = self.box_filter(labels, image_height=img_height, image_width=img_width)
        if self.clip_boxes:
            labels[:, [ymin, ymax]] = np.clip(labels[:, [ymin, ymax]], 0, img_height - 1)
            labels[:, [xmin, xmax]] = np.clip(labels[:, [xmin, xmax]], 0, img_width - 1)
        return image, labels


def _affine_corners(labels, M, xmin, ymin, xmax, ymax):
    """Map the (xmin,ymin) and (xmax,ymax) corners of each box through M."""
    n = labels.shape[0]
    tl = np.stack([labels[:, xmin], labels[:, ymin], np.ones(n)])
    br = np.stack([labels[:, xmax], labels[:, ymax], np.ones(n)])
    labels[:, [xmin, ymin]] = np.round(M @ tl).T.astype(np.int64)
    labels[:, [xmax, ymax]] = np.round(M @ br).T.astype(np.int64)
    return labels


class RandomScale(_TrialBased):
    def __init__(
        self,
        min_factor=0.5,
        max_factor=1.5,
        prob=0.5,
        clip_boxes=True,
        box_filter=None,
        image_validator=None,
        n_trials_max=3,
        background=(0, 0, 0),
        labels_format=None,
    ):
        if not 0 < min_factor <= max_factor:
            raise ValueError("It must be 0 < min_factor <= max_factor.")
        self.min_factor = min_factor
        self.max_factor = max_factor
        self.prob = prob
        self.image_validator = image_validator
        self.n_trials_max = n_trials_max
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)
        self._op = Scale(
            factor=1.0, clip_boxes=clip_boxes, box_filter=box_filter,
            background=background, labels_format=self.labels_format,
        )
        self._img_hw = None

    def _draw(self, img_height, img_width):
        self._op.factor = np.random.uniform(self.min_factor, self.max_factor)
        self._img_hw = (img_height, img_width)

    def _transform_labels(self, labels, img_height, img_width):
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)
        M = cv2.getRotationMatrix2D(
            center=(img_width / 2, img_height / 2), angle=0, scale=self._op.factor
        )
        return _affine_corners(np.copy(labels), M, xmin, ymin, xmax, ymax)


class Rotate:
    """Rotate counter-clockwise by 90/180/270 degrees (dims swap for 90/270)."""

    def __init__(self, angle, labels_format=None):
        if angle not in (90, 180, 270):
            raise ValueError("`angle` must be one of 90, 180, 270.")
        self.angle = angle
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)

    def __call__(self, image, labels=None):
        img_height, img_width = image.shape[:2]
        M = cv2.getRotationMatrix2D(
            center=(img_width / 2, img_height / 2), angle=self.angle, scale=1
        )
        cos_a, sin_a = np.abs(M[0, 0]), np.abs(M[0, 1])
        new_w = int(img_height * sin_a + img_width * cos_a)
        new_h = int(img_height * cos_a + img_width * sin_a)
        M[1, 2] += (new_h - img_height) / 2
        M[0, 2] += (new_w - img_width) / 2
        image = cv2.warpAffine(image, M=M, dsize=(new_w, new_h))
        if labels is None:
            return image
        xmin, ymin, xmax, ymax = _fmt(self.labels_format)
        labels = _affine_corners(np.copy(labels), M, xmin, ymin, xmax, ymax)
        # The affine map moves corners; restore min<max ordering per axis.
        if self.angle in (90, 180):
            labels[:, [ymax, ymin]] = labels[:, [ymin, ymax]]
        if self.angle in (180, 270):
            labels[:, [xmax, xmin]] = labels[:, [xmin, xmax]]
        return image, labels


class RandomRotate:
    def __init__(self, angles=(90, 180, 270), prob=0.5, labels_format=None):
        for angle in angles:
            if angle not in (90, 180, 270):
                raise ValueError("`angles` may only contain 90, 180, 270.")
        self.angles = list(angles)
        self.prob = prob
        self.labels_format = dict(labels_format or DEFAULT_LABELS_FORMAT)
        self.rotate = Rotate(angle=90, labels_format=self.labels_format)

    def __call__(self, image, labels=None):
        if np.random.uniform(0, 1) >= (1.0 - self.prob):
            self.rotate.angle = _pyrandom.choice(self.angles)
            self.rotate.labels_format = self.labels_format
            return self.rotate(image, labels)
        return image if labels is None else (image, labels)
