"""On-device, batched SSD training augmentation (jit + vmap, TPU-first).

The reference's train-time augmentation is a single-threaded host loop of
cv2/NumPy ops (SURVEY.md §3.1 marks it as the throughput bottleneck). This
module re-designs the same *distribution* of augmentations as one XLA program
over the whole batch with per-sample PRNG keys:

* photometric distortions (brightness / contrast / saturation / hue with the
  Caffe-SSD parameters and the two order variants, chosen per sample),
* SSD expand ("zoom out" onto a 1-4x mean-color canvas, prob 0.5),
* SSD random crop (min-IoU bound drawn from {none,.1,.3,.5,.7,.9}, patch
  scale in [0.3,1], aspect ratio in [0.5,2], K candidate draws, first valid
  wins; falls back to the identity like the reference's escape hatch),
* horizontal flip (prob 0.5), and resize to the model input size.

Key TPU trick: expand -> crop -> resize compose into ONE affine resample per
image. The final view is just a rectangle in original-image coordinates
(possibly extending beyond the image), so the entire geometric chain is a
single ``jax.image.scale_and_translate`` call — calibrated to be bit-exact
with ``cv2.resize(img[crop], (W, H), INTER_LINEAR)`` — plus a coverage-mask
blend for the mean-color background. No intermediate canvases, no host
round-trips; composes directly with the on-device target encoder.

Behavioral counterpart of data_augmentation_chain_original_ssd.py (:29
SSDRandomCrop, :103 SSDExpand, :146 SSDPhotometricDistortions, :208
SSDDataAugmentation); equivalence is distributional, not bit-level (mAP is
the arbiter — SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rgb_to_hsv",
    "hsv_to_rgb",
    "photometric_distortions",
    "sample_geometry",
    "apply_geometry",
    "DeviceSSDAugmentation",
]


# --------------------------------------------------------------------------- #
# Color space (cv2 uint8-range semantics: H in [0,180), S,V in [0,255])
# --------------------------------------------------------------------------- #


def rgb_to_hsv(rgb):
    """RGB [0,255] -> HSV with H in [0,180), S,V in [0,255] (cv2 ranges)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c == 0, 1.0, c)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c == 0, 0.0, h) * 30.0  # sextant * 60deg, halved to [0,180)
    h = jnp.where(h < 0, h + 180.0, h)
    s = jnp.where(v == 0, 0.0, c / jnp.where(v == 0, 1.0, v)) * 255.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """Inverse of :func:`rgb_to_hsv` (same cv2-style ranges)."""
    h = hsv[..., 0] / 30.0  # [0, 6)
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------- #
# Photometric distortions
# --------------------------------------------------------------------------- #


def photometric_distortions(
    key,
    image,
    brightness_delta: float = 32.0,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: float = 18.0,
):
    """Per-image Caffe-SSD photometric pipeline (single image; vmap over batch).

    Each distortion fires with probability 0.5; the contrast op runs either
    before or after the HSV round trip (order variant, prob 0.5 each), exactly
    the two sequences of SSDPhotometricDistortions (:160-183).
    """
    keys = jax.random.split(key, 9)

    def maybe(k, x, fn):
        gate = jax.random.uniform(k) >= 0.5
        return jnp.where(gate, fn(x), x)

    def brightness(x):
        return x + jax.random.uniform(
            keys[1], minval=-brightness_delta, maxval=brightness_delta
        )

    def contrast(x):
        f = jax.random.uniform(
            keys[2], minval=contrast_range[0], maxval=contrast_range[1]
        )
        return 127.5 + f * (x - 127.5)

    image = maybe(keys[0], image, brightness)
    image = jnp.clip(image, 0.0, 255.0)

    order_first = jax.random.uniform(keys[3]) >= 0.5  # contrast before HSV?
    image = jnp.where(
        order_first, jnp.clip(maybe(keys[4], image, contrast), 0, 255), image
    )

    hsv = rgb_to_hsv(image)
    sat_gate = jax.random.uniform(keys[5]) >= 0.5
    sat = jax.random.uniform(
        keys[6], minval=saturation_range[0], maxval=saturation_range[1]
    )
    s = jnp.where(sat_gate, jnp.clip(hsv[..., 1] * sat, 0, 255), hsv[..., 1])
    hue_gate = jax.random.uniform(keys[7]) >= 0.5
    delta = jax.random.uniform(keys[8], minval=-hue_delta, maxval=hue_delta)
    h = jnp.where(hue_gate, (hsv[..., 0] + delta) % 180.0, hsv[..., 0])
    image = hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))

    image = jnp.where(
        order_first, image, jnp.clip(maybe(keys[4], image, contrast), 0, 255)
    )
    return jnp.clip(image, 0.0, 255.0)


# --------------------------------------------------------------------------- #
# Geometry: expand + SSD random crop + flip, as one sampled view rectangle
# --------------------------------------------------------------------------- #

_IOU_BOUNDS = np.array([0.0, 0.1, 0.3, 0.5, 0.7, 0.9])


def _patch_gt_iou(patch, boxes):
    """IoU of one patch (4,) with (M, 4) GT boxes, corners format."""
    x1 = jnp.maximum(patch[0], boxes[:, 0])
    y1 = jnp.maximum(patch[1], boxes[:, 1])
    x2 = jnp.minimum(patch[2], boxes[:, 2])
    y2 = jnp.minimum(patch[3], boxes[:, 3])
    inter = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    area_p = (patch[2] - patch[0]) * (patch[3] - patch[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area_p + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def sample_geometry(
    key,
    boxes,  # (M, 4) corners in ORIGINAL image pixels
    n_valid,  # scalar int
    img_height,
    img_width,
    n_candidates: int = 32,
    expand_prob: float = 0.5,
    crop_attempt_prob: float = 0.857,
    max_expand: float = 4.0,
):
    """Draw the final view rectangle (in original-image pixel coords) + flip.

    Mirrors SSDExpand + SSDRandomCrop: first maybe expand (the view rectangle
    grows beyond the image, uniform placement, scale U[1,4]), then maybe crop
    a sub-patch of the expanded view (scale U[0.3,1] of the view per axis, AR
    within [0.5,2], accepted if some GT box clears the sampled min-IoU bound).
    The reference's unbounded retry becomes "K candidates, first valid" —
    with K=32 and a fresh bound per candidate, the acceptance distribution is
    statistically close (candidates whose AR falls outside [0.5,2] are
    rejected exactly like the reference's `continue`).

    Returns ``(rect, flip)`` with rect = (y0, x0, y1, x1) floats.
    """
    k_exp, k_exp_s, k_exp_pos, k_crop = jax.random.split(key, 4)

    # --- Expand: the view grows; image sits at a uniform offset inside. ---
    do_expand = jax.random.uniform(k_exp) >= (1.0 - expand_prob)
    ratio = jax.random.uniform(k_exp_s, minval=1.0, maxval=max_expand)
    exp_h, exp_w = img_height * ratio, img_width * ratio
    off = jax.random.uniform(k_exp_pos, (2,))
    exp_y0 = -off[0] * (exp_h - img_height)
    exp_x0 = -off[1] * (exp_w - img_width)
    view = jnp.where(
        do_expand,
        jnp.stack([exp_y0, exp_x0, exp_y0 + exp_h, exp_x0 + exp_w]),
        jnp.array([0.0, 0.0, float(img_height), float(img_width)]),
    )

    # --- SSD random crop over the expanded view. ---
    view_h = view[2] - view[0]
    view_w = view[3] - view[1]

    keys = jax.random.split(k_crop, n_candidates + 1)
    attempt = jax.random.uniform(keys[0]) >= (1.0 - crop_attempt_prob)

    def candidate(k):
        ks = jax.random.split(k, 4)
        bound_i = jax.random.randint(ks[0], (), 0, len(_IOU_BOUNDS))
        min_iou = jnp.asarray(_IOU_BOUNDS)[bound_i]
        scale_hw = jax.random.uniform(ks[1], (2,), minval=0.3, maxval=1.0)
        ph = scale_hw[0] * view_h
        pw = scale_hw[1] * view_w
        ar_ok = (pw / ph >= 0.5) & (pw / ph <= 2.0)
        pos = jax.random.uniform(ks[2], (2,))
        py0 = view[0] + pos[0] * (view_h - ph)
        px0 = view[1] + pos[1] * (view_w - pw)
        patch = jnp.stack([px0, py0, px0 + pw, py0 + ph])  # corners x1,y1,x2,y2
        ious = _patch_gt_iou(patch, boxes)
        live = jnp.arange(boxes.shape[0]) < n_valid
        any_ok = jnp.any(live & (ious > min_iou))
        valid = ar_ok & any_ok
        rect = jnp.stack([py0, px0, py0 + ph, px0 + pw])
        return valid, rect

    valids, rects = jax.vmap(candidate)(keys[1:])
    first = jnp.argmax(valids)  # index of first True (0 if none)
    found = jnp.any(valids)
    crop_rect = rects[first]
    rect = jnp.where(attempt & found, crop_rect, view)

    flip = jax.random.uniform(jax.random.fold_in(key, 7)) >= 0.5
    return rect, flip


def apply_geometry(
    image,  # (H, W, 3) float RGB, original image
    boxes,  # (M, 4) corners in original pixels
    n_valid,
    rect,  # (4,) y0, x0, y1, x1 view rectangle in original pixels
    flip,  # scalar bool
    out_height: int,
    out_width: int,
    background,  # (3,) mean color
    method: str = "linear",
):
    """Resample the view rectangle to (out_height, out_width); map the boxes.

    Exactly equivalent to canvas-pad + crop + cv2 INTER_LINEAR resize, fused
    into one ``scale_and_translate``; out-of-image area blends to the
    background color through a coverage mask resampled with the same kernel.
    Boxes use the reference's center-point validity criterion and clipping.
    """
    y0, x0, y1, x1 = rect[0], rect[1], rect[2], rect[3]
    sy = out_height / (y1 - y0)
    sx = out_width / (x1 - x0)
    scale = jnp.stack([sy, sx])
    translation = jnp.stack([-y0 * sy, -x0 * sx])

    rgba = jnp.concatenate([image, jnp.ones(image.shape[:2] + (1,), image.dtype)], -1)
    out = jax.image.scale_and_translate(
        rgba, (out_height, out_width, 4), (0, 1), scale, translation,
        method=method, antialias=False,
    )
    coverage = jnp.clip(out[..., 3:4], 0.0, 1.0)
    bg = jnp.asarray(background, dtype=image.dtype)
    out_rgb = out[..., :3] + (1.0 - coverage) * bg
    out_rgb = jnp.where(flip, out_rgb[:, ::-1], out_rgb)
    out_rgb = jnp.clip(out_rgb, 0.0, 255.0)

    # --- Boxes: affine map + center-validity + clip. ---
    bx0 = (boxes[:, 0] - x0) * sx
    by0 = (boxes[:, 1] - y0) * sy
    bx1 = (boxes[:, 2] - x0) * sx
    by1 = (boxes[:, 3] - y0) * sy
    fx0 = jnp.where(flip, out_width - bx1, bx0)
    fx1 = jnp.where(flip, out_width - bx0, bx1)
    cx = (fx0 + fx1) / 2.0
    cy = (by0 + by1) / 2.0
    live = jnp.arange(boxes.shape[0]) < n_valid
    # Reference center_point criterion (validation_utils.py:225-230).
    keep = live & (cx >= 0) & (cx <= out_width - 1) & (cy >= 0) & (cy <= out_height - 1)
    fx0 = jnp.clip(fx0, 0, out_width - 1)
    fx1 = jnp.clip(fx1, 0, out_width - 1)
    by0c = jnp.clip(by0, 0, out_height - 1)
    by1c = jnp.clip(by1, 0, out_height - 1)
    # Degenerate after clipping -> drop (box_filter check_degenerate).
    keep = keep & (fx1 > fx0) & (by1c > by0c)
    new_boxes = jnp.stack([fx0, by0c, fx1, by1c], axis=1)
    return out_rgb, new_boxes, keep


class DeviceSSDAugmentation:
    """Batched on-device counterpart of ``SSDDataAugmentation``.

    ``__call__(key, images, labels, n_valid)`` takes a uint8/float batch of
    equally-sized images with padded ``(B, M, 5)`` labels and returns the
    augmented ``(B, out_h, out_w, 3)`` float images plus transformed padded
    labels/counts, ready for ``SSDInputEncoder.encode_padded`` — the whole
    train-time input pipeline (augment + encode) becomes two fused XLA
    programs with zero host work beyond image decode.

    Pass ``mesh`` to run the chain mesh-sharded on the batch axis: inputs
    are accepted (and outputs emitted) sharded on ``axis_name``, so under
    data parallelism each device augments only its own batch shard — the
    per-sample vmap partitions with zero collectives, and the input pipeline
    no longer serializes on device 0 (VERDICT r3 #2). Results are bit-equal
    to the single-device path: per-sample keys come from one
    ``jax.random.split`` and no op crosses the batch axis.
    """

    def __init__(
        self,
        img_height: int = 300,
        img_width: int = 300,
        background=(123.0, 117.0, 104.0),
        n_candidates: int = 32,
        photometric: bool = True,
        method: str = "linear",
        mesh=None,
        axis_name: str = "data",
    ):
        self.out_h = img_height
        self.out_w = img_width
        self.background = tuple(background)
        self.n_candidates = n_candidates
        self.photometric = photometric
        self.method = method
        self.mesh = mesh
        self.axis_name = axis_name
        self._jitted = {}

    def _build(self, in_shape):
        in_h, in_w = in_shape
        out_h, out_w = self.out_h, self.out_w
        # np (not jnp): _build can be invoked inside another trace (the
        # streaming pipeline's fused program) and a jnp constant created
        # there would be a tracer, leaking into this cached closure.
        bg = np.asarray(self.background, np.float32)
        n_candidates = self.n_candidates
        use_photo = self.photometric
        method = self.method

        def one(key, image, labels, n_valid):
            image = image.astype(jnp.float32)
            k_photo, k_geom = jax.random.split(key)
            if use_photo:
                image = photometric_distortions(k_photo, image)
            boxes = labels[:, 1:5]
            rect, flip = sample_geometry(
                k_geom, boxes, n_valid, in_h, in_w, n_candidates=n_candidates
            )
            out, new_boxes, keep = apply_geometry(
                image, boxes, n_valid, rect, flip, out_h, out_w, bg, method
            )
            # Compact kept boxes to the front so counts stay meaningful.
            order = jnp.argsort(~keep)  # stable: kept rows first
            new_labels = jnp.concatenate(
                [labels[:, :1], new_boxes], axis=1
            )[order]
            new_labels = jnp.where((jnp.sort(~keep))[:, None], 0.0, new_labels)
            return out, new_labels, jnp.sum(keep).astype(jnp.int32)

        def run(key, images, labels, n_valid):
            keys = jax.random.split(key, images.shape[0])
            return jax.vmap(one)(keys, images, labels, n_valid)

        if self.mesh is None:
            return jax.jit(run)
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(self.mesh, P(self.axis_name))
        repl = NamedSharding(self.mesh, P())
        return jax.jit(
            run,
            in_shardings=(repl, data, data, data),
            out_shardings=(data, data, data),
        )

    def __call__(self, key, images, labels, n_valid):
        in_shape = (int(images.shape[1]), int(images.shape[2]))
        if in_shape not in self._jitted:
            self._jitted[in_shape] = self._build(in_shape)
        return self._jitted[in_shape](
            key, jnp.asarray(images), jnp.asarray(labels, jnp.float32),
            jnp.asarray(n_valid, jnp.int32),
        )
