"""Hardware smoke: overfit SSD300 on synthetic data with the on-device pipeline.

No real datasets ship with this environment, so this script validates the
flagship configuration end-to-end on actual hardware: synthetic colored
shapes -> DeviceSSDAugmentation -> on-device encoding -> bf16 SSD300 training
steps -> in-graph decode -> Evaluator mAP. A healthy run overfits to a high
mAP within a few hundred steps.

Usage:  python examples/synthetic_smoke_ssd300.py [--steps 400] [--images 16]
"""

import argparse
import os
import tempfile
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persist compiled executables across runs (first XLA/Mosaic compile of a
# full model is slow, especially through a remote-compile tunnel).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu import SSDConfig, SSDInputEncoder, SSDLoss
from ssd_keras_tpu import train as T
from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
from ssd_keras_tpu.decoder import decode_detections
from ssd_keras_tpu.encoder import pad_labels
from ssd_keras_tpu.models import ssd_300
from ssd_keras_tpu.ops import boxes as box_ops


def make_dataset(n_images, rng, size=300):
    images, labels = [], []
    for _ in range(n_images):
        img = rng.randint(0, 50, (size, size, 3)).astype(np.uint8)
        boxes = []
        for _ in range(rng.randint(1, 4)):
            cls = rng.randint(1, 4)
            w, h = [(90, 90), (60, 140), (150, 70)][cls - 1]
            x1 = rng.randint(0, size - w)
            y1 = rng.randint(0, size - h)
            color = [(240, 60, 60), (60, 240, 60), (60, 60, 240)][cls - 1]
            img[y1 : y1 + h, x1 : x1 + w] = color
            boxes.append([cls, x1, y1, x1 + w, y1 + h])
        images.append(img)
        labels.append(np.array(boxes, dtype=np.float32))
    return np.stack(images), labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clipnorm", type=float, default=5.0)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    config = SSDConfig.ssd300(n_classes=3)
    model, sizes = ssd_300(config, compute_dtype=jnp.bfloat16)
    encoder = SSDInputEncoder(config, sizes, max_gt_boxes=16)
    aug = DeviceSSDAugmentation(300, 300)

    images, labels = make_dataset(args.images, rng)
    padded, counts = pad_labels(labels, encoder.max_gt_boxes)
    images_d = jnp.asarray(images)
    padded_d = jnp.asarray(padded)
    counts_d = jnp.asarray(counts)

    tx = T.sgd_with_momentum(learning_rate=args.lr, momentum=0.9, clipnorm=args.clipnorm)
    state = T.create_train_state(
        model, jax.random.PRNGKey(0), images[: args.batch].astype(np.float32), tx
    )
    train_step = T.make_train_step(model, SSDLoss(), l2_reg=5e-4)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first = last = None
    for step in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.choice(k1, args.images, (args.batch,), replace=True)
        imgs, lbls, nn = aug(k2, images_d[idx], padded_d[idx], counts_d[idx])
        y_true = encoder.encode_padded(lbls, nn)
        state, metrics = train_step(state, imgs, y_true)
        if step % 50 == 0 or step == args.steps - 1:
            loss = float(metrics["loss"])
            first = loss if first is None else first
            last = loss
            print(f"step {step:4d}  loss {loss:8.4f}  ({time.time() - t0:.0f}s)")

    # Evaluate on the clean (non-augmented) images.
    variables = {"params": state.params}
    fwd = jax.jit(lambda x: model.apply(variables, x))
    y_pred = np.asarray(fwd(jnp.asarray(images, jnp.float32)))
    detections = decode_detections(
        y_pred, confidence_thresh=0.5, img_height=300, img_width=300
    )
    tp = total = 0
    for dets, gt in zip(detections, labels):
        total += len(gt)
        claimed = np.zeros(len(gt), bool)
        for det in dets:
            ious = box_ops.iou(gt[:, 1:], det[2:6], coords="corners",
                               mode="element-wise")
            best = int(np.argmax(ious))
            if (ious[best] >= 0.5 and gt[best, 0] == det[0] and not claimed[best]):
                claimed[best] = True
                tp += 1
    recall = tp / max(1, total)
    print(f"loss {first:.2f} -> {last:.2f}; recall@0.5 on train set: {recall:.2f} "
          f"({tp}/{total})")
    if last < first * 0.5 and recall > 0.6:
        print("SMOKE PASS")
    else:
        print("SMOKE WEAK — inspect")


if __name__ == "__main__":
    main()
