"""bf16-vs-f32 numerics bound at SSD300 scale (VERDICT r2 weak #7).

The committed SynthVOC curves train SSD300 in bfloat16; the bf16-vs-f32
bound tests previously existed only at SSD7 scale. This script trains two
short SSD300 segments from the *same* init on the *same* batch sequence —
one with bfloat16 compute, one float32 — and commits the paired loss
trajectories, final validation mAPs, and step rates, so a future bf16
numerics regression shows up as a diverging pair instead of a mysteriously
lower final mAP.

Usage: python examples/bf16_vs_f32_ssd300.py --steps 2000
Writes docs/benchmarks/bf16_vs_f32_ssd300.md
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssd_keras_tpu import SSDConfig, SSDInputEncoder, SSDLoss
from ssd_keras_tpu import train as T
from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
from ssd_keras_tpu.data.synthvoc import SynthVOC
from ssd_keras_tpu.encoder import pad_labels
from ssd_keras_tpu.eval.evaluator import Evaluator
from ssd_keras_tpu.models import ssd_300


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--train-images", type=int, default=2000)
    p.add_argument("--val-images", type=int, default=320)
    p.add_argument("--peak-lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks",
        "bf16_vs_f32_ssd300.md"))
    args = p.parse_args()

    n_classes = 20
    cfg = SSDConfig.ssd300(n_classes=n_classes)

    print(f"Rendering SynthVOC: {args.train_images} train / "
          f"{args.val_images} val ...", flush=True)
    train_ds = SynthVOC(args.train_images, 300, split="train", seed=args.seed)
    val_ds = SynthVOC(args.val_images, 300, split="val", seed=args.seed)
    train_images, train_labels = train_ds.materialize()
    val_images, val_labels = val_ds.materialize()

    sizes = None
    encoder = None
    aug = DeviceSSDAugmentation(300, 300)

    padded, counts = None, None

    images_d = jnp.concatenate(
        [jnp.asarray(train_images[i:i + 256]) for i in
         range(0, len(train_images), 256)], axis=0,
    ) if len(train_images) > 256 else jnp.asarray(train_images)

    runs = {}
    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model, sizes = ssd_300(cfg, compute_dtype=dtype)
        if encoder is None:
            encoder = SSDInputEncoder(cfg, sizes, max_gt_boxes=16)
            padded_np, counts_np = pad_labels(
                train_labels, encoder.max_gt_boxes, truncate=True)
            padded = jnp.asarray(padded_np)
            counts = jnp.asarray(counts_np)

        sched = optax.join_schedules(
            [optax.linear_schedule(args.peak_lr * 0.01, args.peak_lr,
                                   args.warmup),
             optax.constant_schedule(args.peak_lr)],
            boundaries=[args.warmup],
        )
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.sgd(learning_rate=sched, momentum=0.9))
        # Identical init across dtypes: params are float32 in both cases
        # (compute_dtype only affects activation/compute precision).
        state = T.create_train_state(
            model, jax.random.PRNGKey(args.seed),
            train_images[: args.batch].astype(np.float32), tx,
        )
        train_step = T.make_train_step(model, SSDLoss(), l2_reg=5e-4)

        key = jax.random.PRNGKey(args.seed + 1)  # same batch/aug sequence
        losses = []
        t0 = time.time()
        timed_from = min(50, args.steps - 1)  # exclude jit compiles
        for step in range(args.steps):
            if step == timed_from:
                t0 = time.time()
            key, k1, k2 = jax.random.split(key, 3)
            idx = jax.random.choice(k1, args.train_images, (args.batch,),
                                    replace=True)
            imgs, lbls, nn = aug(k2, images_d[idx], padded[idx], counts[idx])
            y_true = encoder.encode_padded(lbls, nn)
            state, metrics = train_step(state, imgs, y_true)
            if step % 100 == 0 or step + 1 == args.steps:
                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    print(f"[{dtype_name}] step {step}: non-finite loss",
                          flush=True)
                    sys.exit(2)
                losses.append({"step": step, "loss": round(loss, 4)})
                print(f"[{dtype_name}] step {step:5d} loss {loss:8.3f}",
                      flush=True)
        seconds = time.time() - t0

        def fwd(batch_x, model=model, state=state):
            return model.apply({"params": state.params},
                               jnp.asarray(np.asarray(batch_x, np.uint8)))

        val_gen = val_ds.as_data_generator(val_images, val_labels)
        ev = Evaluator(fwd, n_classes, val_gen, model_mode="training")
        mean_ap = float(ev(img_height=300, img_width=300,
                           batch_size=args.batch, verbose=False))
        timed_steps = args.steps - timed_from
        runs[dtype_name] = {
            "losses": losses,
            "final_loss": losses[-1]["loss"],
            "val_mAP_sample": round(mean_ap, 4),
            "train_seconds": round(seconds, 1),
            "img_per_s": round(timed_steps * args.batch / seconds, 1),
        }
        print(f"[{dtype_name}] mAP {mean_ap:.4f}  "
              f"{runs[dtype_name]['img_per_s']} img/s", flush=True)

    b, f = runs["bf16"], runs["f32"]
    paired = [
        (lb["step"], lb["loss"], lf["loss"], round(lb["loss"] - lf["loss"], 4))
        for lb, lf in zip(b["losses"], f["losses"])
    ]
    record = {
        "steps": args.steps,
        "batch": args.batch,
        "final_loss_bf16": b["final_loss"],
        "final_loss_f32": f["final_loss"],
        "final_loss_delta": round(b["final_loss"] - f["final_loss"], 4),
        "max_abs_loss_delta": max(abs(d[3]) for d in paired),
        "val_mAP_bf16": b["val_mAP_sample"],
        "val_mAP_f32": f["val_mAP_sample"],
        "val_mAP_delta": round(b["val_mAP_sample"] - f["val_mAP_sample"], 4),
        "img_per_s_bf16": b["img_per_s"],
        "img_per_s_f32": f["img_per_s"],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("# bf16 vs f32 at SSD300 scale (SynthVOC segment)\n\n")
        fh.write(
            "Two training segments from the same init on the same batch "
            "sequence; only the compute dtype differs (params stay float32 "
            "in both). Bounds the bf16 numerics the committed SynthVOC "
            "curves rely on.\n\n")
        fh.write("```json\n" + json.dumps(record, indent=2) + "\n```\n\n")
        fh.write("| step | loss bf16 | loss f32 | delta |\n|---|---|---|---|\n")
        for s, lb, lf, d in paired:
            fh.write(f"| {s} | {lb} | {lf} | {d} |\n")
        fh.write("\n")
    print("RESULT " + json.dumps(record))


if __name__ == "__main__":
    main()
