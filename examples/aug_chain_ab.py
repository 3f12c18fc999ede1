"""A/B: host SSDDataAugmentation vs DeviceSSDAugmentation at the mAP level.

The on-device augmentation chain (data/device_aug.py) replaces the
reference's Caffe-faithful host chain
(/root/reference/data_generator/data_augmentation_chain_original_ssd.py:208-280)
— the one substitution on the accuracy-critical path that SURVEY §7 says must
be arbitrated by mAP, not by distribution tests alone. This script trains
SSD300 on SynthVOC twice from the SAME initialization, optimizer, LR
schedule, and step budget; the ONLY difference between the arms is which
augmentation chain produces the training images/labels:

* arm ``host``:   reference-parity host chain (data/chains.py
                  ``SSDDataAugmentation`` — BoundGenerator/RandomPatchInf/
                  SSDExpand/photometric, cv2 semantics)
* arm ``device``: fused on-device chain (data/device_aug.py)

Target encoding runs on-device via ``encoder.encode_padded`` in BOTH arms,
so augmentation is isolated as the experimental variable. Writes per-arm
mAP curves and ``docs/benchmarks/aug_chain_ab.md`` with the final delta
(acceptance per VERDICT r3 #1: |delta mAP| <= ~0.02).

Usage (real TPU, ~10 min device arm + ~1 h host arm at 8k steps):
  python examples/aug_chain_ab.py --steps 8000
"""

import argparse
import json
import os
import tempfile
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu import SSDConfig, SSDInputEncoder, SSDLoss
from ssd_keras_tpu import train as T
from ssd_keras_tpu.data.chains import SSDDataAugmentation
from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
from ssd_keras_tpu.data.prefetch import prefetch
from ssd_keras_tpu.data.synthvoc import SynthVOC
from ssd_keras_tpu.encoder import pad_labels
from ssd_keras_tpu.eval.evaluator import Evaluator
from ssd_keras_tpu.models import ssd_300, ssd_512

from synthvoc_benchmark import build_optimizer, upload_in_chunks


def train_arm(arm, args, cfg, model, encoder, data, curve_path):
    """Train one arm from a fresh (identical) init; return final state."""
    train_images, train_labels, val_images, val_labels = data
    tx, sched = build_optimizer("ssd300", args.steps, args.peak_lr,
                                args.warmup, args.clipnorm)
    state = T.create_train_state(
        model, jax.random.PRNGKey(args.seed),
        train_images[: args.batch].astype(np.float32), tx,
    )
    train_step = T.make_train_step(model, SSDLoss(), l2_reg=5e-4)
    trainer = T.Trainer(model, state, train_step)

    if os.path.exists(curve_path):
        os.remove(curve_path)

    def fwd(batch_x):
        return model.apply({"params": trainer.state.params},
                           jnp.asarray(batch_x))

    size = args.size
    val_ds = SynthVOC(args.val_images, size, split="val", seed=args.seed)

    def evaluate(mode="sample"):
        ev = Evaluator(fwd, 20, val_ds.as_data_generator(val_images, val_labels),
                       model_mode="training")
        mean_ap, aps = ev(
            img_height=size, img_width=size, batch_size=args.batch,
            average_precision_mode=mode, return_average_precisions=True,
            verbose=False,
        )
        return float(mean_ap), [float(a) for a in aps]

    if arm == "device":
        aug = DeviceSSDAugmentation(size, size)
        images_d = upload_in_chunks(train_images)
        padded, counts = pad_labels(train_labels, encoder.max_gt_boxes,
                                    truncate=True)
        padded_d, counts_d = jnp.asarray(padded), jnp.asarray(counts)
        def batches():
            key = jax.random.PRNGKey(args.seed + 1)
            while True:
                key, k1, k2 = jax.random.split(key, 3)
                idx = jax.random.choice(k1, len(train_images), (args.batch,),
                                        replace=True)
                imgs, lbls, nn = aug(k2, images_d[idx], padded_d[idx],
                                     counts_d[idx])
                yield imgs, encoder.encode_padded(lbls, nn)

        batch_iter = batches()
    else:
        train_ds = SynthVOC(args.train_images, size, split="train",
                            seed=args.seed)
        gen = train_ds.as_data_generator(train_images, train_labels).generate(
            batch_size=args.batch,
            shuffle=True,
            transformations=[SSDDataAugmentation(size, size)],
            label_encoder=None,
            returns=["processed_images", "processed_labels"],
            keep_images_without_gt=True,
        )

        def host_batches():
            for imgs, lbls in gen:
                # uint8 upload (the augmented image is float32 in [0,255];
                # rounding is the same quantization every decoded JPEG has)
                u8 = np.clip(np.rint(np.asarray(imgs)), 0, 255).astype(np.uint8)
                padded, counts = pad_labels(list(lbls), encoder.max_gt_boxes,
                                            truncate=True)
                yield u8, padded, counts

        host_iter = prefetch(host_batches(), buffer_size=4)

        def batches():
            for u8, padded, counts in host_iter:
                y = encoder.encode_padded(jnp.asarray(padded),
                                          jnp.asarray(counts))
                yield jnp.asarray(u8).astype(jnp.float32), y

        batch_iter = batches()

    t_train = time.time()
    metrics = {}
    for step in range(args.steps):
        imgs, y_true = next(batch_iter)
        trainer.state, metrics = train_step(trainer.state, imgs, y_true)
        if step % 200 == 0:
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                print(f"[{arm}] step {step}: non-finite loss, aborting",
                      flush=True)
                sys.exit(2)
            rate = 200 * args.batch / max(1e-9, time.time() - t_train)
            t_train = time.time()
            print(f"[{arm}] step {step:6d}  loss {loss:8.3f}  "
                  f"lr {sched(step):.2e}  {rate:.0f} img/s", flush=True)
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            mean_ap, _ = evaluate()
            rec = {"arm": arm, "step": step + 1,
                   "val_mAP_sample": round(mean_ap, 4),
                   "loss": round(float(metrics["loss"]), 3)}
            with open(curve_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print("[EVAL] " + json.dumps(rec), flush=True)

    map_s, aps_s = evaluate("sample")
    map_i, _ = evaluate("integrate")

    if args.save_ckpt:
        # Keep the trained params around (e.g. for
        # examples/evaluator_decode_agreement.py re-runs against a real
        # trained score distribution without a fresh training run).
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(args.save_ckpt),
                            f"{arm}_seed{args.seed}", "ckpt_1")
        ocp.StandardCheckpointer().save(
            path, {"params": jax.device_get(trainer.state.params)})
        print(f"[{arm}] checkpoint saved to {path}", flush=True)

    return {"arm": arm, "final_mAP_sample": map_s, "final_mAP_integrate": map_i,
            "aps_sample": aps_s}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--train-images", type=int, default=4000)
    p.add_argument("--val-images", type=int, default=800)
    p.add_argument("--eval-every", type=int, default=2000)
    p.add_argument("--peak-lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--clipnorm", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", default="ssd300", choices=("ssd300", "ssd512"),
                   help="model family for the A/B (VERDICT r4 #5's optional "
                        "SSD512 leg)")
    p.add_argument("--arms", default="device,host")
    p.add_argument("--save-ckpt", default="",
                   help="directory to save each arm's trained params into "
                        "({arm}_seed{seed}/ckpt_1); empty = don't save")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks"))
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)

    if args.model == "ssd512":
        cfg = SSDConfig.ssd512(n_classes=20)
        model, sizes = ssd_512(cfg, compute_dtype=jnp.bfloat16)
    else:
        cfg = SSDConfig.ssd300(n_classes=20)
        model, sizes = ssd_300(cfg, compute_dtype=jnp.bfloat16)
    args.size = cfg.img_height
    encoder = SSDInputEncoder(cfg, sizes, max_gt_boxes=16)

    print(f"Rendering SynthVOC {args.train_images}/{args.val_images} ...",
          flush=True)
    t0 = time.time()
    train_ds = SynthVOC(args.train_images, args.size, split="train",
                        seed=args.seed)
    val_ds = SynthVOC(args.val_images, args.size, split="val", seed=args.seed)
    train_images, train_labels = train_ds.materialize()
    val_images, val_labels = val_ds.materialize()
    print(f"  rendered in {time.time() - t0:.0f}s", flush=True)
    data = (train_images, train_labels, val_images, val_labels)

    results = []
    for arm in args.arms.split(","):
        curve = os.path.join(args.out, f"aug_chain_ab_{arm}_curve.jsonl")
        t0 = time.time()
        res = train_arm(arm, args, cfg, model, encoder, data, curve)
        res["train_seconds"] = round(time.time() - t0, 1)
        results.append(res)
        print(f"[{arm}] FINAL mAP sample={res['final_mAP_sample']:.4f} "
              f"integrate={res['final_mAP_integrate']:.4f}", flush=True)

    if len(results) == 2:
        by = {r["arm"]: r for r in results}
        delta = (by["device"]["final_mAP_sample"]
                 - by["host"]["final_mAP_sample"])
        md = os.path.join(args.out, "aug_chain_ab.md")
        with open(md, "w") as f:
            f.write("# Augmentation chain A/B: host (reference-parity) vs "
                    f"on-device ({args.model.upper()}, SynthVOC)\n\n")
            f.write(
                "Same init (seed {}), optimizer (SGD m=0.9, L2 5e-4, peak lr "
                "{} with {}-step warmup, x0.1 drops at 2/3 and 5/6), batch "
                "{}, {} steps, bf16; target encoding on-device in both arms. "
                "The only variable is the augmentation chain.\n\n".format(
                    args.seed, args.peak_lr, args.warmup, args.batch,
                    args.steps))
            f.write("| arm | final val mAP (sample) | final val mAP "
                    "(integrate) | train s |\n|---|---|---|---|\n")
            for r in results:
                f.write(f"| {r['arm']} | {r['final_mAP_sample']:.4f} | "
                        f"{r['final_mAP_integrate']:.4f} | "
                        f"{r['train_seconds']} |\n")
            f.write(f"\n**delta mAP (device - host): {delta:+.4f}** "
                    f"(acceptance: |delta| <= 0.02)\n\n")
            f.write("Curves: aug_chain_ab_device_curve.jsonl / "
                    "aug_chain_ab_host_curve.jsonl\n")
        print(f"delta mAP (device - host): {delta:+.4f}  -> {md}", flush=True)


if __name__ == "__main__":
    main()
