"""Evaluator decode-path agreement at scale (VERDICT r1 #8).

Runs the mAP evaluator twice over a crowded SynthVOC split — once with the
default on-device fixed-shape decoder (``device_decode=True``) and once with
the host reference-parity decoder — using a trained SSD300 checkpoint, and
reports both mAPs, their per-class max AP delta, and evaluator throughput.
Crowded scenes (up to 12 objects/image) at decoding conf 0.01 are exactly
the regime where the device decoder's static NMS candidate pool could
diverge from the host's NMS-over-all-candidates, so agreement here is the
evidence that the fast default is mAP-neutral beyond toy scale.

Usage (after examples/synthvoc_benchmark.py has written a checkpoint):
  python examples/evaluator_decode_agreement.py --ckpt /tmp/synthvoc_ckpt \
      --images 300 --out docs/benchmarks/evaluator_decode_agreement.md
"""

import argparse
import json
import os
import tempfile
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persist compiled executables across runs (first XLA/Mosaic compile of a
# full model is slow, especially through a remote-compile tunnel).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu import SSDConfig
from ssd_keras_tpu.data.synthvoc import SynthVOC
from ssd_keras_tpu.eval.evaluator import Evaluator
from ssd_keras_tpu.models import ssd_300


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/synthvoc_ckpt")
    p.add_argument("--images", type=int, default=300)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--compact", type=int, default=0,
                   help="cross-class compaction pool for the device decode "
                        "(decoder.py compact_pool); 0 = off (the r4-pinned "
                        "configuration)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks",
        "evaluator_decode_agreement.md"))
    args = p.parse_args()

    n_classes = 20
    cfg = SSDConfig.ssd300(n_classes=n_classes)
    model, _ = ssd_300(cfg, compute_dtype=jnp.bfloat16)

    # Latest checkpoint from the SynthVOC benchmark run.
    ckpts = sorted((d for d in os.listdir(args.ckpt) if d.startswith("ckpt_")),
                   key=lambda d: int(d.split("_")[1]))
    if not ckpts:
        sys.exit(f"no checkpoints in {args.ckpt}")
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(args.ckpt), ckpts[-1])
    )
    params = restored["params"]
    print(f"restored {ckpts[-1]}")

    fwd = jax.jit(lambda x: model.apply({"params": params}, x))

    # Crowded held-out split: up to 12 objects/image, heavier overlap.
    ds = SynthVOC(args.images, 300, split="test", seed=0, max_objects=12,
                  max_overlap=0.5)
    images, labels = ds.materialize(verbose=True)
    gen = ds.as_data_generator(images, labels)

    # Warm both compiled paths (forward + fixed decode) so the timed passes
    # measure steady-state throughput, not jit compilation.
    from ssd_keras_tpu.decoder import decode_detections_fixed

    warm = jnp.asarray(images[: args.batch].astype(np.uint8))
    y_warm = fwd(warm)
    # Must match the evaluator's decode args exactly (border 'include' is
    # its default) or the timed pass pays the jit compile.
    jax.device_get(
        decode_detections_fixed(y_warm, img_height=300, img_width=300,
                                border_pixels="include",
                                compact_pool=args.compact)
    )

    # Upload uint8: SynthVOC pixels are integral and the resize here is the
    # identity, so casting is lossless and cuts H2D bytes 4x — through the
    # tunnel the upload is the shared throughput floor for BOTH paths.
    def run_model(x):
        return fwd(jnp.asarray(np.asarray(x).astype(np.uint8)))

    # Empirical compaction-exactness regime: per image, how many boxes have
    # ANY non-background class above the 0.01 threshold. Compaction with
    # pool M is bit-exact whenever this count <= M
    # (decoder._decode_caffe_batched).
    elig = jax.jit(lambda y: ((y[..., 1:-12].max(-1) > 0.01).sum(-1)))
    counts = []
    for i in range(0, min(len(images), 128), args.batch):
        b = jnp.asarray(images[i:i + args.batch].astype(np.uint8))
        counts.append(np.asarray(elig(fwd(b))))
    counts = np.concatenate(counts)
    eligible_stats = {
        "eligible_boxes_mean": round(float(counts.mean()), 1),
        "eligible_boxes_p99": round(float(np.percentile(counts, 99)), 1),
        "eligible_boxes_max": int(counts.max()),
    }
    print("eligible-box stats:", eligible_stats, flush=True)

    results = {}
    for device_decode in (True, False):
        ev = Evaluator(run_model, n_classes, gen, model_mode="training")
        # Pass 1 warms every compiled program in the loop (forward at the
        # evaluator's exact shapes/dtypes + the fixed decode); pass 2 is the
        # steady-state measurement.
        ev.predict_on_dataset(
            img_height=300, img_width=300, batch_size=args.batch,
            device_decode=device_decode, verbose=False,
            decoding_compact_pool=args.compact,
        )
        t0 = time.time()
        ev.predict_on_dataset(
            img_height=300, img_width=300, batch_size=args.batch,
            device_decode=device_decode, verbose=True,
            decoding_compact_pool=args.compact,
        )
        predict_seconds = time.time() - t0
        ev.get_num_gt_per_class(ignore_neutral_boxes=True, verbose=False)
        ev.match_predictions(ignore_neutral_boxes=True,
                             matching_iou_threshold=0.5, verbose=False)
        ev.compute_precision_recall()
        ev.compute_average_precisions(mode="sample")
        mean_ap = ev.compute_mean_average_precision()
        results[device_decode] = {
            "mAP": float(mean_ap),
            "aps": [float(a) for a in ev.average_precisions],
            "seconds": predict_seconds,
            "img_per_s": args.images / predict_seconds,
        }
        print(f"device_decode={device_decode}: mAP {mean_ap:.4f} "
              f"({predict_seconds:.1f}s, "
              f"{args.images / predict_seconds:.1f} img/s)")

    dev, host = results[True], results[False]
    delta = abs(dev["mAP"] - host["mAP"])
    per_class = np.abs(np.asarray(dev["aps"]) - np.asarray(host["aps"]))[1:]
    record = {
        "images": args.images,
        "compact_pool": args.compact,
        **eligible_stats,
        "mAP_device_decode": round(dev["mAP"], 4),
        "mAP_host_decode": round(host["mAP"], 4),
        "abs_delta": round(delta, 5),
        "max_per_class_ap_delta": round(float(per_class.max()), 5),
        "device_img_per_s": round(dev["img_per_s"], 1),
        "host_img_per_s": round(host["img_per_s"], 1),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Evaluator decode-path agreement (crowded SynthVOC)\n\n")
        f.write("Device fixed-shape decode vs host reference-parity decode, "
                "trained SSD300, crowded scenes (<=12 objs/img, overlap 0.5), "
                "decoding conf 0.01 / NMS 0.45 / top_k 200.\n\n")
        f.write("```json\n" + json.dumps(record, indent=2) + "\n```\n")
    print("RESULT " + json.dumps(record))
    ok = delta < 0.005 and per_class.max() < 0.02
    print("AGREEMENT OK" if ok else "AGREEMENT DIVERGED — inspect")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
