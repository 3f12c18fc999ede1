"""Measure the space-to-depth conv1_1 trunk for SSD300/512 (on vs off).

VERDICT r3 #3: SSD300's conv1_1 (3x3, cin=3 at 300x300) has the same
3-of-128-lane MXU underfill the SSD7 trunk fixed with its space-to-depth
conv1; this script measures what the transform is actually worth at 300/512
scale — trunk-only (training-mode forward) and end-to-end inference
(forward + in-graph decode), batch 8 and 32, with the two-point in-jit
calibration so the tunnel's launch cost cancels (utils/profiling.
time_in_jit). Writes docs/benchmarks/s2d_trunk.md with the committed
verdict either way.

Usage: python examples/s2d_trunk_bench.py
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu import SSDConfig
from ssd_keras_tpu.models import ssd_300, ssd_512
from ssd_keras_tpu.utils.profiling import time_in_jit


def measure(builder, cfg, batch, mode, s2d):
    model, _ = builder(cfg, mode=mode, compute_dtype=jnp.bfloat16,
                       s2d_trunk=s2d)
    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, cfg.img_height, cfg.img_width, 3).astype(np.float32) * 255)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    return time_in_jit(lambda b: model.apply(v, b), x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks",
        "s2d_trunk.md"))
    p.add_argument("--reps", type=int, nargs=2, default=None)
    args = p.parse_args()

    rows = []
    for name, builder, cfg, batches in (
        ("ssd300", ssd_300, SSDConfig.ssd300(), (8, 32)),
        ("ssd512", ssd_512, SSDConfig.ssd512(), (8,)),
    ):
        for batch in batches:
            for mode in ("training", "inference"):
                ms = {}
                for s2d in (False, True):
                    ms[s2d] = measure(builder, cfg, batch, mode, s2d)
                label = "trunk" if mode == "training" else "e2e"
                row = {
                    "model": name, "batch": batch, "stage": label,
                    "plain_ms": round(ms[False], 3),
                    "s2d_ms": round(ms[True], 3),
                    "saved_ms": round(ms[False] - ms[True], 3),
                    "s2d_img_per_s": round(batch / ms[True] * 1000, 1),
                    "plain_img_per_s": round(batch / ms[False] * 1000, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Space-to-depth conv1_1: measured on/off (on-device "
                "chained, launch-calibrated)\n\n")
        f.write(
            "`s2d_trunk` rewrites conv1_1 (3x3, cin=3 — 27 of 128 MXU "
            "contraction lanes at full resolution) as its exact "
            "space-to-depth form (108 lanes on a 4x smaller grid, one "
            "depth_to_space before the already-dense conv1_2). Default-on; "
            "`ssd_300(..., s2d_trunk=False)` restores the plain graph. "
            "trunk = training-mode forward; e2e = inference forward + "
            "in-graph decode. Methodology: utils/profiling.time_in_jit "
            "(docs/benchmarks/profile.md).\n\n"
        )
        f.write("| model | batch | stage | plain ms | s2d ms | saved ms | "
                "plain img/s | s2d img/s |\n|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['model']} | {r['batch']} | {r['stage']} | "
                    f"{r['plain_ms']} | {r['s2d_ms']} | {r['saved_ms']} | "
                    f"{r['plain_img_per_s']} | {r['s2d_img_per_s']} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
