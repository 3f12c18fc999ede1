"""Serving-trunk experiment: preprocessing fold, XLA flag sweep, roofline.

VERDICT r4 weak #6 / next-step #6: batch-8 serving is trunk-bound (~33% MFU)
with no committed experiment saying whether that is fixable or the roofline.
This script commits the three measurements that settle it:

1. **Preprocessing cost bound**: the in-graph BGR-swap + mean-sub
   (models/layers.preprocess_input, mirroring keras_ssd300.py:247-272) timed
   directly — trunk with preprocessing vs trunk with it disabled, and the
   `fold_preprocessing` (optimize.py) variant that folds the swap into
   conv1_1's kernel. The op is one elementwise pass over the 300x300x3
   input (~4 MB/batch-8): the prediction is tens of microseconds.

2. **Per-block roofline**: each VGG stage timed in isolation (same
   shapes/dtypes as the trunk; fresh params — XLA picks the same conv
   kernels) with analytic FLOPs, so each block's achieved TFLOP/s can be
   read against the chip's bf16 peak and its HBM-bound alternative. Shows
   WHERE the 6 ms lives and which blocks are already at their own light
   speed.

3. **XLA flag sweep** (run with --flags): dispatched + chained batch-8 e2e
   under candidate XLA_FLAGS, each in a fresh subprocess.

Writes docs/benchmarks/serving_trunk.md.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak
HBM_GBPS = 819.0


def measure_blocks(batch=8):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from ssd_keras_tpu.utils.profiling import time_in_jit

    dt = jnp.bfloat16

    # SSD300 trunk stages: (n_convs, channels, input hw, input cin, pooled?)
    stages = [
        ("conv1_x+pool", 2, 64, 300, 3, True),
        ("conv2_x+pool", 2, 128, 150, 64, True),
        ("conv3_x+pool", 3, 256, 75, 128, True),
        ("conv4_x+pool", 3, 512, 38, 256, True),
        ("conv5_x+pool(s1)", 3, 512, 19, 512, False),
        ("fc6(dil6)+fc7", 2, 1024, 19, 512, False),
    ]

    rows = []
    for name, n_convs, ch, hw, cin, pooled in stages:
        class Block(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(n_convs):
                    if name.startswith("fc6") and i == 0:
                        x = nn.Conv(ch, (3, 3), padding="SAME",
                                    kernel_dilation=(6, 6), dtype=dt)(x)
                    elif name.startswith("fc6"):
                        x = nn.Conv(ch, (1, 1), padding="SAME", dtype=dt)(x)
                    else:
                        x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt)(x)
                    x = nn.relu(x)
                if pooled:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
                return x

        m = Block()
        x = jnp.asarray(
            np.random.RandomState(0).rand(batch, hw, hw, cin), dt)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        ms = time_in_jit(lambda b: m.apply(v, b), x)

        flops = 0
        c_in = cin
        for i in range(n_convs):
            k = 1 if (name.startswith("fc6") and i > 0) else 3
            flops += 2 * batch * hw * hw * c_in * ch * k * k
            c_in = ch
        tflops = flops / (ms / 1e3) / 1e12
        # HBM-bound floor: activations in + out + weights once.
        act_bytes = batch * hw * hw * (cin + n_convs * ch) * 2
        w_bytes = sum(
            (1 if (name.startswith("fc6") and i > 0) else 9)
            * (cin if i == 0 else ch) * ch * 2
            for i in range(n_convs))
        hbm_floor_ms = (act_bytes + w_bytes) / (HBM_GBPS * 1e9) * 1e3
        mxu_floor_ms = flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3
        rows.append({
            "stage": name, "ms": round(ms, 3),
            "gflops": round(flops / 1e9, 1),
            "achieved_tflops": round(tflops, 1),
            "pct_of_peak": round(100 * tflops / PEAK_BF16_TFLOPS, 1),
            "mxu_floor_ms": round(mxu_floor_ms, 3),
            "hbm_floor_ms": round(hbm_floor_ms, 3),
            "floor_ms": round(max(mxu_floor_ms, hbm_floor_ms), 3),
        })
        print(rows[-1], flush=True)
    return rows


def measure_preprocessing(batch=8):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssd_keras_tpu import SSDConfig, fold_preprocessing
    from ssd_keras_tpu.models import ssd_300
    from ssd_keras_tpu.utils.profiling import time_in_jit

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, 300, 300, 3).astype(np.float32)
        * 255)
    out = {}

    cfg = SSDConfig.ssd300()
    model, _ = ssd_300(cfg, mode="training", compute_dtype=jnp.bfloat16)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    out["trunk_with_preprocessing_ms"] = round(
        time_in_jit(lambda b: model.apply(v, b), x), 3)

    cfg_off = dataclasses.replace(
        cfg, subtract_mean=None, divide_by_stddev=None, swap_channels=None)
    model_off, _ = ssd_300(cfg_off, mode="training",
                           compute_dtype=jnp.bfloat16)
    out["trunk_without_preprocessing_ms"] = round(
        time_in_jit(lambda b: model_off.apply(v, b), x), 3)

    v_fold, cfg_fold = fold_preprocessing(v, cfg)
    model_fold, _ = ssd_300(cfg_fold, mode="training",
                            compute_dtype=jnp.bfloat16)
    out["trunk_swap_folded_ms"] = round(
        time_in_jit(lambda b: model_fold.apply(v_fold, b), x), 3)

    # Exactness of the fold on the real graph (bf16 tolerance).
    y0 = np.asarray(model.apply(v, x[:2]), np.float32)
    y1 = np.asarray(model_fold.apply(v_fold, x[:2]), np.float32)
    out["fold_max_abs_diff"] = float(np.max(np.abs(y0 - y1)))
    out["preprocessing_cost_ms"] = round(
        out["trunk_with_preprocessing_ms"]
        - out["trunk_without_preprocessing_ms"], 3)
    print(out, flush=True)
    return out


FLAG_SETS = {
    "default": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem_64M": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_128M": "--xla_tpu_scoped_vmem_limit_kib=131072",
}


def flag_sweep(batch=8):
    """Each flag set in a fresh subprocess (XLA_FLAGS binds at backend init)."""
    prog = (
        "import os,sys,json\n"
        "sys.path.insert(0, %r)\n"
        "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache_flags')\n"
        "import jax, jax.numpy as jnp, numpy as np\n"
        "from ssd_keras_tpu import SSDConfig\n"
        "from ssd_keras_tpu.models import ssd_300\n"
        "from ssd_keras_tpu.utils.profiling import benchmark_fps, time_in_jit\n"
        "m,_ = ssd_300(SSDConfig.ssd300(), mode='inference', compute_dtype=jnp.bfloat16)\n"
        "x = jnp.asarray(np.random.RandomState(0).rand(%d,300,300,3).astype(np.float32)*255)\n"
        "v = jax.jit(m.init)(jax.random.PRNGKey(0), x[:1])\n"
        "r = benchmark_fps(lambda b: m.apply(v, b), x, n_iters=25, n_repeats=3)\n"
        "ms = time_in_jit(lambda b: m.apply(v, b), x)\n"
        "print('FLAGRESULT ' + json.dumps({'dispatched_img_per_s': round(r['fps'],1), "
        "'chained_ms': round(ms,3), 'chained_img_per_s': round(%d/ms*1000,1)}))\n"
    ) % (os.path.join(os.path.dirname(__file__), ".."), batch, batch)

    results = {}
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # Flag sets change compiled code: keep their cache separate.
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache_flags_" + name
        t0 = time.time()
        p = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                           text=True, env=env, timeout=3000)
        line = [l for l in p.stdout.splitlines() if l.startswith("FLAGRESULT")]
        if p.returncode != 0 or not line:
            results[name] = {"error": (p.stderr or p.stdout)[-400:]}
        else:
            results[name] = json.loads(line[0][len("FLAGRESULT "):])
            results[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, results[name], flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--flags", action="store_true",
                   help="also run the XLA flag sweep (slow: fresh compiles)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks",
        "serving_trunk.md"))
    args = p.parse_args()

    pre = measure_preprocessing()
    blocks = measure_blocks()
    flags = flag_sweep() if args.flags else None

    total_floor = sum(r["floor_ms"] for r in blocks)
    total_ms = sum(r["ms"] for r in blocks)
    record = {"preprocessing": pre, "blocks": blocks,
              "blocks_total_ms": round(total_ms, 3),
              "blocks_total_floor_ms": round(total_floor, 3)}
    if flags:
        record["flag_sweep"] = flags

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Serving trunk: preprocessing fold, per-block roofline, "
                "XLA flags (SSD300 batch 8, bf16)\n\n")
        f.write(
            "All block timings via the two-point calibrated in-jit loop "
            "(utils/profiling.time_in_jit). `floor_ms` = max(MXU floor at "
            f"{PEAK_BF16_TFLOPS:.0f} TFLOP/s bf16, HBM floor at "
            f"{HBM_GBPS:.0f} GB/s) for that block's FLOPs/bytes — the "
            "block's own light speed on this chip. Blocks are standalone "
            "replicas with the trunk's exact shapes/dtypes (fresh params; "
            "XLA picks the same conv kernels).\n\n")
        f.write("```json\n" + json.dumps(record, indent=1) + "\n```\n")
    print("RESULT " + json.dumps(record))


if __name__ == "__main__":
    main()
