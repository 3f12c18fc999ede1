"""Extended benchmark suite: all model families, modes, and pipeline stages.

Prints a human-readable table (one JSON line per row to stderr-safe stdout is
NOT required here — the driver uses bench.py). Run on the real chip:

    python bench_all.py [--quick]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssd_keras_tpu import SSDConfig, SSDInputEncoder, SSDLoss
    from ssd_keras_tpu import train as T
    from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
    from ssd_keras_tpu.models import ssd_300, ssd_512, ssd300_predictor_sizes
    from ssd_keras_tpu.utils.profiling import benchmark_fps

    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    n_iters = 10 if args.quick else 25

    rows = []

    def add(name, ms, fps, baseline=None):
        rows.append((name, ms, fps, baseline))
        speedup = f"  ({fps / baseline:.1f}x baseline)" if baseline else ""
        print(f"{name:<48} {ms:8.2f} ms {fps:9.0f} img/s{speedup}", flush=True)

    # --- Inference ---
    for builder, cfg, name, base in (
        (ssd_300, SSDConfig.ssd300(), "ssd300", {1: 39.0, 8: 49.0}),
        (ssd_512, SSDConfig.ssd512(), "ssd512", {1: 20.0, 8: 25.0}),
    ):
        for mode in ("inference", "inference_fast"):
            model, _ = builder(cfg, mode=mode, compute_dtype=jnp.bfloat16)
            for batch in (1, 8):
                x = jnp.asarray(
                    np.random.rand(batch, cfg.img_height, cfg.img_width, 3)
                    .astype(np.float32) * 255
                )
                v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
                r = benchmark_fps(lambda b: model.apply(v, b), x,
                                  n_iters=n_iters, n_repeats=3)
                add(f"{name} {mode} batch {batch}", r["ms_per_batch"], r["fps"],
                    base.get(batch) if mode == "inference" else None)

    # --- Training step (SSD300, canonical batch 32) ---
    cfg = SSDConfig.ssd300()
    model, sizes = ssd_300(cfg, compute_dtype=jnp.bfloat16)
    B = 32
    x = jnp.asarray(np.random.rand(B, 300, 300, 3).astype(np.float32) * 255)
    N, C = cfg.total_boxes(sizes), cfg.n_classes_with_background
    y = np.zeros((B, N, C + 12), np.float32)
    y[:, :, 0] = 1
    for b in range(B):
        y[b, 37 * b % N, 0] = 0
        y[b, 37 * b % N, 1 + b % 20] = 1
    y = jnp.asarray(y)
    state = T.create_train_state(model, jax.random.PRNGKey(0), x[:1],
                                 T.sgd_with_momentum(1e-3))
    step = T.make_train_step(model, SSDLoss(), l2_reg=5e-4)
    state, m = step(state, x, y)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, x, y)
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    add(f"ssd300 train step batch {B}", dt * 1000, B / dt)

    # --- Input pipeline (device augment + encode) ---
    enc = SSDInputEncoder(cfg, ssd300_predictor_sizes(300, 300), max_gt_boxes=32)
    aug = DeviceSSDAugmentation(300, 300)
    images = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (B, 300, 300, 3)).astype(np.uint8)
    )
    labels = np.zeros((B, 32, 5), np.float32)
    labels[:, 0] = [1, 40, 50, 140, 180]
    labels[:, 1] = [2, 150, 30, 280, 200]
    lbl, nv = jnp.asarray(labels), jnp.full((B,), 2, jnp.int32)

    def pipe(i, s):
        imgs, nl, nn = aug(jax.random.fold_in(jax.random.PRNGKey(1), i),
                           images, lbl, nv)
        return jnp.sum(enc.encode_padded(nl, nn)) * 0 + s * 0

    jax.device_get(pipe(0, jnp.float32(0)))
    s = jnp.float32(0)
    t0 = time.perf_counter()
    for i in range(n_iters):
        s = pipe(i, s)
    jax.device_get(s)
    dt = (time.perf_counter() - t0) / n_iters
    add(f"device augment+encode batch {B}", dt * 1000, B / dt)

    print(json.dumps([
        {"name": n, "ms_per_batch": round(ms, 3), "throughput": round(f, 1)}
        for n, ms, f, _ in rows
    ]))


if __name__ == "__main__":
    main()
