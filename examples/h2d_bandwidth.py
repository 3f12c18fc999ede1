"""Host->device upload ceiling vs SSDPredictor streaming throughput.

Serving from host memory is upload-bound in this environment: the TPU sits
behind a network tunnel whose H2D bandwidth is orders of magnitude below a
directly-attached host's PCIe DMA. This script measures (1) the raw link
bandwidth with pipelined uint8 uploads, (2) the implied serving ceiling for
640x480 uint8 frames (0.92 MB/image), and (3) what SSDPredictor's
double-buffered predict() actually achieves on a stream of such frames —
the honest context for the "(incl. host upload)" BENCH_MATRIX row.

Timing note: block_until_ready is unreliable through the tunnel, so every
measurement ends in a data-dependent device_get.

Usage: python examples/h2d_bandwidth.py [--images 64] [--out docs/benchmarks/h2d_ceiling.md]
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


def measure_h2d(chunk_shape=(8, 480, 640, 3), n_chunks=8, n_repeats=3):
    """Pipelined uint8 uploads; MB/s over the best repeat."""
    rng = np.random.RandomState(0)
    chunks = [rng.randint(0, 255, chunk_shape, np.uint8) for _ in range(n_chunks)]
    nbytes = sum(c.nbytes for c in chunks)
    reduce_fn = jax.jit(lambda a: a.astype(jnp.int32).sum())
    # Warm the reduce program + the allocator.
    jax.device_get(reduce_fn(jax.device_put(chunks[0])))
    best = None
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        sums = [reduce_fn(jax.device_put(c)) for c in chunks]
        total = jax.device_get(jnp.stack(sums).sum())  # forces every upload
        dt = time.perf_counter() - t0
        assert int(total) != 0
        best = dt if best is None else min(best, dt)
    return nbytes / best / 1e6, nbytes / 1e6


def measure_predictor_stream(n_images=64, n_repeats=3):
    from ssd_keras_tpu import SSDConfig
    from ssd_keras_tpu.predictor import SSDPredictor
    from ssd_keras_tpu.models import ssd_300

    cfg = SSDConfig.ssd300(n_classes=20)
    model, _ = ssd_300(cfg, mode="inference", compute_dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3), jnp.float32)
    )
    pred = SSDPredictor(model, variables, batch_size=8)
    imgs = [
        np.random.RandomState(i).randint(0, 255, (480, 640, 3), np.uint8)
        for i in range(n_images)
    ]
    pred(imgs[:8])  # compile
    best = None
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        pred(imgs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return n_images / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "benchmarks",
        "h2d_ceiling.md"))
    args = p.parse_args()

    mbps, mb = measure_h2d()
    per_img_mb = 480 * 640 * 3 / 1e6
    ceiling = mbps / per_img_mb
    achieved = measure_predictor_stream(args.images)

    record = {
        "h2d_mb_per_s": round(mbps, 1),
        "upload_mb_measured": round(mb, 1),
        "mb_per_image_640x480_uint8": round(per_img_mb, 3),
        "serving_ceiling_img_per_s": round(ceiling, 1),
        "predictor_stream_img_per_s": round(achieved, 1),
        "fraction_of_ceiling": round(achieved / ceiling, 3),
        "stream_images": args.images,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Host->device upload ceiling (tunnel-attached TPU)\n\n")
        f.write(
            "Raw pipelined uint8 H2D bandwidth vs what SSDPredictor's "
            "double-buffered predict() achieves on a stream of 640x480 "
            "uint8 frames. Host-input serving cannot exceed "
            "`h2d_mb_per_s / mb_per_image` regardless of device speed; the "
            "device-resident row in BENCH_MATRIX.json shows the same "
            "pipeline without the link (>1000 img/s). On a "
            "directly-attached TPU host the PCIe/DMA upload is negligible "
            "and serving reverts to the device-resident number.\n\n"
        )
        f.write("```json\n" + json.dumps(record, indent=2) + "\n```\n")
    print("RESULT " + json.dumps(record))


if __name__ == "__main__":
    main()
