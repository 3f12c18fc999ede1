"""Measure cross-class candidate compaction on COCO-scale (81-class) decode.

The per-class top-k over all 8732 boxes dominates COCO-scale decode
(docs/benchmarks/profile.md: `stage_per_class_topk_ms`). Compaction selects
the top-M boxes by max-over-classes score once, then runs the per-class
top-k over M << N (decoder.py:_decode_caffe_batched). This script sweeps M
on the real chip and records the end-to-end (forward + in-graph decode)
throughput; results in docs/benchmarks/coco_decode.md.

    python examples/coco_decode_bench.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from ssd_keras_tpu import SSDConfig
from ssd_keras_tpu.decoder import decode_detections_fixed
from ssd_keras_tpu.models import ssd_300
from ssd_keras_tpu.utils.profiling import benchmark_fps


def main():
    rows = []
    for n_classes, tag in ((80, "coco81"), (20, "voc21")):
        cfg = SSDConfig.ssd300(n_classes=n_classes,
                               dataset="coco" if n_classes == 80 else "voc")
        model, _ = ssd_300(cfg, mode="training", compute_dtype=jnp.bfloat16)
        x8 = jnp.asarray(np.random.rand(8, 300, 300, 3).astype(np.float32) * 255)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x8[:1])

        for m in (0, 512, 1024, 2048, "auto"):
            def e2e(b, m=m):
                y = model.apply(v, b)
                return decode_detections_fixed(
                    y, img_height=300, img_width=300, compact_pool=m)

            r = benchmark_fps(e2e, x8, n_iters=25, n_repeats=3)
            rows.append({"model": tag, "compact_pool": m,
                         "ms_per_batch": round(r["ms_per_batch"], 3),
                         "img_per_s": round(r["fps"], 1)})
            print(rows[-1], flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
