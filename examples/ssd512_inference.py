"""Run SSD512 inference on images (workflow parity with ssd512_inference.ipynb).

Usage:
  python examples/ssd512_inference.py --weights trained512.h5 image1.jpg
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


import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ssd_keras_tpu import SSDConfig
from ssd_keras_tpu import weights_io
from ssd_keras_tpu.models import ssd_512

from ssd300_inference import VOC_CLASSES  # same class list


def main():
    p = argparse.ArgumentParser()
    p.add_argument("images", nargs="+")
    p.add_argument("--weights", default=None)
    p.add_argument("--n_classes", type=int, default=20)
    p.add_argument("--dataset", default="voc", choices=["voc", "coco"])
    p.add_argument("--confidence", type=float, default=0.5)
    args = p.parse_args()

    config = SSDConfig.ssd512(n_classes=args.n_classes, dataset=args.dataset)
    model, _ = ssd_512(config, mode="inference", compute_dtype=jnp.bfloat16)

    batch, orig_sizes = [], []
    for path in args.images:
        with Image.open(path) as img:
            img = img.convert("RGB")
            orig_sizes.append(img.size)
            batch.append(np.array(img.resize((512, 512)), dtype=np.float32))
    x = jnp.asarray(np.stack(batch))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    if args.weights:
        params, _, loaded = weights_io.load_keras_h5_weights(
            args.weights, jax.device_get(variables["params"])
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        print(f"loaded {len(loaded)} layers")

    detections = np.asarray(jax.jit(model.apply)(variables, x))
    for i, path in enumerate(args.images):
        w, h = orig_sizes[i]
        sx, sy = w / 512.0, h / 512.0
        print(f"\n{path}:")
        for det in detections[i]:
            class_id, conf = int(det[0]), float(det[1])
            if class_id == 0 or conf < args.confidence:
                continue
            name = VOC_CLASSES[class_id] if class_id < len(VOC_CLASSES) else str(class_id)
            print(f"   {name:<10} {conf:.3f} "
                  f"{det[2]*sx:7.1f} {det[3]*sy:7.1f} {det[4]*sx:7.1f} {det[5]*sy:7.1f}")


if __name__ == "__main__":
    main()
