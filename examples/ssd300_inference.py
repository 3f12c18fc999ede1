"""Run SSD300 inference on images and print (or save) detections.

Workflow parity with /root/reference/ssd300_inference.ipynb: build the
'inference'-mode model (in-graph decode: per-class NMS + top-k), load weights,
predict, report boxes above a display threshold in original image coordinates.

Usage:
  python examples/ssd300_inference.py --weights trained.h5 image1.jpg image2.jpg
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
from ssd_keras_tpu.models import ssd_300

VOC_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("images", nargs="+")
    p.add_argument("--weights", default=None, help=".h5 weights (by-name load)")
    p.add_argument("--orbax", default=None, help="orbax checkpoint directory")
    p.add_argument("--n_classes", type=int, default=20)
    p.add_argument("--confidence", type=float, default=0.5, help="display threshold")
    p.add_argument("--mode", default="inference", choices=["inference", "inference_fast"])
    args = p.parse_args()

    config = SSDConfig.ssd300(n_classes=args.n_classes)
    model, _ = ssd_300(config, mode=args.mode, compute_dtype=jnp.bfloat16)

    # Load + resize inputs; remember original sizes to scale boxes back.
    batch, orig_sizes = [], []
    for path in args.images:
        with Image.open(path) as img:
            img = img.convert("RGB")
            orig_sizes.append(img.size)  # (w, h)
            batch.append(np.array(img.resize((300, 300)), dtype=np.float32))
    x = jnp.asarray(np.stack(batch))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    if args.weights:
        params, _, loaded = weights_io.load_keras_h5_weights(
            args.weights, jax.device_get(variables["params"])
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        print(f"loaded {len(loaded)} layers")
    elif args.orbax:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(args.orbax)
        variables = {"params": restored["params"]}

    detections = np.asarray(jax.jit(model.apply)(variables, x))

    for i, path in enumerate(args.images):
        w, h = orig_sizes[i]
        sx, sy = w / 300.0, h / 300.0
        print(f"\n{path}:")
        print("   class      conf    xmin    ymin    xmax    ymax")
        for det in detections[i]:
            class_id, conf = int(det[0]), float(det[1])
            if class_id == 0 or conf < args.confidence:
                continue
            name = (
                VOC_CLASSES[class_id]
                if class_id < len(VOC_CLASSES)
                else str(class_id)
            )
            print(
                f"   {name:<10} {conf:.3f} "
                f"{det[2] * sx:7.1f} {det[3] * sy:7.1f} "
                f"{det[4] * sx:7.1f} {det[5] * sy:7.1f}"
            )


if __name__ == "__main__":
    main()
