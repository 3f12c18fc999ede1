"""Evaluate SSD300 on Pascal VOC (mAP, per-class AP, VOC results files).

Workflow parity with /root/reference/ssd300_evaluation.ipynb.

Usage:
  python examples/ssd300_evaluation.py --voc_root ./VOCdevkit --weights trained.h5
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

from ssd_keras_tpu import SSDConfig
from ssd_keras_tpu import weights_io
from ssd_keras_tpu.data import DataGenerator
from ssd_keras_tpu.eval import Evaluator
from ssd_keras_tpu.models import ssd_300

VOC_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voc_root", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--year", default="2007")
    p.add_argument("--split", default="test")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--mode", default="inference", choices=["training", "inference"])
    p.add_argument("--ap_mode", default="sample", choices=["sample", "integrate"])
    p.add_argument("--write_results", default=None, help="prefix for VOC txt files")
    args = p.parse_args()

    config = SSDConfig.ssd300(n_classes=20)
    model, _ = ssd_300(config, mode=args.mode, compute_dtype=jnp.bfloat16)

    base = os.path.join(args.voc_root, f"VOC{args.year}")
    dataset = DataGenerator(load_images_into_memory=False)
    dataset.parse_xml(
        [os.path.join(base, "JPEGImages")],
        [os.path.join(base, "ImageSets", "Main", f"{args.split}.txt")],
        [os.path.join(base, "Annotations")],
        classes=VOC_CLASSES,
    )
    print(f"eval images: {dataset.get_dataset_size()}")

    sample = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    if args.weights:
        params, _, loaded = weights_io.load_keras_h5_weights(
            args.weights, jax.device_get(variables["params"])
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        print(f"loaded {len(loaded)} layers")

    predict = jax.jit(model.apply)

    evaluator = Evaluator(
        # Upload uint8 (4x less host->device transfer; the model casts
        # internally) and hand the device array straight to the evaluator,
        # which decodes on device before anything crosses back to the host.
        model=lambda batch: predict(variables, jnp.asarray(np.asarray(batch, np.uint8))),
        n_classes=20,
        data_generator=dataset,
        model_mode=args.mode,
    )
    mean_ap, average_precisions = evaluator(
        img_height=300,
        img_width=300,
        batch_size=args.batch_size,
        average_precision_mode=args.ap_mode,
        return_average_precisions=True,
    )
    for i in range(1, 21):
        print(f"{VOC_CLASSES[i]:<16} AP {average_precisions[i]:.4f}")
    print(f"{'mAP':<16} {mean_ap:.4f}")

    if args.write_results:
        evaluator.write_predictions_to_txt(
            classes=VOC_CLASSES, out_file_prefix=args.write_results
        )


if __name__ == "__main__":
    main()
