"""Evaluate SSD300 on MS COCO via the results-JSON bridge + pycocotools.

Workflow parity with /root/reference/ssd300_evaluation_COCO.ipynb. The
pycocotools COCOeval stage only runs if pycocotools is installed; otherwise
the results JSON is still produced.

Usage:
  python examples/ssd300_evaluation_coco.py \
      --images_dir ./val2017 --annotations ./annotations/instances_val2017.json \
      --weights trained_coco.h5
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
from ssd_keras_tpu.eval import get_coco_category_maps, predict_all_to_json
from ssd_keras_tpu.models import ssd_300


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--out_file", default="detections_coco_results.json")
    p.add_argument("--n_classes", type=int, default=80,
                   help="number of foreground classes (80 for MS COCO; match "
                        "the annotations file's category count)")
    args = p.parse_args()

    config = SSDConfig.ssd300(n_classes=args.n_classes, dataset="coco")
    model, _ = ssd_300(config, mode="training", compute_dtype=jnp.bfloat16)

    dataset = DataGenerator(load_images_into_memory=False)
    dataset.parse_json(
        [args.images_dir], [args.annotations], ground_truth_available=False
    )
    _, classes_to_cats, _, _ = get_coco_category_maps(args.annotations)

    sample = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    if args.weights:
        params, _, loaded = weights_io.load_keras_h5_weights(
            args.weights, jax.device_get(variables["params"])
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        print(f"loaded {len(loaded)} layers")
    predict = jax.jit(model.apply)

    predict_all_to_json(
        args.out_file,
        lambda batch: np.asarray(predict(variables, jnp.asarray(batch, jnp.float32))),
        img_height=300,
        img_width=300,
        classes_to_cats=classes_to_cats,
        data_generator=dataset,
        batch_size=args.batch_size,
        model_mode="training",
    )

    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        # Score with the vendored metric so the workflow always ends in an
        # executed evaluation, not just a results file (cocoeval.py mirrors
        # the COCOeval protocol: ssd300_evaluation_COCO.ipynb cells 13-16).
        from ssd_keras_tpu.eval import COCOEvalBBox

        print("pycocotools not installed; scoring with the vendored "
              "COCO bbox metric.")
        ev = COCOEvalBBox(args.annotations, args.out_file)
        metrics = ev.evaluate()
        ev.summarize()
        print(f"COCO AP={metrics['AP']:.4f} AP50={metrics['AP50']:.4f}")
        return

    coco_gt = COCO(args.annotations)
    coco_dt = coco_gt.loadRes(args.out_file)
    coco_eval = COCOeval(coco_gt, coco_dt, "bbox")
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()


if __name__ == "__main__":
    main()
