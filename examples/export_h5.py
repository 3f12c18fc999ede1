"""Export an Orbax training checkpoint as a Keras-layout .h5 weight file.

The reference's weight artifacts are Keras ``save_weights`` .h5 files keyed
by layer name (/root/reference/README.md:215-239); this CLI converts any
checkpoint written by ``train.Trainer.save_checkpoint`` (or the workflow
drivers) into that interchange format, so trained models flow into the
inference/evaluation/weight-sampling workflows exactly like the reference's
downloads do.

Usage:
  python examples/export_h5.py --model ssd512 --ckpt /tmp/synthvoc_ckpt \
      --out /tmp/ssd512_trained.h5
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)


def latest_checkpoint(ckpt_dir: str) -> str:
    """Newest 'ckpt_{step}' subdirectory by NUMERIC step (ckpt_10 > ckpt_9)."""
    names = [d for d in os.listdir(ckpt_dir) if d.startswith("ckpt_")]
    if not names:
        raise SystemExit(f"no ckpt_* directories under {ckpt_dir}")
    names.sort(key=lambda d: int(d.split("_")[1]))
    return os.path.join(ckpt_dir, names[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["ssd300", "ssd512", "ssd7"],
                   required=True)
    p.add_argument("--n_classes", type=int, default=20)
    p.add_argument("--img_height", type=int, default=None,
                   help="SSD7 only (SSD300/512 are fixed-size)")
    p.add_argument("--img_width", type=int, default=None)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint directory (a ckpt_{step} dir, or a "
                        "parent containing several — the newest is used)")
    p.add_argument("--out", required=True, help="output .h5 path")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    from ssd_keras_tpu import weights_io

    path = args.ckpt
    if not os.path.basename(path).startswith("ckpt_"):
        path = latest_checkpoint(path)
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    params = restored["params"]

    # The checkpoint's params tree is already keyed by reference layer names
    # (the .h5 contract models/*.py preserve); batch_stats (SSD7's BN
    # moving statistics) ride along so the file round-trips through
    # load_keras_h5_weights into an inference-mode model.
    batch_stats = restored.get("batch_stats") or None
    weights_io.save_keras_h5_weights(args.out, params, batch_stats=batch_stats)
    n = len(params) + (len(batch_stats) if batch_stats else 0)
    print(f"exported {args.out} from {path} ({n} layers)")


if __name__ == "__main__":
    main()
