"""Execute every reference workflow end-to-end against a SynthVOC export.

The reference's seven notebooks are mirrored by the scripts in examples/;
this driver proves they *run* (VERDICT r1 §2.26: "workflow parity is
asserted, not demonstrated") by exporting a SynthVOC dataset in genuine
Pascal-VOC / MS-COCO / CSV layouts — with VOC class names, so the unmodified
VOC workflow scripts consume it — and driving each script as a subprocess:

1. ssd300_training.py    (host augmentation chain, callbacks, checkpoints)
2. .h5 export of the trained checkpoint (weights_io, Keras layout)
3. ssd300_evaluation.py  (XML parser, evaluator, VOC results txt)
4. ssd300_evaluation_coco.py (JSON parser, COCO results bridge)
5. weight_sampling.py    (classifier-head sub-sampling -> 3-class model)
6. ssd300_inference.py   (detection printout; ssd512_inference.py shares
                          the identical code path at 512x512)
7. ssd7_training.py      (CSV parser, constant-size chain, SSD7 recipe)

Writes a status table to docs/benchmarks/workflows_run.md.

Usage:
  python examples/run_workflows_synthvoc.py --scale quick   # tiny, CPU-able
  python examples/run_workflows_synthvoc.py --scale full    # TPU
"""

import argparse
import json
import os
import tempfile
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persist compiled executables across runs (first XLA/Mosaic compile of a
# full model is slow, especially through a remote-compile tunnel).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "ssd_keras_tpu_jaxcache"),
)

import numpy as np

VOC_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

EXAMPLES = os.path.dirname(os.path.abspath(__file__))


def checkpoint_epoch(name):
    """Numeric epoch from a 'ckpt_{epoch}' directory name (so ckpt_10
    outranks ckpt_9 — lexicographic sort would pick the stale one)."""
    try:
        return int(name.rsplit("_", 1)[-1])
    except ValueError:
        return -1


def check_eval_map(floor):
    """Full-scale floor: the printed VOC mAP must clear ``floor`` — a
    broken model (bad weights, bad decode, bad data) scores ~0 here."""
    import re

    def check(full):
        m = re.search(r"^mAP\s+([0-9.]+)", full, re.M)
        if not m:
            return "no mAP line in output"
        if float(m.group(1)) < floor:
            return f"mAP {m.group(1)} below floor {floor}"
        return None

    return check


def check_coco_ap(floor):
    """Full-scale floor on the executed COCO metric (vendored or real)."""
    import re

    def check(full):
        m = re.search(r"COCO AP=([0-9.]+)", full)
        if m is None:
            # pycocotools path prints the standard summary block instead.
            m = re.search(r"Average Precision.*IoU=0.50:0.95.*area=\s*all.*"
                          r"=\s*([0-9.-]+)", full)
        if not m:
            return "no COCO AP in output"
        if float(m.group(1)) < floor:
            return f"COCO AP {m.group(1)} below floor {floor}"
        return None

    return check


def check_inference_boxes(frame_w=300, frame_h=300, margin=30):
    """Full-scale sanity: printed detections must exist, be finite, be
    non-degenerate, and lie in the image frame (the quick-scale record once
    showed 'ok' boxes at coordinate -206926032.0)."""
    import re

    def check(full):
        rows = re.findall(
            r"^\s{3}\S+\s+[0-9.]+\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)"
            r"\s+(-?[\d.]+)\s*$", full, re.M)
        if not rows:
            return "no detections printed"
        for row in rows:
            try:
                x0, y0, x1, y1 = (float(v) for v in row)
            except ValueError:
                return f"non-numeric box row: {row}"
            if not all(np.isfinite([x0, y0, x1, y1])):
                return f"non-finite box: {row}"
            if x0 >= x1 or y0 >= y1:
                return f"degenerate box: {row}"
            if (min(x0, y0) < -margin or x1 > frame_w + margin
                    or y1 > frame_h + margin):
                return f"box outside frame: {row}"
        return None

    return check


def check_training_loss_decreased(csv_path, factor=0.8):
    """Full-scale floor: the CSV log's last-epoch loss must be below
    ``factor`` x its first-epoch loss."""

    def check(full):
        import csv

        if not os.path.exists(csv_path):
            return f"no CSV log at {csv_path}"
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        if not rows:
            return "empty CSV log"
        try:
            first, last = float(rows[0]["loss"]), float(rows[-1]["loss"])
        except (KeyError, TypeError, ValueError) as e:
            return f"unparseable CSV log ({type(e).__name__}: {e})"
        if not (np.isfinite(first) and np.isfinite(last)):
            return f"non-finite loss in CSV log ({first}, {last})"
        if last > first * factor:
            return f"loss did not decrease: {first:.3f} -> {last:.3f}"
        return None

    return check


def run(name, cmd, results, timeout=1800, check=None):
    print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable] + cmd, capture_output=True, text=True,
            timeout=timeout, cwd=os.path.dirname(EXAMPLES),
        )
        tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-12:])
        # Training scripts exit non-zero on TerminateOnNaN; the substring
        # check over the FULL output is a backstop for any path that still
        # exits 0 after printing a non-finite loss.
        full = proc.stdout + proc.stderr
        ok = proc.returncode == 0 and "loss=nan" not in full and "loss=inf" not in full
        if ok and check is not None:
            # Output floors (full scale): rc==0 alone cannot catch a model
            # that runs but produces garbage.
            err = check(full)
            if err:
                ok = False
                tail += f"\nFLOOR CHECK FAILED: {err}"
                print(f"FLOOR CHECK FAILED: {err}", flush=True)
    except subprocess.TimeoutExpired:
        # A hung workflow must not discard the report for the ones that ran.
        tail = f"timed out after {timeout}s"
        ok = False
    dt = time.time() - t0
    results.append({"workflow": name, "ok": ok, "seconds": round(dt, 1),
                    "tail": tail})
    print(tail, flush=True)
    print(f"=== {name}: {'OK' if ok else 'FAILED'} ({dt:.0f}s)", flush=True)
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["quick", "full"], default="quick")
    p.add_argument("--root", default="/tmp/synthvoc_workflows")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(EXAMPLES), "docs", "benchmarks", "workflows_run.md"))
    p.add_argument("--ssd512_weights", default=None,
                   help="trained SSD512 .h5 (e.g. exported from the "
                        "synthvoc_benchmark.py --model ssd512 run); enables "
                        "trained-model box floors on the ssd512_inference row")
    args = p.parse_args()

    quick = args.scale == "quick"
    # Full scale is sized so a *working* model clears the output floors with
    # margin: 2x4000 steps batch 32 with LR warmup reaches ~0.6 val mAP from
    # random init (docs/benchmarks/synthvoc_ssd300_curve.jsonl: 0.27 at 4000
    # steps, 0.64 at 8000) while a broken one fails them. 4000 steps proved
    # too tight for the stricter floors: the 0.27-mAP model cleared the VOC
    # line but scored 0.03 COCO AP(0.50:0.95) and printed nothing at
    # confidence 0.25.
    n_train, n_train12, n_val = (24, 8, 16) if quick else (1200, 400, 320)
    steps, epochs, batch = (6, 1, 4) if quick else (4000, 2, 32)

    from ssd_keras_tpu.data.synthvoc import SynthVOC

    root = args.root
    voc_root = os.path.join(root, "VOCdevkit")
    os.makedirs(root, exist_ok=True)

    print(f"Exporting SynthVOC ({args.scale}) to {root} ...", flush=True)
    tr07 = SynthVOC(n_train, 300, split="train", seed=0)
    im07, lb07 = tr07.materialize()
    tr07.export_voc(os.path.join(voc_root, "VOC2007"), im07, lb07,
                    image_set="trainval", class_names=VOC_CLASSES)
    tr12 = SynthVOC(n_train12, 300, split="train", seed=7)
    tr12.export_voc(os.path.join(voc_root, "VOC2012"), *tr12.materialize(),
                    image_set="trainval", class_names=VOC_CLASSES)
    val = SynthVOC(n_val, 300, split="val", seed=0)
    val_imgs, val_labels = val.materialize()
    val.export_voc(os.path.join(voc_root, "VOC2007"), val_imgs, val_labels,
                   image_set="test", class_names=VOC_CLASSES)
    val.export_coco(os.path.join(root, "coco"), val_imgs, val_labels)

    # CSV labels for the SSD7 workflow (reference format: Udacity-style).
    img_dir07 = os.path.join(voc_root, "VOC2007", "JPEGImages")
    csv_path = os.path.join(root, "ssd7_labels.csv")
    with open(csv_path, "w") as f:
        f.write("frame,xmin,xmax,ymin,ymax,class_id\n")
        for i, lab in enumerate(lb07):
            for cls, x0, y0, x1, y1 in np.asarray(lab):
                f.write(f"train_{i:06d}.jpg,{int(x0)},{int(x1)},"
                        f"{int(y0)},{int(y1)},{int(cls)}\n")

    results = []
    h5_path = os.path.join(root, "ssd300_trained.h5")
    ckpt_dir = os.path.join(root, "ckpt300")

    # A re-run against an existing --root must not inherit per-run outputs:
    # a stale checkpoint would mask a failed training in the h5 export, and
    # a stale CSV log would poison the loss-decrease floor check.
    import shutil

    for stale in (ckpt_dir, os.path.join(root, "ckpt7")):
        shutil.rmtree(stale, ignore_errors=True)
    for stale in (h5_path, os.path.join(root, "ssd300_log.csv"),
                  os.path.join(root, "ssd7_log.csv")):
        if os.path.exists(stale):
            os.remove(stale)

    # 1. SSD300 training workflow (host chain + callbacks + checkpointing).
    # From random init the canonical lr 1e-3 diverges (the reference starts
    # from pretrained VGG), so the workflow check trains at the stable
    # from-scratch recipe: lr 1e-4 + gradient clipping.
    train_cmd = [
        os.path.join(EXAMPLES, "ssd300_training.py"),
        "--voc_root", voc_root, "--epochs", str(epochs),
        "--steps_per_epoch", str(steps), "--batch_size", str(batch),
        "--clipnorm", "5",
        "--checkpoint_dir", ckpt_dir,
        "--csv_log", os.path.join(root, "ssd300_log.csv"),
    ]
    if quick:
        train_cmd += ["--base_lr", "1e-4"]
    else:
        # The benchmark recipe: warmup to the canonical peak + the fused
        # device augmentation pipeline (the host chain is certified by the
        # quick-scale run and the unit suite).
        train_cmd += ["--base_lr", "1e-3", "--warmup", "1000",
                      "--device_pipeline"]
    run("ssd300_training", train_cmd, results, timeout=5400,
        check=None if quick else check_training_loss_decreased(
            os.path.join(root, "ssd300_log.csv")))

    # 2. Export the trained checkpoint as a Keras-layout .h5.
    def export_h5():
        import jax
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from ssd_keras_tpu import SSDConfig, weights_io
        from ssd_keras_tpu.models import ssd_300

        ckpts = (
            sorted(os.listdir(ckpt_dir), key=checkpoint_epoch)
            if os.path.isdir(ckpt_dir) else []
        )
        config = SSDConfig.ssd300(n_classes=20)
        model, _ = ssd_300(config, mode="training")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3), jnp.float32))
        params = jax.device_get(variables["params"])
        if ckpts:
            # Template-free restore: the checkpoint carries the full train
            # state (params + opt_state + step); only params are exported.
            restored = ocp.StandardCheckpointer().restore(
                os.path.join(ckpt_dir, ckpts[-1])
            )
            params = restored["params"]
            src = ckpts[-1]
        else:
            src = "random init (no checkpoint found)"
        weights_io.save_keras_h5_weights(h5_path, params)
        return f"exported {h5_path} from {src}"

    t0 = time.time()
    try:
        msg = export_h5()
        results.append({"workflow": "h5_export", "ok": True,
                        "seconds": round(time.time() - t0, 1), "tail": msg})
        print(msg, flush=True)
    except Exception as e:  # noqa: BLE001 - record and continue
        results.append({"workflow": "h5_export", "ok": False,
                        "seconds": round(time.time() - t0, 1),
                        "tail": f"{type(e).__name__}: {e}"})
        print("h5 export FAILED:", e, flush=True)

    # 3. VOC evaluation workflow (mAP + VOC results txt files).
    run("ssd300_evaluation", [
        os.path.join(EXAMPLES, "ssd300_evaluation.py"),
        "--voc_root", voc_root, "--weights", h5_path,
        "--mode", "training" if quick else "inference",
        "--batch_size", str(batch),
        "--write_results", os.path.join(root, "voc_results_"),
    ], results, check=None if quick else check_eval_map(0.2))

    # 4. COCO evaluation workflow (results JSON via the category-map bridge).
    run("ssd300_evaluation_coco", [
        os.path.join(EXAMPLES, "ssd300_evaluation_coco.py"),
        "--images_dir", os.path.join(root, "coco", "images"),
        "--annotations", os.path.join(root, "coco", "annotations.json"),
        "--weights", h5_path, "--n_classes", "20",
        "--batch_size", str(batch),
        "--out_file", os.path.join(root, "coco_results.json"),
    ], results, check=None if quick else check_coco_ap(0.08))

    # 5. Weight-sampling workflow: 21 -> 4 class heads, then load-check.
    sampled = os.path.join(root, "ssd300_3classes.h5")
    ok = run("weight_sampling", [
        os.path.join(EXAMPLES, "weight_sampling.py"),
        "--source", h5_path, "--dest", sampled,
        "--classes_of_interest", "0", "7", "15", "2",
        "--n_classes_source", "21",
    ], results)
    if ok:
        t0 = time.time()
        try:
            import jax
            import jax.numpy as jnp

            from ssd_keras_tpu import SSDConfig, weights_io
            from ssd_keras_tpu.models import ssd_300

            config3 = SSDConfig.ssd300(n_classes=3)
            model3, _ = ssd_300(config3, mode="training")
            v3 = jax.jit(model3.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3), jnp.float32))
            _, _, loaded = weights_io.load_keras_h5_weights(
                sampled, jax.device_get(v3["params"]))
            msg = f"sampled weights load into n_classes=3 SSD300: {len(loaded)} layers"
            results.append({"workflow": "sampled_weights_load", "ok": True,
                            "seconds": round(time.time() - t0, 1), "tail": msg})
            print(msg, flush=True)
        except Exception as e:  # noqa: BLE001
            results.append({"workflow": "sampled_weights_load", "ok": False,
                            "seconds": round(time.time() - t0, 1),
                            "tail": f"{type(e).__name__}: {e}"})

    # 6. Inference workflows.
    sample_imgs = sorted(
        os.path.join(img_dir07, f) for f in os.listdir(img_dir07)
    )[:2]
    run("ssd300_inference", [
        os.path.join(EXAMPLES, "ssd300_inference.py"), *sample_imgs,
        "--weights", h5_path, "--confidence", "0.25",
    ], results, check=None if quick else check_inference_boxes())
    if not quick:
        # The reference's ssd512_inference notebook runs TRAINED weights
        # (downloaded VOC port). The in-environment analogue is the SynthVOC
        # SSD512 benchmark training (synthvoc_benchmark.py --model ssd512,
        # 0.81 val mAP — docs/benchmarks/synthvoc_ssd512_summary.md); pass
        # its exported .h5 via --ssd512_weights to get the same
        # trained-model box floors as the SSD300 row. Without it the row
        # degrades to a random-init smoke of the 512 graph + decode path,
        # whose unclipped boxes are meaningless (and are labeled so).
        cmd512 = [os.path.join(EXAMPLES, "ssd512_inference.py"),
                  sample_imgs[0], "--n_classes", "20"]
        if args.ssd512_weights:
            # The SSD512 benchmark model trains on 512x512 SynthVOC renders;
            # feeding it the 300x300 renders the SSD300 rows use would test
            # it out of distribution (upscaled textures collapse its
            # confidences). Render its own native-resolution val images.
            from PIL import Image

            from ssd_keras_tpu.data.synthvoc import SynthVOC

            ds512 = SynthVOC(2, 512, split="val", seed=0)
            imgs512 = []
            for i in range(2):
                img, _ = ds512.render(i)
                path = os.path.join(root, f"ssd512_val_{i}.jpg")
                Image.fromarray(img).save(path, quality=95)
                imgs512.append(path)
            cmd512 = [os.path.join(EXAMPLES, "ssd512_inference.py"),
                      *imgs512, "--n_classes", "20",
                      "--weights", args.ssd512_weights,
                      "--confidence", "0.25"]
            run("ssd512_inference", cmd512, results,
                check=check_inference_boxes(frame_w=512, frame_h=512))
        else:
            cmd512 += ["--confidence", "0.99"]
            run("ssd512_inference (random-init smoke)", cmd512, results)

    # 7. SSD7 training workflow (CSV parser + constant-size chain). This one
    # deliberately exercises the HOST augmentation chain end-to-end, so at
    # full scale it gets a step count the streamed host pipeline can sustain
    # through this environment's host->device link (the chain itself is
    # scale-invariant — quick vs full only changes how far the loss moves,
    # which the floor below checks).
    steps7 = steps if quick else 250
    run("ssd7_training", [
        os.path.join(EXAMPLES, "ssd7_training.py"),
        "--images_dir", img_dir07, "--train_labels", csv_path,
        "--img_height", "300", "--img_width", "300", "--n_classes", "20",
        "--epochs", str(epochs), "--steps_per_epoch", str(steps7),
        "--batch_size", str(min(batch, 8)),
        "--checkpoint_dir", os.path.join(root, "ckpt7"),
        "--csv_log", os.path.join(root, "ssd7_log.csv"),
    ], results, check=None if quick else check_training_loss_decreased(
        os.path.join(root, "ssd7_log.csv")))

    # Report.
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    n_ok = sum(r["ok"] for r in results)
    with open(args.out, "w") as f:
        f.write("# Workflow execution record (SynthVOC)\n\n")
        f.write(f"- scale: `{args.scale}` (train {n_train}+{n_train12} / "
                f"val {n_val} images, {epochs}x{steps} steps batch {batch})\n")
        cmd = f"python examples/run_workflows_synthvoc.py --scale {args.scale}"
        if args.ssd512_weights:
            cmd += (f" --ssd512_weights {args.ssd512_weights}"
                    "  # SynthVOC-trained SSD512 export"
                    " (examples/synthvoc_benchmark.py --model ssd512"
                    " + examples/export_h5.py)")
        f.write(f"- command: `{cmd}`\n")
        f.write(f"- result: **{n_ok}/{len(results)} workflows passed**\n\n")
        f.write("| workflow | status | seconds |\n|---|---|---|\n")
        for r in results:
            f.write(f"| {r['workflow']} | "
                    f"{'ok' if r['ok'] else 'FAILED'} | {r['seconds']} |\n")
        f.write("\n## Output tails\n")
        for r in results:
            f.write(f"\n### {r['workflow']}\n\n```\n{r['tail']}\n```\n")
    print(f"\n{n_ok}/{len(results)} workflows passed -> {args.out}", flush=True)
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
