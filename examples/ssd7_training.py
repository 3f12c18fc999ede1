"""Train SSD7 from scratch on a CSV-annotated dataset (e.g. Udacity traffic).

Workflow parity with /root/reference/ssd7_training.ipynb: SSD7 at 300x480,
Adam 1e-3, constant-input-size augmentation chain, batch 16, EarlyStopping +
ReduceLROnPlateau + checkpoints + CSV logging.

Usage:
  python examples/ssd7_training.py \
      --images_dir ./udacity_driving_datasets \
      --train_labels ./udacity_driving_datasets/labels_train.csv \
      --val_labels ./udacity_driving_datasets/labels_val.csv \
      --epochs 20 --steps_per_epoch 1000
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

from ssd_keras_tpu import SSDConfig, SSDInputEncoder, SSDLoss
from ssd_keras_tpu import train as T
from ssd_keras_tpu.data import DataGenerator
from ssd_keras_tpu.data.chains import DataAugmentationConstantInputSize
from ssd_keras_tpu.models import ssd_7


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True)
    p.add_argument("--train_labels", required=True)
    p.add_argument("--val_labels", default=None)
    p.add_argument("--img_height", type=int, default=300)
    p.add_argument("--img_width", type=int, default=480)
    p.add_argument("--n_classes", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--checkpoint_dir", default="./checkpoints_ssd7")
    p.add_argument("--csv_log", default="./ssd7_training_log.csv")
    args = p.parse_args()

    config = SSDConfig.ssd7(
        n_classes=args.n_classes, img_height=args.img_height, img_width=args.img_width
    )
    model, predictor_sizes = ssd_7(config, mode="training")
    encoder = SSDInputEncoder(config, predictor_sizes)

    input_format = ["image_name", "xmin", "xmax", "ymin", "ymax", "class_id"]
    train_ds = DataGenerator(load_images_into_memory=False)
    train_ds.parse_csv(args.images_dir, args.train_labels, input_format)
    print(f"train images: {train_ds.get_dataset_size()}")

    augmentation = DataAugmentationConstantInputSize(
        random_brightness=(-48, 48, 0.5),
        random_contrast=(0.5, 1.8, 0.5),
        random_saturation=(0.5, 1.8, 0.5),
        random_hue=(18, 0.5),
        random_flip=0.5,
        random_translate=((0.03, 0.5), (0.03, 0.5), 0.5),
        random_scale=(0.5, 2.0, 0.5),
    )
    train_gen = train_ds.generate(
        batch_size=args.batch_size,
        shuffle=True,
        transformations=[augmentation],
        label_encoder=encoder,
        returns=["processed_images", "encoded_labels"],
    )

    val_gen, validation_steps = None, 0
    if args.val_labels:
        val_ds = DataGenerator(load_images_into_memory=False)
        val_ds.parse_csv(args.images_dir, args.val_labels, input_format)
        val_gen = val_ds.generate(
            batch_size=args.batch_size,
            shuffle=False,
            transformations=[],
            label_encoder=encoder,
            returns=["processed_images", "encoded_labels"],
        )
        validation_steps = max(1, val_ds.get_dataset_size() // args.batch_size)

    sample, y0 = next(train_gen)
    tx = T.adam(learning_rate=args.learning_rate)
    state = T.create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    train_step = T.make_train_step(model, SSDLoss(), l2_reg=0.0)
    eval_step = T.make_eval_step(model, SSDLoss())
    trainer = T.Trainer(model, state, train_step, eval_step, base_lr=args.learning_rate)

    callbacks = [
        T.ModelCheckpoint(args.checkpoint_dir, monitor="val_loss" if val_gen else "loss"),
        T.CSVLogger(args.csv_log),
        T.EarlyStopping(monitor="val_loss" if val_gen else "loss", patience=10),
        T.ReduceLROnPlateau(monitor="val_loss" if val_gen else "loss",
                            factor=0.2, patience=8),
        T.TerminateOnNaN(),
    ]
    history = trainer.fit_generator(
        train_gen,
        steps_per_epoch=args.steps_per_epoch,
        epochs=args.epochs,
        callbacks=callbacks,
        val_generator=val_gen,
        validation_steps=validation_steps,
    )
    print("final loss:", history["loss"][-1])
    if trainer.terminated_on_nan:
        raise SystemExit("training diverged (non-finite loss); exiting non-zero")


if __name__ == "__main__":
    main()
