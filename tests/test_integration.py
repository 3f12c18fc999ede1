"""End-to-end integration: train SSD7 to overfit a tiny synthetic dataset and
verify the evaluator reports high mAP — exercises model, encoder, loss,
optimizer, decoder, and evaluator together (the framework's closest analogue
of the reference's notebook-driven smoke validation, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ssd_keras_tpu import SSDConfig, SSDInputEncoder, SSDLoss
from ssd_keras_tpu import train as T
from ssd_keras_tpu.data import DataGenerator
from ssd_keras_tpu.eval import Evaluator
from ssd_keras_tpu.models import ssd_7


def _make_dataset(tmp_path, n_images=8, size=64, seed=0):
    """Bright axis-aligned squares (class 1) and tall rectangles (class 2) on
    dark noise — trivially learnable."""
    rng = np.random.RandomState(seed)
    fns, labels = [], []
    for i in range(n_images):
        img = rng.randint(0, 40, (size, size, 3)).astype(np.uint8)
        boxes = []
        for _ in range(rng.randint(1, 3)):
            cls = rng.randint(1, 3)
            w, h = (24, 24) if cls == 1 else (14, 30)
            x1 = rng.randint(0, size - w)
            y1 = rng.randint(0, size - h)
            color = [230, 60, 60] if cls == 1 else [60, 60, 230]
            img[y1 : y1 + h, x1 : x1 + w] = color
            boxes.append([cls, x1, y1, x1 + w, y1 + h])
        fn = tmp_path / f"im{i}.png"
        Image.fromarray(img).save(fn)
        fns.append(str(fn))
        labels.append(np.array(boxes, dtype=np.float64))
    return fns, labels


@pytest.mark.slow
def test_overfit_tiny_dataset_high_map(tmp_path):
    cfg = SSDConfig.ssd7(n_classes=2, img_height=64, img_width=64)
    model, sizes = ssd_7(cfg)
    encoder = SSDInputEncoder(cfg, sizes, max_gt_boxes=8)

    fns, labels = _make_dataset(tmp_path)
    ds = DataGenerator(
        filenames=fns, labels=labels,
        image_ids=[str(i) for i in range(len(fns))],
        load_images_into_memory=True,
    )
    gen = ds.generate(
        batch_size=8, shuffle=True, transformations=[],
        label_encoder=encoder, returns=["processed_images", "encoded_labels"],
    )

    tx = T.adam(learning_rate=3e-3)
    images, y = next(gen)
    state = T.create_train_state(model, jax.random.PRNGKey(0), images, tx)
    step = T.make_train_step(model, SSDLoss(), l2_reg=0.0, donate=False)

    losses = []
    # Enough steps for the BatchNorm running averages (momentum 0.99) to
    # approach the batch statistics — inference-mode quality depends on them.
    for i in range(500):
        images, y = next(gen)
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(y))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.2, f"loss barely moved: {losses[0]} -> {losses[-1]}"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda x: model.apply(variables, x))
    evaluator = Evaluator(
        model=lambda b: np.asarray(fwd(jnp.asarray(b, jnp.float32))),
        n_classes=2, data_generator=ds, model_mode="training",
    )
    mean_ap = evaluator(
        img_height=64, img_width=64, batch_size=8, verbose=False,
        matching_iou_threshold=0.5,
    )
    assert mean_ap > 0.5, f"overfit mAP only {mean_ap}"
