"""Distributional equivalence: on-device augmentation vs the host chain.

SURVEY.md §7 ("hard parts") requires the bounded on-device crop sampler to be
shown statistically equivalent to the reference's unbounded retry loop, and
the photometric distortions to cover the same ranges. These tests compare
summary statistics of both pipelines over many samples.
"""

import jax
import numpy as np
import pytest

from ssd_keras_tpu.data import device_aug as DA
from ssd_keras_tpu.data.chains import SSDDataAugmentation


def _host_stats(n=300, size=128, seed=0):
    """Run the host chain n times; collect box-survival + image stats."""
    rng = np.random.RandomState(seed)
    np.random.seed(seed)
    chain = SSDDataAugmentation(img_height=64, img_width=64)
    img = rng.randint(0, 256, (size, size, 3), dtype=np.uint8)
    labels = np.array([[1, 30, 30, 80, 90], [2, 60, 20, 120, 70]], dtype=np.float64)
    n_boxes, means = [], []
    for _ in range(n):
        out, lb = chain(img.copy(), labels.copy())
        n_boxes.append(len(lb))
        means.append(out.mean())
    return np.array(n_boxes), np.array(means)


def _device_stats(n=300, size=128, seed=0):
    rng = np.random.RandomState(seed)
    aug = DA.DeviceSSDAugmentation(64, 64, n_candidates=32)
    img = rng.randint(0, 256, (1, size, size, 3)).astype(np.uint8)
    labels = np.zeros((1, 8, 5), np.float32)
    labels[0, 0] = [1, 30, 30, 80, 90]
    labels[0, 1] = [2, 60, 20, 120, 70]
    nv = np.array([2], np.int32)
    n_boxes, means = [], []
    for i in range(n):
        out, lb, nn = aug(jax.random.fold_in(jax.random.PRNGKey(seed), i),
                          img, labels, nv)
        n_boxes.append(int(nn[0]))
        means.append(float(np.asarray(out).mean()))
    return np.array(n_boxes), np.array(means)


@pytest.mark.slow
def test_crop_survival_and_photometric_distributions_match():
    host_boxes, host_means = _host_stats()
    dev_boxes, dev_means = _device_stats()

    # Box-survival distribution (crop aggressiveness): means within 15%.
    assert abs(host_boxes.mean() - dev_boxes.mean()) < 0.30, (
        host_boxes.mean(), dev_boxes.mean()
    )
    # Photometric brightness/contrast spread: output image means should have
    # similar center and spread (both pipelines start from the same image).
    assert abs(host_means.mean() - dev_means.mean()) < 12.0, (
        host_means.mean(), dev_means.mean()
    )
    assert 0.5 < (dev_means.std() / host_means.std()) < 2.0, (
        host_means.std(), dev_means.std()
    )


def test_device_geometry_scale_distribution():
    """Crop rectangle scale must follow U[0.3, 1] per axis of the view."""
    import jax.numpy as jnp

    boxes = jnp.array([[40.0, 40.0, 90.0, 90.0]])
    keys = jax.random.split(jax.random.PRNGKey(1), 400)
    rects, flips = jax.vmap(
        lambda k: DA.sample_geometry(k, boxes, jnp.int32(1), 128, 128,
                                     expand_prob=0.0, crop_attempt_prob=1.0)
    )(keys)
    rects = np.asarray(rects)
    h = (rects[:, 2] - rects[:, 0]) / 128.0
    is_crop = h < 0.999
    assert is_crop.mean() > 0.9  # IoU bound 'None' alone accepts most draws
    hs = h[is_crop]
    # U[0.3, 1) with AR filtering: mean near 0.65, support inside [0.3, 1].
    assert 0.5 < hs.mean() < 0.8
    assert hs.min() >= 0.29 and hs.max() <= 1.001
