"""BatchNorm folding (ssd_keras_tpu/optimize.py): folded SSD7 == unfolded.

The reference serves keras_ssd7.py graphs with BatchNormalization layers in
place; the TPU-native serving path folds them into the conv kernels. These
tests pin the fold's exactness against the live BN path on non-trivial
running statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu import SSDConfig, fold_batchnorm
from ssd_keras_tpu.models import ssd_7


def _nontrivial_stats(variables, seed=0):
    """Replace init's (mean=0, var=1, gamma=1, beta=0) with random values so
    the fold has to do real work to match."""
    rng = np.random.RandomState(seed)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    for bn in stats:
        c = np.asarray(stats[bn]["mean"]).shape[0]
        stats[bn] = {
            "mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.5),
            "var": jnp.asarray(rng.rand(c).astype(np.float32) * 2 + 0.1),
        }
        params[bn] = {
            "scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.2),
        }
    return {"params": params, "batch_stats": stats}


@pytest.fixture(scope="module")
def ssd7_pair():
    cfg = SSDConfig.ssd7(img_height=128, img_width=128)
    model, _ = ssd_7(cfg, mode="training")
    folded_model, _ = ssd_7(cfg, mode="training", fold_bn=True)
    x = jnp.asarray(
        np.random.RandomState(1).rand(2, 128, 128, 3).astype(np.float32) * 255
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    variables = _nontrivial_stats(variables)
    return model, folded_model, variables, x

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def test_folded_matches_unfolded(ssd7_pair):
    model, folded_model, variables, x = ssd7_pair
    y_ref = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    y_fold = folded_model.apply(folded, x)
    np.testing.assert_allclose(
        np.asarray(y_fold), np.asarray(y_ref), rtol=2e-4, atol=2e-4
    )


def test_folded_params_have_no_bn(ssd7_pair):
    _, _, variables, _ = ssd7_pair
    folded = fold_batchnorm(variables)
    assert "batch_stats" not in folded
    assert not any(k.startswith("bn") for k in folded["params"])
    # Every conv kept its kernel+bias.
    for i in range(1, 8):
        assert set(folded["params"][f"conv{i}"]) == {"kernel", "bias"}


def test_fold_bn_refuses_training(ssd7_pair):
    _, folded_model, variables, x = ssd7_pair
    folded = fold_batchnorm(variables)
    with pytest.raises(ValueError, match="inference-only"):
        folded_model.apply(folded, x, train=True)


def test_fold_requires_batch_stats():
    with pytest.raises(ValueError, match="batch_stats"):
        fold_batchnorm({"params": {"conv1": {}}})


def test_fold_rejects_unmatched_bn():
    vars_bad = {
        "params": {"convA": {"kernel": jnp.zeros((3, 3, 3, 4)),
                             "bias": jnp.zeros((4,))},
                   "bnB": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))}},
        "batch_stats": {"bnB": {"mean": jnp.zeros((4,)),
                                "var": jnp.ones((4,))}},
    }
    with pytest.raises(ValueError, match="no matching conv"):
        fold_batchnorm(vars_bad)


def test_explicit_pairs():
    rng = np.random.RandomState(3)
    k = rng.randn(3, 3, 2, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    gamma = rng.rand(4).astype(np.float32) + 0.5
    beta = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32)
    var = rng.rand(4).astype(np.float32) + 0.1
    eps = 1e-3
    variables = {
        "params": {"c": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)},
                   "n": {"scale": jnp.asarray(gamma),
                         "bias": jnp.asarray(beta)}},
        "batch_stats": {"n": {"mean": jnp.asarray(mean),
                              "var": jnp.asarray(var)}},
    }
    folded = fold_batchnorm(variables, pairs=[("c", "n")], epsilon=eps)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    y_ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    y_ref = (y_ref - mean) / np.sqrt(var + eps) * gamma + beta
    y_fold = jax.lax.conv_general_dilated(
        jnp.asarray(x), folded["params"]["c"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + folded["params"]["c"]["bias"]
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------- #
# Preprocessing fold (VERDICT r4 #6)
# --------------------------------------------------------------------------- #


def test_fold_preprocessing_exact():
    """Channel swap + stddev division folded into conv1's kernel give the
    same outputs as the in-graph preprocessing — including at the image
    border, where the conv's SAME zero padding interacts with the folded
    scale/permute (both fix 0, so the fold is exact; the mean subtraction
    stays in-graph for exactly that reason)."""
    import dataclasses

    from ssd_keras_tpu import fold_preprocessing
    from ssd_keras_tpu.models import ssd_7

    cfg = dataclasses.replace(
        SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64),
        swap_channels=(2, 0, 1),
    )
    assert cfg.subtract_mean and cfg.divide_by_stddev and cfg.swap_channels
    model, _ = ssd_7(cfg)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) * 255)
    v = model.init(jax.random.PRNGKey(0), x[:1])
    y = model.apply(v, x, train=False)

    v2, cfg2 = fold_preprocessing(v, cfg, conv_name="conv1")
    assert cfg2.swap_channels is None and cfg2.divide_by_stddev is None
    assert cfg2.subtract_mean == cfg.subtract_mean
    model2, _ = ssd_7(cfg2)
    y2 = model2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def test_fold_preprocessing_requires_something_to_fold():
    from ssd_keras_tpu import fold_preprocessing
    from ssd_keras_tpu.models import ssd_7

    import dataclasses

    cfg = dataclasses.replace(
        SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64),
        divide_by_stddev=None, swap_channels=None,
    )
    model, _ = ssd_7(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    with pytest.raises(ValueError, match="nothing to fold"):
        fold_preprocessing(v, cfg, conv_name="conv1")


def test_fold_preprocessing_rejects_bad_swap():
    import dataclasses

    from ssd_keras_tpu import fold_preprocessing
    from ssd_keras_tpu.models import ssd_7

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, _ = ssd_7(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    bad = dataclasses.replace(cfg, swap_channels=(0, 0, 1))
    with pytest.raises(ValueError, match="not a permutation"):
        fold_preprocessing(v, bad, conv_name="conv1")
