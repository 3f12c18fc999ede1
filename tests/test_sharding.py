"""Data parallelism on the 8-device virtual CPU mesh.

Validates the SURVEY.md §5.8 contract: the jitted train step over global
sharded arrays must produce bit-comparable results to the unsharded step —
in particular the loss's batch-global n_positive normalization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu import train as T
from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.loss import SSDLoss
from ssd_keras_tpu.models import ssd_7
from ssd_keras_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, sizes = ssd_7(cfg)
    rng = np.random.RandomState(0)
    batch = 8
    images = rng.rand(batch, 64, 64, 3).astype(np.float32) * 255
    n = cfg.total_boxes(sizes)
    C = cfg.n_classes_with_background
    y_true = np.zeros((batch, n, C + 12), np.float32)
    y_true[:, :, 0] = 1.0
    for b in range(batch):
        for j in range(b + 1):  # different positive counts per item
            y_true[b, 7 * j, 0] = 0.0
            y_true[b, 7 * j, 1 + j % 3] = 1.0
            y_true[b, 7 * j, C : C + 4] = rng.randn(4) * 0.1
    return cfg, model, images, y_true


def test_mesh_construction():
    mesh = sh.make_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data",)


def test_sharded_loss_matches_unsharded(setup):
    cfg, model, images, y_true = setup
    variables = model.init(jax.random.PRNGKey(0), images)
    loss_obj = SSDLoss()

    def loss_fn(images, y_true):
        y_pred = model.apply(variables, images)
        return loss_obj(y_true, y_pred)

    unsharded = float(jax.jit(loss_fn)(images, y_true))

    mesh = sh.make_mesh()
    sharded_fn = jax.jit(
        loss_fn,
        in_shardings=(sh.batch_sharding(mesh), sh.batch_sharding(mesh)),
        out_shardings=sh.replicated_sharding(mesh),
    )
    si, sy = sh.shard_batch((images, y_true), mesh)
    sharded = float(sharded_fn(si, sy))
    np.testing.assert_allclose(sharded, unsharded, rtol=1e-5)


def test_sharded_train_step_matches_unsharded(setup):
    cfg, model, images, y_true = setup
    tx = T.sgd_with_momentum(learning_rate=1e-2)

    state1 = T.create_train_state(model, jax.random.PRNGKey(0), images, tx)
    step1 = T.make_train_step(model, l2_reg=5e-4, donate=False)
    state1, m1 = step1(state1, jnp.asarray(images), jnp.asarray(y_true))

    mesh = sh.make_mesh()
    state2 = T.create_train_state(model, jax.random.PRNGKey(0), images, tx, mesh=mesh)
    step2 = T.make_train_step(model, l2_reg=5e-4, mesh=mesh, donate=False)
    si, sy = sh.shard_batch((images, y_true), mesh)
    state2, m2 = step2(state2, si, sy)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # Updated parameters must agree (gradient all-reduce is exact).
    k1 = np.asarray(state1.params["conv1"]["kernel"])
    k2 = np.asarray(state2.params["conv1"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-6)


def test_sharded_decode_matches_unsharded(setup):
    """The evaluator's device-decode path under the mesh: the in-graph decode
    (per-class NMS + top-k) on a batch-sharded prediction tensor must produce
    the same detections as the single-device run.

    Uses synthetic predictions with well-separated scores — a random-init
    model forward produces near-tied scores whose top-k order legitimately
    differs between program shapes (XLA fusion/FMA variation), which is
    tie-breaking noise, not a sharding defect.
    """
    import functools

    from ssd_keras_tpu.decoder import decode_detections_fixed

    cfg, model, images, y_true = setup
    rng = np.random.RandomState(3)
    batch, n, C = 8, 340, cfg.n_classes_with_background
    y_pred = np.zeros((batch, n, C + 12), np.float32)
    conf = rng.rand(batch, n, C).astype(np.float32)
    y_pred[..., :C] = conf / conf.sum(-1, keepdims=True)
    y_pred[..., C : C + 4] = rng.randn(batch, n, 4).astype(np.float32) * 0.1
    cx, cy = rng.rand(2, n).astype(np.float32)
    wh = (rng.rand(2, n) * 0.2 + 0.05).astype(np.float32)
    y_pred[..., -8] = cx
    y_pred[..., -7] = cy
    y_pred[..., -6:-4] = wh.T
    y_pred[..., -4:] = [0.1, 0.1, 0.2, 0.2]

    decode = functools.partial(
        decode_detections_fixed, confidence_thresh=0.02, top_k=cfg.top_k,
        img_height=64, img_width=64,
    )
    unsharded = np.asarray(decode(jnp.asarray(y_pred)))

    mesh = sh.make_mesh()
    sharded_fn = jax.jit(
        decode,
        in_shardings=(sh.batch_sharding(mesh),),
        out_shardings=sh.batch_sharding(mesh),
    )
    (sp,) = sh.shard_batch((y_pred,), mesh)
    sharded = np.asarray(sharded_fn(sp))
    assert sharded.shape == (batch, cfg.top_k, 6)
    np.testing.assert_allclose(sharded, unsharded, rtol=1e-5, atol=1e-5)


def test_multi_step_training_on_mesh(setup):
    cfg, model, images, y_true = setup
    mesh = sh.make_mesh()
    tx = T.sgd_with_momentum(learning_rate=1e-3)
    state = T.create_train_state(model, jax.random.PRNGKey(1), images, tx, mesh=mesh)
    step = T.make_train_step(model, l2_reg=0.0, mesh=mesh)
    si, sy = sh.shard_batch((images, y_true), mesh)
    losses = []
    for _ in range(5):
        state, metrics = step(state, si, sy)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_lr_mutation_without_retrace(setup):
    cfg, model, images, y_true = setup
    tx = T.sgd_with_momentum(learning_rate=1e-3)
    state = T.create_train_state(model, jax.random.PRNGKey(0), images, tx)
    trainer = T.Trainer(model, state, T.make_train_step(model, donate=False),
                        base_lr=1e-3)
    trainer.set_lr_scale(0.1)
    lr = float(trainer.state.opt_state.hyperparams["learning_rate"])
    assert lr == pytest.approx(1e-4)


def test_initialize_distributed_error_paths(monkeypatch):
    """Idempotent on 'already initialized'; loud on real misconfiguration
    (parallel/sharding.py — a bad multi-host launch must not silently
    degrade to single-process behavior)."""
    import pytest

    from ssd_keras_tpu.parallel import initialize_distributed

    calls = {}

    def fake_initialize(**kwargs):
        calls.update(kwargs)
        raise RuntimeError("Distributed system is already initialized.")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    initialize_distributed(num_processes=2)  # no raise
    assert calls == {"num_processes": 2}

    def bad_initialize(**kwargs):
        raise RuntimeError("Barrier timed out: coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", bad_initialize)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        initialize_distributed(coordinator_address="nowhere:1234")
