"""Training loop: fit_generator, callbacks, checkpoint save/restore, prefetch."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_keras_tpu import train as T
from ssd_keras_tpu.config import SSDConfig
from ssd_keras_tpu.data.prefetch import prefetch
from ssd_keras_tpu.loss import SSDLoss
from ssd_keras_tpu.models import ssd_7


@pytest.fixture(scope="module")
def setup():
    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, sizes = ssd_7(cfg)
    rng = np.random.RandomState(0)
    n = cfg.total_boxes(sizes)
    C = cfg.n_classes_with_background

    def gen():
        while True:
            images = rng.rand(4, 64, 64, 3).astype(np.float32) * 255
            y = np.zeros((4, n, C + 12), np.float32)
            y[:, :, 0] = 1.0
            for b in range(4):
                y[b, 13 * b, 0] = 0.0
                y[b, 13 * b, 1 + b % 3] = 1.0
            yield images, y

    return cfg, model, gen


def _make_trainer(model, gen, tmp_path=None, mesh=None):
    images, y = next(gen())
    tx = T.sgd_with_momentum(learning_rate=1e-3)
    state = T.create_train_state(model, jax.random.PRNGKey(0), images, tx, mesh=mesh)
    step = T.make_train_step(model, SSDLoss(), l2_reg=1e-4, mesh=mesh, donate=False)
    eval_step = T.make_eval_step(model, SSDLoss())
    return T.Trainer(model, state, step, eval_step, mesh=mesh, base_lr=1e-3)


def test_fit_generator_runs_and_logs(setup, tmp_path):
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)
    csv_path = str(tmp_path / "log.csv")
    history = trainer.fit_generator(
        gen(), steps_per_epoch=3, epochs=2,
        callbacks=[T.CSVLogger(csv_path), T.TerminateOnNaN()],
        val_generator=gen(), validation_steps=1,
    )
    assert len(history["loss"]) == 2
    assert len(history["val_loss"]) == 2
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "epoch,loss,val_loss"
    assert len(lines) == 3


def test_csv_logger_append_semantics(setup, tmp_path):
    """Keras CSVLogger contract: append=False truncates a pre-existing file
    (a fresh run must not inherit rows from a previous one — a stale log once
    poisoned the workflow driver's loss-decrease check); append=True
    continues it without rewriting the header."""
    cfg, model, gen = setup
    csv_path = str(tmp_path / "log.csv")
    with open(csv_path, "w") as f:
        f.write("epoch,loss,val_loss\n0,nan,nan\n")

    trainer = _make_trainer(model, gen)
    trainer.fit_generator(
        gen(), steps_per_epoch=1, epochs=1, verbose=False,
        callbacks=[T.CSVLogger(csv_path, append=False)],
    )
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "epoch,loss"
    assert len(lines) == 2 and "nan" not in lines[1]

    trainer.fit_generator(
        gen(), steps_per_epoch=1, epochs=1, verbose=False,
        callbacks=[T.CSVLogger(csv_path, append=True)],
    )
    lines = open(csv_path).read().strip().splitlines()
    assert lines.count("epoch,loss") == 1
    assert len(lines) == 3


def test_csv_logger_tolerates_changing_metric_keys(tmp_path):
    """Metric keys changing between epochs (val_loss appearing at epoch 2, a
    metric disappearing at epoch 3) must not raise or misalign columns: the
    header is fixed at first write, later extras are dropped with a warning,
    missing keys leave their column empty (ADVICE/VERDICT r3)."""
    csv_path = str(tmp_path / "log.csv")
    logger = T.CSVLogger(csv_path)
    logger.on_epoch_end(0, {"loss": 1.0}, None)
    logger.on_epoch_end(1, {"loss": 0.5, "val_loss": 0.7}, None)  # extra key
    logger.on_epoch_end(2, {}, None)  # missing key
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "epoch,loss"
    assert lines[1] == "0,1.0"
    assert lines[2] == "1,0.5"  # val_loss dropped, not misaligned
    assert lines[3] == "2,"  # loss column empty, row still parses
    import csv as _csv

    rows = list(_csv.DictReader(open(csv_path)))
    assert [r["epoch"] for r in rows] == ["0", "1", "2"]


def test_lr_scheduler_callback(setup):
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)
    schedule = lambda epoch: 1e-3 if epoch < 1 else 1e-5
    trainer.fit_generator(
        gen(), steps_per_epoch=1, epochs=2, lr_schedule=schedule, base_lr=1e-3,
        verbose=False,
    )
    lr = float(trainer.state.opt_state.hyperparams["learning_rate"])
    assert lr == pytest.approx(1e-5)


def test_lr_scheduler_applies_schedule0_at_epoch0(setup):
    """Keras LearningRateScheduler sets schedule(0) at epoch BEGIN — a warmup
    schedule must govern the first epoch, not the base LR (ADVICE r1)."""
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)
    seen = []

    class SpyLR(T.Callback):
        def on_epoch_begin(self, epoch, logs, tr):
            pass

        def on_epoch_end(self, epoch, logs, tr):
            seen.append(float(tr.state.opt_state.hyperparams["learning_rate"]))

    warmup = T.LearningRateScheduler(
        schedule=lambda e: 1e-6 if e == 0 else 1e-3, base_lr=1e-3
    )
    trainer.fit_generator(
        gen(), steps_per_epoch=1, epochs=2, callbacks=[warmup, SpyLR()],
        verbose=False,
    )
    assert seen[0] == pytest.approx(1e-6)  # epoch 0 trained at schedule(0)
    assert seen[1] == pytest.approx(1e-3)


def test_set_lr_rebuilds_nested_chain_state(setup):
    """set_lr must find InjectHyperparamsState at any nesting depth and
    rebuild the state functionally (no in-place mutation)."""
    cfg, model, gen = setup
    images, y = next(gen())
    # Doubly-nested chain: chain(clip, chain(inject(sgd))).
    tx = T.sgd_with_momentum(learning_rate=1e-3, clipnorm=1.0)
    import optax

    tx = optax.chain(optax.identity(), tx)
    state = T.create_train_state(model, jax.random.PRNGKey(0), images, tx)
    step = T.make_train_step(model, SSDLoss(), donate=False)
    trainer = T.Trainer(model, state, step, base_lr=1e-3)
    old_opt_state = trainer.state.opt_state
    trainer.set_lr(5e-4)

    def find_lr(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            return float(node.hyperparams["learning_rate"])
        if isinstance(node, tuple):
            for c in node:
                got = find_lr(c)
                if got is not None:
                    return got
        return None

    assert find_lr(trainer.state.opt_state) == pytest.approx(5e-4)
    # The previous state object was not mutated.
    assert find_lr(old_opt_state) == pytest.approx(1e-3)
    # Training still steps with the rebuilt state.
    trainer.state, m = trainer.train_step(
        trainer.state, jnp.asarray(images), jnp.asarray(y)
    )
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_save_restore(setup, tmp_path):
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)
    g = gen()
    for _ in range(2):
        images, y = next(g)
        trainer.state, _ = trainer.train_step(
            trainer.state, jnp.asarray(images), jnp.asarray(y)
        )
    trainer.save_checkpoint(str(tmp_path), step=7)
    saved_kernel = np.asarray(trainer.state.params["conv1"]["kernel"]).copy()
    saved_step = int(trainer.state.step)

    # Train further, then restore: parameters must roll back.
    images, y = next(g)
    trainer.state, _ = trainer.train_step(
        trainer.state, jnp.asarray(images), jnp.asarray(y)
    )
    assert not np.allclose(
        np.asarray(trainer.state.params["conv1"]["kernel"]), saved_kernel
    )
    trainer.restore_checkpoint(os.path.join(str(tmp_path), "ckpt_7"))
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["conv1"]["kernel"]), saved_kernel
    )
    assert int(trainer.state.step) == saved_step


def test_early_stopping(setup):
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)
    stopper = T.EarlyStopping(monitor="loss", patience=1, min_delta=1e9)
    history = trainer.fit_generator(
        gen(), steps_per_epoch=1, epochs=10, callbacks=[stopper], verbose=False
    )
    assert len(history["loss"]) <= 3  # stopped long before 10


def test_terminate_on_nan(setup):
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)

    class PoisonLoss(T.Callback):
        def on_epoch_end(self, epoch, logs, tr):
            logs["loss"] = math.nan
            T.TerminateOnNaN().on_epoch_end(epoch, logs, tr)

    history = trainer.fit_generator(
        gen(), steps_per_epoch=1, epochs=5, callbacks=[PoisonLoss()], verbose=False
    )
    assert len(history["loss"]) == 1


def test_bf16_training_tracks_f32(setup):
    """Bound bf16-compute training numerics against f32 (VERDICT r1 #7):
    identical init/data, 50 steps each; loss trajectories must stay within
    tolerance and both must train (the canonical recipe runs in bf16)."""
    cfg, model_f32, gen = setup
    model_bf16, _ = ssd_7(cfg, compute_dtype=jnp.bfloat16)

    g = gen()
    batches = [next(g) for _ in range(10)]  # reuse -> identical data streams

    def run(model):
        tx = T.sgd_with_momentum(learning_rate=1e-3)
        state = T.create_train_state(
            model, jax.random.PRNGKey(0), batches[0][0], tx
        )
        step = T.make_train_step(model, SSDLoss(), l2_reg=5e-4, donate=False)
        losses = []
        for i in range(50):
            images, y = batches[i % len(batches)]
            state, m = step(state, jnp.asarray(images), jnp.asarray(y))
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    l32 = run(model_f32)
    l16 = run(model_bf16)
    assert np.all(np.isfinite(l16))
    # Same init (compute dtype does not change param init), so step-0 loss
    # differs only by rounding: bf16 has ~3 significant decimal digits.
    assert abs(l16[0] - l32[0]) / l32[0] < 0.02
    # Trajectories track within 15% relative throughout 50 steps.
    np.testing.assert_allclose(l16, l32, rtol=0.15)
    # And both actually train.
    assert l16[-1] < 0.7 * l16[0]
    assert l32[-1] < 0.7 * l32[0]


def test_prepare_keeps_device_batches_on_device(setup):
    """The on-device input pipeline yields jax.Arrays; _prepare must pass
    them through untouched (same buffers), not round-trip them through
    NumPy — and training on them must match training on the host copies."""
    cfg, model, gen = setup
    trainer = _make_trainer(model, gen)
    images_np, y_np = next(gen())
    images_d, y_d = jnp.asarray(images_np), jnp.asarray(y_np)

    pi, py = trainer._prepare(images_d, y_d)
    assert pi is images_d and py is y_d  # no copy, no host round-trip

    state0 = trainer.state
    _, m_dev = trainer.train_step(state0, pi, py)
    _, m_host = trainer.train_step(state0, *trainer._prepare(images_np, y_np))
    np.testing.assert_allclose(
        float(m_dev["loss"]), float(m_host["loss"]), rtol=1e-6)


def test_prefetch_generator(setup):
    cfg, model, gen = setup
    pf = prefetch(gen(), buffer_size=2)
    a = next(pf)
    b = next(pf)
    assert a[0].shape == b[0].shape == (4, 64, 64, 3)
    pf.stop()


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")

    pf = prefetch(bad(), buffer_size=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)
        next(pf)


def test_global_batch_from_local(setup):
    import jax

    from ssd_keras_tpu.parallel import sharding as sh

    mesh = sh.make_mesh()
    local = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = sh.global_batch_from_local(local, mesh)
    assert arr.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_benchmark_fps_harness(setup):
    import jax.numpy as jnp

    from ssd_keras_tpu.utils.profiling import benchmark_fps

    res = benchmark_fps(lambda b: b * 2.0, np.ones((4, 8), np.float32),
                        n_iters=5, n_repeats=2)
    assert res["fps"] > 0 and res["batch_size"] == 4


def test_draw_detections(setup):
    from ssd_keras_tpu.utils.visualization import draw_detections

    img = np.zeros((64, 64, 3), np.uint8)
    dets = np.array([[1, 0.9, 10, 10, 40, 40], [0, 0, 0, 0, 0, 0]])
    out = draw_detections(img, dets, class_names=["bg", "car"])
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0  # something was drawn
