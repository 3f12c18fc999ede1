"""Training loop: optimizer, jitted/sharded train step, callbacks, checkpoints.

Capability parity with the reference training workflow (ssd300_training.ipynb /
ssd7_training.ipynb: ``model.compile`` + ``fit_generator`` with
ModelCheckpoint / CSVLogger / LearningRateScheduler / TerminateOnNaN /
EarlyStopping / ReduceLROnPlateau callbacks), re-designed TPU-first:

* One jitted train step containing forward, loss (with in-graph hard negative
  mining), L2 regularization, backward, and the optimizer update.
* Data parallelism by jitting over global arrays on a ``Mesh`` — see
  ssd_keras_tpu.parallel.sharding. No per-shard loss averaging quirks: the
  batch-global positive-count normalization stays exact.
* Checkpointing via Orbax (native) with reference-style ``.h5`` export
  available through weights_io.
"""

from __future__ import annotations

import csv
import math
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core
from flax import struct
from flax.training import train_state

from ssd_keras_tpu.loss import SSDLoss
from ssd_keras_tpu.parallel import sharding as sh

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "sgd_with_momentum",
    "piecewise_lr",
    "fit_generator",
    "ModelCheckpoint",
    "CSVLogger",
    "LearningRateScheduler",
    "TerminateOnNaN",
    "EarlyStopping",
    "ReduceLROnPlateau",
]


class TrainState(train_state.TrainState):
    """flax TrainState extended with BatchNorm statistics and an LR scale."""

    batch_stats: Any = None
    lr_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))


def sgd_with_momentum(learning_rate=1e-3, momentum=0.9, clipnorm=None):
    """The canonical SSD optimizer (ssd300_training.ipynb cell 7).

    Wrapped with ``inject_hyperparams`` so the learning rate is a mutable
    field of the optimizer state — that's what lets the epoch-driven
    ``LearningRateScheduler`` / ``ReduceLROnPlateau`` callbacks change it
    without retracing the jitted train step. ``clipnorm`` adds global-norm
    gradient clipping (useful when training without pretrained weights —
    the canonical recipe starts from VGG, which is why the reference
    survives lr 1e-3).
    """
    tx = optax.inject_hyperparams(optax.sgd)(
        learning_rate=learning_rate, momentum=momentum
    )
    if clipnorm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clipnorm), tx)
    return tx


def adam(learning_rate=1e-3, clipnorm=None, **kwargs):
    """SSD7's optimizer (ssd7_training.ipynb cell 7)."""
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate, **kwargs)
    if clipnorm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clipnorm), tx)
    return tx


def piecewise_lr(base_lr=1e-3, boundaries_and_scales=None):
    """Step LR schedule; default mirrors the SSD300 80/100-epoch drops."""
    if boundaries_and_scales is None:
        boundaries_and_scales = {80_000: 0.1, 100_000: 0.1}
    return optax.piecewise_constant_schedule(base_lr, boundaries_and_scales)


def create_train_state(
    module,
    rng,
    sample_input,
    tx,
    mesh=None,
) -> TrainState:
    """Initialize parameters (+ batch stats) and build the train state."""
    variables = module.init(rng, jnp.asarray(sample_input))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax_core.FrozenDict({}))
    state = TrainState.create(
        apply_fn=module.apply, params=params, tx=tx, batch_stats=batch_stats
    )
    if mesh is not None:
        state = sh.replicate(state, mesh)
    return state


def _l2_penalty(params, l2_reg: float):
    """Keras-style kernel L2 regularization: l2_reg * sum(kernel**2).

    The reference attaches ``l2(l2_reg)`` to every conv (keras_ssd300.py),
    which adds exactly this term to the training loss.
    """
    if l2_reg == 0.0:
        return 0.0
    leaves = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if path and getattr(path[-1], "key", None) == "kernel":
            leaves.append(jnp.sum(jnp.square(leaf)))
    return l2_reg * sum(leaves)


def make_train_step(
    module,
    loss_obj: Optional[SSDLoss] = None,
    l2_reg: float = 0.0,
    mesh=None,
    donate: bool = True,
):
    """Build the jitted train step: (state, images, y_true) -> (state, metrics).

    With a mesh, inputs are expected batch-sharded on the 'data' axis and the
    state replicated; the single jit over global arrays makes XLA insert all
    collectives (gradient psum, global n_positive sums).
    """
    loss_obj = loss_obj or SSDLoss()
    has_bn = True  # resolved at trace time from state.batch_stats contents

    def loss_fn(params, batch_stats, images, y_true):
        variables = {"params": params}
        use_bn = batch_stats is not None and len(batch_stats) > 0
        if use_bn:
            variables["batch_stats"] = batch_stats
            y_pred, mutated = module.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            y_pred = module.apply(variables, images)
            new_stats = batch_stats
        data_loss = jnp.mean(loss_obj.compute_loss(y_true, y_pred))
        total = data_loss + _l2_penalty(params, l2_reg)
        return total, (data_loss, new_stats)

    def train_step(state: TrainState, images, y_true):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total_loss, (data_loss, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, y_true
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": total_loss, "data_loss": data_loss}
        return state, metrics

    if mesh is not None:
        bsh = sh.batch_sharding(mesh)
        rsh = sh.replicated_sharding(mesh)
        return jax.jit(
            train_step,
            in_shardings=(rsh, bsh, bsh),
            out_shardings=(rsh, rsh),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(module, loss_obj: Optional[SSDLoss] = None, l2_reg: float = 0.0):
    loss_obj = loss_obj or SSDLoss()

    @jax.jit
    def eval_step(state: TrainState, images, y_true):
        variables = {"params": state.params}
        if state.batch_stats is not None and len(state.batch_stats) > 0:
            variables["batch_stats"] = state.batch_stats
            y_pred = module.apply(variables, images, train=False)
        else:
            y_pred = module.apply(variables, images)
        return jnp.mean(loss_obj.compute_loss(y_true, y_pred))

    return eval_step


# --------------------------------------------------------------------------- #
# Callbacks (reference parity: Keras callback behaviors, SURVEY.md §5.4/§5.5)
# --------------------------------------------------------------------------- #


class Callback:
    def on_epoch_begin(self, epoch: int, logs: Dict[str, float], trainer) -> None:
        pass

    def on_epoch_end(self, epoch: int, logs: Dict[str, float], trainer) -> None:
        pass


class ModelCheckpoint(Callback):
    """Save Orbax checkpoints each epoch; optionally only on improvement."""

    def __init__(self, directory, monitor="val_loss", save_best_only=True, mode="min"):
        self.directory = os.path.abspath(directory)
        self.monitor = monitor
        self.save_best_only = save_best_only
        self.best = math.inf if mode == "min" else -math.inf
        self.mode = mode

    def on_epoch_end(self, epoch, logs, trainer):
        value = logs.get(self.monitor)
        if self.save_best_only and value is not None:
            improved = value < self.best if self.mode == "min" else value > self.best
            if not improved:
                return
            self.best = value
        trainer.save_checkpoint(self.directory, step=epoch)


class CSVLogger(Callback):
    """Per-epoch metrics to a CSV file (Keras semantics: ``append=False``
    truncates any existing file at the first write, ``append=True`` continues
    it — a resumed training keeps one contiguous log, a fresh run never
    inherits rows from a previous one)."""

    def __init__(self, filename, append=False):
        self.filename = filename
        self._initialized = append and os.path.exists(filename)
        self.fieldnames: Optional[List[str]] = None
        if self._initialized:
            # Resuming: recover the existing header so appended rows stay
            # aligned with it even if this run's metric keys differ.
            with open(filename, newline="") as f:
                header = next(csv.reader(f), None)
            if header:
                self.fieldnames = header

    def on_epoch_end(self, epoch, logs, trainer):
        # Fieldnames are fixed at the first write (Keras CSVLogger semantics):
        # a metric appearing later (e.g. val_loss from epoch 2) is dropped with
        # a one-time warning instead of corrupting the column alignment, and a
        # metric that disappears leaves its column empty.
        if self.fieldnames is None:
            self.fieldnames = ["epoch"] + sorted(logs)
        write_header = not self._initialized
        mode = "a" if self._initialized else "w"
        row = {"epoch": epoch}
        extras = []
        for k, v in logs.items():
            if k in self.fieldnames:
                row[k] = float(v)
            else:
                extras.append(k)
        if extras and not getattr(self, "_warned_extras", False):
            self._warned_extras = True
            print(
                f"CSVLogger: metrics {extras} appeared after the header was "
                f"written to {self.filename}; they will not be logged."
            )
        with open(self.filename, mode, newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.fieldnames, restval="")
            if write_header:
                writer.writeheader()
                self._initialized = True
            writer.writerow(row)


class LearningRateScheduler(Callback):
    """Set the LR scale from a schedule(epoch) -> lr function.

    Keras semantics: the schedule is applied at epoch *begin* with the
    current epoch index, so ``schedule(0)`` governs the very first epoch
    (warmup schedules depend on this).
    """

    def __init__(self, schedule: Callable[[int], float], base_lr: float):
        self.schedule = schedule
        self.base_lr = base_lr

    def on_epoch_begin(self, epoch, logs, trainer):
        trainer.set_lr_scale(self.schedule(epoch) / self.base_lr)


class TerminateOnNaN(Callback):
    """Stop training on a non-finite loss (Keras TerminateOnNaN semantics).

    Also sets ``trainer.terminated_on_nan`` so drivers can distinguish a
    divergence stop from a legitimate EarlyStopping stop (e.g. to exit
    non-zero from a training script).
    """

    def on_epoch_end(self, epoch, logs, trainer):
        loss = logs.get("loss")
        if loss is not None and not math.isfinite(loss):
            trainer.stop_training = True
            trainer.terminated_on_nan = True


class EarlyStopping(Callback):
    def __init__(self, monitor="val_loss", min_delta=0.0, patience=10, mode="min"):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0

    def on_epoch_end(self, epoch, logs, trainer):
        value = logs.get(self.monitor)
        if value is None:
            return
        improved = (
            value < self.best - self.min_delta
            if self.mode == "min"
            else value > self.best + self.min_delta
        )
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                trainer.stop_training = True


class ReduceLROnPlateau(Callback):
    def __init__(self, monitor="val_loss", factor=0.2, patience=8,
                 min_lr_scale=1e-5, mode="min"):
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.min_lr_scale = min_lr_scale
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0

    def on_epoch_end(self, epoch, logs, trainer):
        value = logs.get(self.monitor)
        if value is None:
            return
        improved = value < self.best if self.mode == "min" else value > self.best
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                trainer.set_lr_scale(
                    max(self.min_lr_scale, trainer.lr_scale * self.factor)
                )
                self.wait = 0


# --------------------------------------------------------------------------- #
# Trainer
# --------------------------------------------------------------------------- #


class Trainer:
    """Drives the jitted train step over a generator with callbacks."""

    def __init__(self, module, state: TrainState, train_step, eval_step=None,
                 mesh=None, base_lr: float = 1e-3):
        self.module = module
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.mesh = mesh
        self.base_lr = base_lr
        self.stop_training = False
        self.terminated_on_nan = False
        self.lr_scale = 1.0

    def set_lr_scale(self, scale: float):
        self.lr_scale = float(scale)
        self.set_lr(self.base_lr * self.lr_scale)

    def set_lr(self, lr: float):
        """Rebuild the opt_state with a new injected learning rate.

        Functional (no in-place mutation of the live optimizer state, which
        would break with donated buffers) and nesting-agnostic: finds every
        ``InjectHyperparamsState`` node — wherever optax.chain placed it —
        and replaces its ``learning_rate`` hyperparameter.
        """

        def rebuild(node):
            if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
                hp = dict(node.hyperparams)
                hp["learning_rate"] = jnp.asarray(
                    lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
                )
                return node._replace(hyperparams=hp)
            if isinstance(node, tuple):
                children = [rebuild(c) for c in node]
                if hasattr(node, "_fields"):  # NamedTuple state
                    return type(node)(*children)
                return tuple(children)
            return node

        self.state = self.state.replace(opt_state=rebuild(self.state.opt_state))

    def save_checkpoint(self, directory, step: int):
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(directory), f"ckpt_{step}")
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(
            path,
            {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "opt_state": jax.device_get(self.state.opt_state),
                "step": int(self.state.step),
            },
            force=True,
        )
        checkpointer.wait_until_finished()

    def restore_checkpoint(self, path):
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
        }
        restored = checkpointer.restore(os.path.abspath(path), target=target)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        if self.mesh is not None:
            self.state = sh.replicate(self.state, self.mesh)

    def _prepare(self, images, y_true):
        # Device-resident batches (the on-device input pipeline) pass through
        # untouched: forcing them into NumPy here would round-trip every
        # batch device->host->device — tens of MB per step for nothing.
        if not isinstance(images, jax.Array):
            images = np.ascontiguousarray(images, dtype=np.float32)
        if not isinstance(y_true, jax.Array):
            y_true = np.ascontiguousarray(y_true, dtype=np.float32)
        if self.mesh is not None:
            images, y_true = sh.shard_batch((images, y_true), self.mesh)
        return images, y_true

    def fit_generator(
        self,
        generator,
        steps_per_epoch: int,
        epochs: int,
        callbacks: Optional[List[Callback]] = None,
        val_generator=None,
        validation_steps: int = 0,
        initial_epoch: int = 0,
        lr_schedule: Optional[Callable[[int], float]] = None,
        base_lr: float = 1e-3,
        verbose: bool = True,
    ):
        """The fit loop (reference: Keras ``fit_generator``, SURVEY.md §3.1)."""
        callbacks = list(callbacks or [])
        history = {}

        for epoch in range(initial_epoch, epochs):
            if lr_schedule is not None:
                self.set_lr_scale(lr_schedule(epoch) / base_lr)
            for cb in callbacks:
                cb.on_epoch_begin(epoch, {}, self)
            epoch_losses = []
            t0 = time.time()
            for _ in range(steps_per_epoch):
                images, y_true = next(generator)[:2]
                images, y_true = self._prepare(images, y_true)
                self.state, metrics = self.train_step(self.state, images, y_true)
                epoch_losses.append(metrics["loss"])
            loss = float(jnp.mean(jnp.stack(epoch_losses)))
            logs = {"loss": loss}
            if val_generator is not None and self.eval_step is not None and validation_steps:
                val_losses = []
                for _ in range(validation_steps):
                    images, y_true = next(val_generator)[:2]
                    images, y_true = self._prepare(images, y_true)
                    val_losses.append(self.eval_step(self.state, images, y_true))
                logs["val_loss"] = float(jnp.mean(jnp.stack(val_losses)))
            if verbose:
                dt = time.time() - t0
                msg = " ".join(f"{k}={v:.4f}" for k, v in logs.items())
                print(f"epoch {epoch + 1}/{epochs} [{dt:.1f}s] {msg}")
            for k, v in logs.items():
                history.setdefault(k, []).append(v)
            for cb in callbacks:
                cb.on_epoch_end(epoch, logs, self)
            if self.stop_training:
                break
        return history


def fit_generator(*args, **kwargs):
    """Functional alias mirroring the reference notebook entry point."""
    trainer = kwargs.pop("trainer")
    return trainer.fit_generator(*args, **kwargs)
