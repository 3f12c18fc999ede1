"""Multi-process data parallelism: 2 real processes x 4 virtual devices.

Exercises the multi-host input path for real (VERDICT r1 #6):
``jax.distributed.initialize`` across two local processes,
``global_batch_from_local`` assembling per-process input shards into one
global batch-sharded array, and one jitted DP train step over the global
mesh. Both processes must report the identical loss, and that loss must
match a single-process 8-device run of the same global batch (the SURVEY
§5.8 contract: per-host sharded input == single-host semantics).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference() -> float:
    """The same global batch + init + one DP step on this process's 8
    virtual devices (conftest already forces 8)."""
    import jax
    import jax.numpy as jnp

    from ssd_keras_tpu import SSDConfig, SSDLoss
    from ssd_keras_tpu import train as T
    from ssd_keras_tpu.models import ssd_7
    from ssd_keras_tpu.parallel import sharding as sh

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, sizes = ssd_7(cfg)
    n = cfg.total_boxes(sizes)
    C = cfg.n_classes_with_background
    rng = np.random.RandomState(0)
    g_images = rng.rand(8, 64, 64, 3).astype(np.float32) * 255
    g_y = np.zeros((8, n, C + 12), np.float32)
    g_y[:, :, 0] = 1.0
    for b in range(8):
        g_y[b, 13 * b, 0] = 0.0
        g_y[b, 13 * b, 1 + b % 3] = 1.0

    mesh = sh.make_mesh()
    rsh = sh.replicated_sharding(mesh)
    tx = T.sgd_with_momentum(learning_rate=1e-3)

    def init_state():
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        return T.TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    state = jax.jit(init_state, out_shardings=rsh)()
    train_step = T.make_train_step(model, SSDLoss(), l2_reg=1e-4,
                                   mesh=mesh, donate=False)
    images, y_true = sh.global_batch_from_local((g_images, g_y), mesh)
    state, metrics = train_step(state, images, y_true)
    first_loss = float(jax.device_get(metrics["loss"]))

    # Continue exactly like the workers: the identical deterministic global
    # stream through StreamingDeviceInput on this process's 8-device mesh
    # (single-process: plain sharded pytree upload instead of
    # make_array_from_process_local_data — same global content).
    from multihost_worker import global_stream_batches

    from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
    from ssd_keras_tpu.data.streaming import StreamingDeviceInput
    from ssd_keras_tpu.encoder import SSDInputEncoder

    aug = DeviceSSDAugmentation(64, 64, mesh=mesh)
    enc = SSDInputEncoder(cfg, sizes, max_gt_boxes=8, mesh=mesh)
    stream = StreamingDeviceInput(global_stream_batches(), aug, enc,
                                  key=jax.random.PRNGKey(5), n_workers=1)
    s_metrics = None
    for s_imgs, s_y in stream:
        state, s_metrics = train_step(state, s_imgs, s_y)
    stream_loss = float(jax.device_get(s_metrics["loss"]))
    return first_loss, stream_loss


def _run_workers(port):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append((p.returncode, out))
    return outputs


# Gloo's key-value rendezvous has a hard 30 s deadline baked into jaxlib.
# On a loaded host, one worker can still be compiling when the other reaches
# the collective, blowing that deadline even though nothing is wrong. The
# first attempt populates the shared compilation cache, so a retry runs the
# rendezvous without the compile skew.
_GLOO_INIT_FLAKE = "Gloo context initialization failed"


@pytest.mark.slow
def test_two_process_data_parallel_matches_single_process(tmp_path):
    for attempt in range(3):
        results_raw = _run_workers(_free_port())
        if all(rc == 0 for rc, _ in results_raw):
            break
        flaky = any(rc != 0 and _GLOO_INIT_FLAKE in out
                    for rc, out in results_raw)
        assert flaky and attempt < 2, "worker failed:\n" + "\n".join(
            out[-3000:] for rc, out in results_raw if rc != 0
        )
    outputs = [out for _, out in results_raw]

    results = {}
    for out in outputs:
        m = re.search(
            r"MULTIHOST_RESULT process=(\d) loss=([\d.]+) ksum=([\d.]+) "
            r"sloss=([\d.]+)", out
        )
        assert m, f"no result line in:\n{out[-3000:]}"
        results[int(m.group(1))] = (
            float(m.group(2)), float(m.group(3)), float(m.group(4)))

    assert set(results) == {0, 1}
    # Both processes observe the identical global loss and updated params,
    # including after the streamed-input steps.
    assert results[0] == results[1]

    reference_loss, reference_stream_loss = _single_process_reference()
    np.testing.assert_allclose(results[0][0], reference_loss, rtol=1e-5)
    # The streamed path (per-process local shards assembled with
    # make_array_from_process_local_data, fused augment+encode on the global
    # mesh) must land on the same loss as the single-process streamed run.
    np.testing.assert_allclose(results[0][2], reference_stream_loss,
                               rtol=1e-5)
