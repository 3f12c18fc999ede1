"""Worker process for the multi-host data-parallel test (SURVEY.md §5.8).

Launched by tests/test_multihost.py as one of two processes. Each process
owns 4 virtual CPU devices (8 global), builds its *local* quarter of the
global batch, assembles the global sharded arrays with
``global_batch_from_local``, and runs ONE jitted DP train step over the
global mesh. Prints the resulting loss for the parent to compare.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin pins 'axon,cpu'

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from ssd_keras_tpu import SSDConfig, SSDLoss
    from ssd_keras_tpu import train as T
    from ssd_keras_tpu.models import ssd_7
    from ssd_keras_tpu.parallel import sharding as sh

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    model, sizes = ssd_7(cfg)
    n = cfg.total_boxes(sizes)
    C = cfg.n_classes_with_background

    # Deterministic GLOBAL batch, identical in every process; each process
    # contributes its own local slice (the per-host input-shard contract).
    rng = np.random.RandomState(0)
    g_images = rng.rand(8, 64, 64, 3).astype(np.float32) * 255
    g_y = np.zeros((8, n, C + 12), np.float32)
    g_y[:, :, 0] = 1.0
    for b in range(8):
        g_y[b, 13 * b, 0] = 0.0
        g_y[b, 13 * b, 1 + b % 3] = 1.0
    lo, hi = process_id * 4, (process_id + 1) * 4
    local_images, local_y = g_images[lo:hi], g_y[lo:hi]

    mesh = sh.make_mesh()  # 1-D mesh over all 8 GLOBAL devices
    rsh = sh.replicated_sharding(mesh)

    # Initialize the replicated state ON DEVICE (jit with replicated
    # out_shardings) — host-side device_put of replicated trees is not
    # legal across processes.
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

    images, y_true = sh.global_batch_from_local((local_images, local_y), mesh)
    assert images.shape == (8, 64, 64, 3)  # global shape, locally sharded
    state, metrics = train_step(state, images, y_true)
    loss = float(jax.device_get(metrics["loss"]))
    kernel_sum = float(jax.device_get(
        jnp.sum(jnp.abs(state.params["conv1"]["kernel"].astype(jnp.float32)))
    ))

    # Streamed device input across processes (VERDICT r4 #3): each process
    # feeds StreamingDeviceInput its LOCAL slice of a deterministic global
    # uint8 batch sequence; the pipeline assembles global batch-sharded
    # arrays with jax.make_array_from_process_local_data and runs the fused
    # augment+encode program on the global mesh, feeding the same sharded
    # train step. The parent compares the final loss against a
    # single-process 8-device run of the identical global stream.
    from ssd_keras_tpu.data.device_aug import DeviceSSDAugmentation
    from ssd_keras_tpu.data.streaming import StreamingDeviceInput
    from ssd_keras_tpu.encoder import SSDInputEncoder

    def local_stream():
        for u8, lbl, cnt in global_stream_batches():
            lo_, hi_ = process_id * 4, (process_id + 1) * 4
            yield u8[lo_:hi_], lbl[lo_:hi_], cnt[lo_:hi_]

    aug = DeviceSSDAugmentation(64, 64, mesh=mesh)
    enc = SSDInputEncoder(cfg, sizes, max_gt_boxes=8, mesh=mesh)
    stream = StreamingDeviceInput(local_stream(), aug, enc,
                                  key=jax.random.PRNGKey(5), n_workers=1)
    n_streamed, s_metrics = 0, None
    for s_imgs, s_y in stream:
        assert s_imgs.shape[0] == 8, s_imgs.shape  # global batch
        state, s_metrics = train_step(state, s_imgs, s_y)
        n_streamed += 1
    assert n_streamed == 2, n_streamed
    s_loss = float(jax.device_get(s_metrics["loss"]))

    print(f"MULTIHOST_RESULT process={process_id} loss={loss:.8f} "
          f"ksum={kernel_sum:.8f} sloss={s_loss:.8f}", flush=True)


def global_stream_batches(n_batches: int = 2, global_b: int = 8,
                          max_gt: int = 8):
    """Deterministic global uint8 stream, identical in every process."""
    r = np.random.RandomState(42)
    for _ in range(n_batches):
        u8 = r.randint(0, 256, (global_b, 64, 64, 3)).astype(np.uint8)
        lbl = np.zeros((global_b, max_gt, 5), np.float32)
        cnt = r.randint(1, 4, (global_b,)).astype(np.int32)
        for b in range(global_b):
            for m in range(cnt[b]):
                x0, y0 = r.randint(0, 48, 2)
                lbl[b, m] = (r.randint(1, 4), x0, y0,
                             x0 + r.randint(8, 16), y0 + r.randint(8, 16))
        yield u8, lbl, cnt


if __name__ == "__main__":
    main()
