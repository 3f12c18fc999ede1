"""Data-parallel execution over a ``jax.sharding.Mesh``.

The reference has no distributed support at all (SURVEY.md §2.x, §5.8); this
module is the TPU-native addition: a 1-D ``('data',)`` mesh over the slice,
batch inputs sharded on 'data', parameters replicated, and the train step
jitted over *global* arrays so XLA lowers cross-device reductions (gradient
all-reduce AND the loss's batch-global ``n_positive`` normalization) to
``psum`` collectives over ICI automatically — the loss normalization contract
(keras_ssd_loss.py:143,:204) stays exact under data parallelism by
construction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "upload_sharded",
    "global_batch_from_local",
    "initialize_distributed",
]


def initialize_distributed(**kwargs):
    """Per-host setup for multi-host slices (wraps jax.distributed.initialize).

    Idempotent: a repeated call on an already-initialized runtime is a no-op.
    Any other failure (bad coordinator address, mismatched process ids, ...)
    re-raises — a misconfigured multi-host launch must fail loudly rather
    than degrade to silent single-process behavior.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return  # repeated call; keep the first initialization
        raise


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place host arrays onto the mesh with the batch axis sharded.

    Works for a single array or a pytree; the global batch dimension must be
    divisible by the mesh size. In multi-host settings use
    ``jax.make_array_from_process_local_data`` with the same sharding instead.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def upload_sharded(arr, mesh: Mesh, axis_name: str = "data", chunk: int = 256):
    """Upload a host array as a batch-sharded device array, in bounded chunks.

    The HBM-resident dataset story under data parallelism: each device holds
    ``len(arr) / n_devices`` rows of axis 0, so an 8-chip slice holds 8x the
    dataset a single chip can (VERDICT r3 #2/#6). Per-device shards are
    uploaded in ``chunk``-row pieces so the host never buffers a
    whole-dataset-sized transfer (same rationale as the predictor's chunked
    uploads). Rows must divide evenly by the mesh size — trim or pad first.
    """
    arr = np.asarray(arr)
    sharding = batch_sharding(mesh, axis_name)
    n_dev = int(mesh.devices.size)
    if arr.shape[0] % n_dev:
        raise ValueError(
            f"upload_sharded: leading axis {arr.shape[0]} not divisible by "
            f"the {n_dev}-device mesh; trim or pad the dataset first."
        )
    shards = []
    for device, index in sharding.addressable_devices_indices_map(arr.shape).items():
        local = arr[index]
        parts = [
            jax.device_put(local[i: i + chunk], device)
            for i in range(0, len(local), chunk)
        ]
        # All parts are committed to `device`, so the eager concatenate
        # runs (and leaves its result) there.
        shards.append(parts[0] if len(parts) == 1 else jnp.concatenate(parts))
    return jax.make_array_from_single_device_arrays(arr.shape, sharding, shards)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. train state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def global_batch_from_local(local_batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble a global batch-sharded array from per-process local data.

    The multi-host input story (SURVEY.md §5.8): each host loads/augments its
    own shard of the global batch; this stitches the per-process arrays into
    one global jax.Array sharded on the 'data' axis without gathering to any
    single host. Works for a single array or a pytree. In single-process
    settings it is equivalent to :func:`shard_batch`.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )
