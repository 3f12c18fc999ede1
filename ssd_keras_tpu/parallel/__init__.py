from ssd_keras_tpu.parallel.sharding import (
    batch_sharding,
    global_batch_from_local,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "global_batch_from_local",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
