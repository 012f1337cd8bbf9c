from puzzlefusion_plusplus_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    pad_batch_to_devices,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_parallel_mesh",
    "pad_batch_to_devices",
    "replicate",
    "replicated",
    "shard_batch",
]
