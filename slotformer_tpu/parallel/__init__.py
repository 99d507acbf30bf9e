from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    get_mesh,
    pad_batch_to,
    pad_rows,
    replicate,
    replicated,
    shard_batch,
    shard_or_replicate,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "get_mesh",
    "pad_batch_to",
    "pad_rows",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_or_replicate",
]
