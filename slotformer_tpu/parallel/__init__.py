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
from .tp import DEFAULT_TP_RULES, param_specs, shard_params

__all__ = [
    "DATA_AXIS",
    "DEFAULT_TP_RULES",
    "MODEL_AXIS",
    "batch_sharding",
    "get_mesh",
    "pad_batch_to",
    "pad_rows",
    "param_specs",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_or_replicate",
    "shard_params",
]
