"""Device mesh and sharding utilities.

TPU-native replacement for the reference's NCCL DDP (SURVEY.md §2.6):
training is a single pjit program over an ICI mesh with axes
``('data', 'model')``. Batch is sharded on ``data``; params/opt state are
replicated by default (the models are <=~30M params so DP alone recovers
the reference's parallelism), and ``tp.shard_params`` optionally
column/row-shards the transformer kernels over ``model``
(Megatron-style; ``tp_size`` in the trainer params). All collectives —
gradient all-reduce on ``data``, activation reductions on ``model`` — are
inserted by XLA from the sharding annotations (the jit-of-sharded-inputs
formulation), riding ICI instead of NCCL.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        assert n_total % n_model == 0, (n_total, n_model)
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    dev_arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch dict with batch-dim sharding.

    Non-array leaves (e.g. lists of filenames) are left on host.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def shard_or_replicate(mesh: Mesh, tree):
    """Shard array leaves on the data axis when divisible, else replicate.

    Used by offline inference CLIs (extraction / rollout) so the same code
    drives 1 chip or a full mesh — the reference's nn.DataParallel
    equivalent (SURVEY.md §2.6 'Inference DP')."""
    n_data = mesh.shape[DATA_AXIS]
    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            if x.shape[0] % n_data == 0:
                return jax.device_put(x, b_shard)
            return jax.device_put(x, r_shard)
        return x

    return jax.tree.map(put, tree)


def pad_rows(x: "np.ndarray", target: int) -> "np.ndarray":
    """Pad the leading dim to ``target`` by repeating the last row (keeps jit
    shapes static for remainder batches in offline CLIs)."""
    import numpy as np

    n = x.shape[0]
    if n >= target:
        return x
    return np.concatenate([x, np.repeat(x[-1:], target - n, axis=0)])


def pad_batch_to(batch, target_bs: int):
    """Pad the batch dim up to target_bs (repeat last sample) + valid mask.

    Keeps jit shapes static when the dataset size doesn't divide the global
    batch (eval loaders); callers mask metrics with the returned bool mask.
    """
    import numpy as np

    first = next(v for v in batch.values() if hasattr(v, "shape"))
    bs = first.shape[0]
    mask = np.zeros((target_bs,), dtype=bool)
    mask[:bs] = True
    if bs == target_bs:
        return batch, mask

    def pad(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 and x.shape[0] == bs:
            reps = np.concatenate(
                [x, np.repeat(x[-1:], target_bs - bs, axis=0)], axis=0
            )
            return reps
        return x

    return {k: pad(v) for k, v in batch.items()}, mask
