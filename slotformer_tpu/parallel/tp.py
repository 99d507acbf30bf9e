"""Tensor-parallel (Megatron-style) parameter sharding over ``MODEL_AXIS``.

The reference scales only via data-parallel NCCL DDP
(/root/reference/scripts/sbatch_run.sh:36-42); on TPU the ('data','model')
mesh provides a second ICI axis. These rules column-shard the first matmul
of every transformer FFN / attention-QKV projection and row-shard the
second / attention-output projection, so each transformer block needs
exactly one all-reduce on the 'model' axis per sublayer — inserted by XLA
GSPMD from the *parameter* shardings alone (the jit-of-sharded-inputs
formulation; activations/collectives are derived by sharding propagation,
never hand-scheduled).

Covered parameter families (first match wins):

=====================================  ===========================  ======
path pattern                           kernel layout                shard
=====================================  ===========================  ======
``linear1|fc1 / kernel``               [d_model, ffn]               col(-1)
``linear1|fc1 / bias``                 [ffn]                        col(0)
``self_attn/{query,key,value}/kernel`` [d_model, heads, head_dim]   heads(1)
``self_attn/{query,key,value}/bias``   [heads, head_dim]            heads(0)
``proj_q|proj_k|proj_v / kernel``      [d_model, d_model]           col(-1)
``linear2|fc2 / kernel``               [ffn, d_model]               row(0)
``self_attn/out/kernel``               [heads, head_dim, d_model]   row(0)
``proj_o / kernel``                    [d_model, d_model]           row(0)
=====================================  ===========================  ======

Everything else (LayerNorms, convs, row-parallel biases, embeddings) stays
replicated. A dimension that does not divide the model-axis size falls back
to replicated — TP is always shape-safe to enable.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS, replicate

# (path regex, kernel axis to split over MODEL_AXIS; negative = from the end)
DEFAULT_TP_RULES: Tuple[Tuple[str, int], ...] = (
    (r"(linear1|fc1)/kernel$", -1),
    (r"(linear1|fc1)/bias$", 0),
    (r"self_attn/(query|key|value)/kernel$", 1),
    (r"self_attn/(query|key|value)/bias$", 0),
    (r"proj_[qkv]/kernel$", -1),
    (r"(linear2|fc2)/kernel$", 0),
    (r"self_attn/out/kernel$", 0),
    (r"proj_o/kernel$", 0),
)


def _path_str(path) -> str:
    """Join a tree_util key path into 'a/b/kernel' form for regex matching."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_specs(params, n_model: int,
                rules: Sequence[Tuple[str, int]] = DEFAULT_TP_RULES):
    """PartitionSpec pytree for ``params`` under ``n_model``-way TP.

    Leaves matching a rule get ``MODEL_AXIS`` on the rule's kernel axis when
    that axis size is divisible by ``n_model``; all other leaves (and all
    leaves when ``n_model == 1``) are replicated (``P()``).
    """
    compiled = [(re.compile(rx), ax) for rx, ax in rules]

    def spec(path, leaf):
        if n_model <= 1 or not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return P()
        p = _path_str(path)
        for rx, ax in compiled:
            if rx.search(p):
                axis = ax % leaf.ndim
                if leaf.shape[axis] % n_model == 0:
                    return P(*(MODEL_AXIS if i == axis else None
                               for i in range(leaf.ndim)))
                return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params,
                 rules: Sequence[Tuple[str, int]] = DEFAULT_TP_RULES):
    """device_put a param tree with TP shardings over ``mesh``'s model axis.

    With a 1-wide model axis this is exactly :func:`replicate`. Also apply
    this to the optimizer state: GSPMD does NOT propagate input shardings
    into ``tx.init``'s zeros (value-independent constants come out
    replicated), but moment leaves sit at ``...mu/<param path>`` so the
    ``$``-anchored suffix rules match them directly.
    """
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model <= 1:
        return replicate(mesh, params)
    specs = param_specs(params, n_model, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
