"""Fused Pallas TPU kernel for the slot-attention update.

The hot inner loop of SAVi (SURVEY.md §3.1) is, per iteration:

    logits = scale * k @ q^T          # [B, N, S]   (N = H*W pixels)
    attn   = softmax over S           # slots COMPETE for pixels
    attn_w = attn + eps; attn_w /= sum over N
    updates = attn_w^T @ v            # [B, S, D]

XLA materializes the [B, N, S] attention to HBM between these ops. This
kernel fuses all four: k/v stream through VMEM in N-tiles, the softmax is
computed per pixel (S is tiny), and three accumulators carry the
renormalization online:

    num  += (attn^T @ v_tile)         # [S, D]
    den  += sum_n attn                # [S]
    sumv += sum_n v_tile              # [D]    (for the +eps correction)

    updates = (num + eps * sumv) / (den + eps * N)

which is exactly attn_w^T @ v without a second pass. The [N, S] attention is
still written out (tile-local, single store) because STEVE reads it as
segmentation masks.

Training support: ``slot_attention_update`` is a ``jax.custom_vjp`` whose
forward runs this kernel and whose backward differentiates the identical
jnp composition — forward gets the fusion win, gradients stay exact.

STATUS (measured on v5e, B=64 N=4096 D=128 S=7): numerically exact vs XLA
(max diff 2e-4 on updates), but 0.65x XLA's speed — the [TILE, 8] matmuls
underutilize the MXU while XLA fuses the same pattern natively at
~139 GB/s. The kernel is therefore OPT-IN (``SlotAttention(use_pallas=True)``)
and kept as the substrate for future shapes where the fusion wins (larger
slot counts, bf16 flows, multi-iteration fusion).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_PAD = 8  # sublane-aligned slot-count padding


def _kernel(k_ref, v_ref, q_ref, upd_ref, attn_ref, num, den, sumv, *,
            eps: float, n_total: int, n_slots: int):
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        num[:] = jnp.zeros_like(num)
        den[:] = jnp.zeros_like(den)
        sumv[:] = jnp.zeros_like(sumv)

    k = k_ref[0]  # [TILE, D]
    v = v_ref[0]  # [TILE, D]
    q = q_ref[0]  # [S_PAD, D] (padded rows are zero)

    logits = jnp.dot(k, q.T, preferred_element_type=jnp.float32)  # [TILE, S_PAD]
    # mask padded slots out of the softmax
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(slot_ids < n_slots, logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)  # [TILE, S_PAD]
    attn_ref[0] = attn

    num[:] += jnp.dot(attn.T, v, preferred_element_type=jnp.float32)  # [S_PAD, D]
    den[:] += jnp.sum(attn, axis=0, keepdims=True).T  # [S_PAD, 1]
    sumv[:] += jnp.sum(v, axis=0, keepdims=True)  # [1, D]

    @pl.when(t == n_tiles - 1)
    def _():
        upd_ref[0] = (num[:] + eps * sumv[:]) / (den[:] + eps * n_total)


def _pallas_forward(k, v, q, eps: float, tile_n: int, interpret: bool):
    """k/v [B, N, D]; q [B, S, D] already scaled by D**-0.5."""
    B, N, D = k.shape
    S = q.shape[1]
    assert N % tile_n == 0, (N, tile_n)
    q_pad = jnp.pad(q, ((0, 0), (0, S_PAD - S), (0, 0)))

    kernel = functools.partial(
        _kernel, eps=eps, n_total=N, n_slots=S
    )
    grid = (B, N // tile_n)
    updates, attn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, D), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, D), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_PAD, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S_PAD, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, S_PAD), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_PAD, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, S_PAD), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S_PAD, D), jnp.float32),
            pltpu.VMEM((S_PAD, 1), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(k, v, q_pad)
    return updates[:, :S], attn[..., :S]


def _jnp_reference(k, v, q, eps: float):
    """The exact jnp composition (models/slot_attention.py math)."""
    logits = jnp.einsum("bnd,bsd->bns", k, q)
    attn = jax.nn.softmax(logits, axis=-1)
    attn_w = attn + eps
    attn_w = attn_w / jnp.sum(attn_w, axis=1, keepdims=True)
    updates = jnp.einsum("bns,bnd->bsd", attn_w, v)
    return updates, attn


def _pick_tile(n: int) -> int:
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def slot_attention_update(k, v, q, eps: float = 1e-6, interpret: bool = False):
    """Fused (updates, attn) for one slot-attention round.

    k/v: [B, N, D] projected inputs; q: [B, S, D] ALREADY scaled by D**-0.5.
    Returns updates [B, S, D] (renormalized weighted mean) and the raw
    softmax attention [B, N, S].
    """
    orig_dtype = k.dtype
    upd, attn = _pallas_forward(
        k.astype(jnp.float32), v.astype(jnp.float32), q.astype(jnp.float32),
        eps, _pick_tile(k.shape[1]), interpret,
    )
    return upd.astype(orig_dtype), attn.astype(orig_dtype)


def _fwd(k, v, q, eps, interpret):
    out = slot_attention_update(k, v, q, eps, interpret)
    return out, (k, v, q)


def _bwd(eps, interpret, res, cts):
    k, v, q = res
    _, vjp = jax.vjp(lambda a, b, c: _jnp_reference(a, b, c, eps), k, v, q)
    return vjp(cts)


slot_attention_update.defvjp(_fwd, _bwd)
