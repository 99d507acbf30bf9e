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

DECISION (final, round 5 — measured on v5e at the production CLEVRER shape
B=64 N=4096 D=128 S=7): the fused kernel is numerically exact and reaches
PARITY with XLA (1.04x after the sublane-softmax layout + concatenated GRU
gates; see the closing STATUS on fused_slot_attention for every variant
tried and why the MXU 8-of-128-lane wall is shared). It is NOT a perf
asset and is NOT the default path for any config: it stays OPT-IN
(``SlotAttention(use_pallas=True)``), exactness-tested in
tests/test_pallas_ops.py so it cannot rot, with exactly one revisit
trigger — a production shape with num_iterations >= 3 or much larger N,
where XLA's per-iteration k/v HBM round-trip (which this kernel removes)
would dominate.
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


# ===========================================================================
# Fully-fused slot attention: ALL iterations + GRU + MLP in one kernel
# ===========================================================================
#
# Why the single-update kernel above loses (0.65x XLA): slot attention is
# bandwidth-bound (arithmetic intensity ~2 FLOP/byte) and XLA already fuses
# softmax into the matmuls, so fusing one update saves nothing — while the
# [TILE, 8] matmuls underutilize the MXU.
#
# What this kernel changes: grid over B only; k/v for one batch element live
# ENTIRELY in VMEM (N=4096 x D=128 f32 = 2 MB each), and the full
# num_iterations loop — q-LN + q-proj, inverted softmax, renormalized
# weighted mean, GRU cell, residual MLP — runs without touching HBM. XLA's
# graph reads k/v from HBM once per ITERATION plus round-trips the [N, S]
# attention; this reads them once per CALL. The slot-side math ([8, D]
# blocks) is negligible FLOPs on the VPU/MXU.
#
# Weight layout matches flax GRUCell (r/z gates: bias on the input Dense,
# none on the hidden; candidate n: biases on both) — see
# runtime/torch_compat.gru_cell for the parametrization notes.

MLP_SUBLANES = 16  # vecs rows (see _VEC_* indices below)
_VEC_QLN_S, _VEC_QLN_B = 0, 1
_VEC_B_IR, _VEC_B_IZ, _VEC_B_IN, _VEC_B_HN = 2, 3, 4, 5
_VEC_MLN_S, _VEC_MLN_B, _VEC_B2 = 6, 7, 8


def _layernorm(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _fused_kernel(
    k_ref, v_ref, slots_ref, wq_ref, gru_ref, w1_ref, w2_ref, vecs_ref,
    b1_ref, slots_out, attn_out, *, num_iterations: int, n_slots: int,
    scale: float, eps: float,
):
    k = k_ref[0]  # [N, D]
    v = v_ref[0]  # [N, D]
    h = slots_ref[0]  # [S_PAD, D]
    vecs = vecs_ref[:]  # [16, D]
    N = k.shape[0]

    # Attention lives as [S_PAD, N]: the slot axis (7-8 valid) sits on
    # SUBLANES so the softmax reduction runs across sublanes while the big
    # N axis fills all 128 VPU lanes. The [N, S_PAD] layout (slots on
    # lanes) pays 16x the exp/VPU cost for the same math — measured 1.2 ms
    # vs 0.86 ms per call at CLEVRER shapes.
    slot_rows = jax.lax.broadcasted_iota(jnp.int32, (S_PAD, N), 0)
    valid = slot_rows < n_slots
    sumv = jnp.sum(v, axis=0, keepdims=True)  # [1, D]
    attn = None
    for _ in range(num_iterations):
        hq = _layernorm(h, vecs[_VEC_QLN_S], vecs[_VEC_QLN_B])
        q = jnp.dot(hq, wq_ref[:], preferred_element_type=jnp.float32) * scale
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_PAD, N]
        logits = jnp.where(valid, logits, -jnp.inf)
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        attn = e / jnp.sum(e, axis=0, keepdims=True)  # [S_PAD, N]
        den = jnp.sum(attn, axis=1)[:, None]  # [S_PAD, 1]
        num = jnp.dot(attn, v, preferred_element_type=jnp.float32)  # [S_PAD, D]
        upd = (num + eps * sumv) / (den + eps * N)

        # GRU cell (flax parametrization); the three gates are computed as
        # two concatenated [S_PAD, D] @ [D, 3D] matmuls — 9 tiny
        # issue-latency-bound matmuls fold into 2.
        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        D = h.shape[-1]
        gi = mm(upd, gru_ref[0])  # [S_PAD, 3D] = [r|z|n] input-side
        gh = mm(h, gru_ref[1])    # [S_PAD, 3D] = [r|z|n] hidden-side
        r = jax.nn.sigmoid(gi[:, :D] + vecs[_VEC_B_IR] + gh[:, :D])
        z = jax.nn.sigmoid(gi[:, D:2 * D] + vecs[_VEC_B_IZ]
                           + gh[:, D:2 * D])
        n = jnp.tanh(gi[:, 2 * D:] + vecs[_VEC_B_IN]
                     + r * (gh[:, 2 * D:] + vecs[_VEC_B_HN]))
        h = (1.0 - z) * n + z * h

        # residual MLP
        hm = _layernorm(h, vecs[_VEC_MLN_S], vecs[_VEC_MLN_B])
        hid = jax.nn.relu(mm(hm, w1_ref[:]) + b1_ref[0])
        h = h + mm(hid, w2_ref[:]) + vecs[_VEC_B2]

    slots_out[0] = h
    attn_out[0] = attn


def _pack_vecs(wp: dict, d: int):
    """Stack all [D]-vectors into one sublane-aligned [16, D] block."""
    order = {
        _VEC_QLN_S: "q_ln_scale", _VEC_QLN_B: "q_ln_bias",
        _VEC_B_IR: "b_ir", _VEC_B_IZ: "b_iz", _VEC_B_IN: "b_in",
        _VEC_B_HN: "b_hn", _VEC_MLN_S: "mlp_ln_scale",
        _VEC_MLN_B: "mlp_ln_bias", _VEC_B2: "b2",
    }
    return jnp.stack([
        jnp.asarray(wp[order[i]], jnp.float32) if i in order
        else jnp.zeros((d,), jnp.float32)
        for i in range(MLP_SUBLANES)
    ])


def _fused_forward(k, v, slots, wp, num_iterations, n_slots, scale, eps,
                   interpret):
    B, N, D = k.shape
    H = wp["w1"].shape[1]
    slots_pad = jnp.pad(slots, ((0, 0), (0, S_PAD - n_slots), (0, 0)))
    gru = jnp.stack([
        jnp.concatenate([jnp.asarray(wp[n], jnp.float32)
                         for n in ("w_ir", "w_iz", "w_in")], axis=1),
        jnp.concatenate([jnp.asarray(wp[n], jnp.float32)
                         for n in ("w_hr", "w_hz", "w_hn")], axis=1),
    ])  # [2, D, 3D] — gate weights concatenated (see kernel comment)
    vecs = _pack_vecs(wp, D)
    b1 = jnp.asarray(wp["b1"], jnp.float32)[None]  # [1, H]

    kernel = functools.partial(
        _fused_kernel, num_iterations=num_iterations, n_slots=n_slots,
        scale=scale, eps=eps,
    )
    const = lambda b: (0, 0)  # noqa: E731 — weights resident across grid steps
    slots_new, attn = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_PAD, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, 3 * D), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((MLP_SUBLANES, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S_PAD, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_PAD, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_PAD, D), jnp.float32),
            jax.ShapeDtypeStruct((B, S_PAD, N), jnp.float32),
        ),
        interpret=interpret,
    )(
        k.astype(jnp.float32), v.astype(jnp.float32), slots_pad,
        jnp.asarray(wp["wq"], jnp.float32), gru,
        jnp.asarray(wp["w1"], jnp.float32), jnp.asarray(wp["w2"], jnp.float32),
        vecs, b1,
    )
    # attn is [B, S_PAD, N] inside the kernel; callers take [B, N, S]
    return slots_new[:, :n_slots], jnp.swapaxes(attn[:, :n_slots], 1, 2)


def fused_reference(k, v, slots, wp, num_iterations, n_slots, scale, eps):
    """jnp twin of the fused kernel (same args) — backward pass + parity."""
    del n_slots
    sumv = jnp.sum(v, axis=1, keepdims=True)
    N = k.shape[1]
    attn = None
    h = slots
    for _ in range(num_iterations):
        hq = _layernorm(h, wp["q_ln_scale"], wp["q_ln_bias"])
        q = hq @ wp["wq"] * scale
        logits = jnp.einsum("bnd,bsd->bns", k, q)
        attn = jax.nn.softmax(logits, axis=-1)
        den = jnp.sum(attn, axis=1)[..., None]
        num = jnp.einsum("bns,bnd->bsd", attn, v)
        upd = (num + eps * sumv) / (den + eps * N)
        r = jax.nn.sigmoid(upd @ wp["w_ir"] + wp["b_ir"] + h @ wp["w_hr"])
        z = jax.nn.sigmoid(upd @ wp["w_iz"] + wp["b_iz"] + h @ wp["w_hz"])
        n = jnp.tanh(upd @ wp["w_in"] + wp["b_in"]
                     + r * (h @ wp["w_hn"] + wp["b_hn"]))
        h = (1.0 - z) * n + z * h
        hm = _layernorm(h, wp["mlp_ln_scale"], wp["mlp_ln_bias"])
        h = h + jax.nn.relu(hm @ wp["w1"] + wp["b1"]) @ wp["w2"] + wp["b2"]
    return h, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_slot_attention(
    k, v, slots, wp, num_iterations: int = 2, n_slots: int = 7,
    scale: float = 1.0, eps: float = 1e-6, interpret: bool = False,
):
    """All slot-attention iterations + GRU + MLP fused in one Pallas call.

    k/v: [B, N, D] (already input-LN'd and projected); slots: [B, S, D]
    init; wp: weight dict (see fused_reference). Returns (slots [B, S, D],
    last-iteration attn [B, N, S]). Gradients: custom_vjp whose backward
    differentiates the identical jnp composition (exact, unfused).

    Eligibility: S <= 8, f32, k/v for one batch element must fit VMEM
    (N*D <= ~512k f32) — callers should fall back to the jnp path otherwise
    (models.slot_attention handles this).

    STATUS (closing, measured on v5e at CLEVRER shapes B=64 N=4096 D=128
    S=7, 2 iterations, 50-rep lax.scan, scalar-sync): 0.84 ms/call vs XLA
    0.87 ms — **1.04x, i.e. parity, not a win**. The op is bound by MXU
    lane underutilization on the [N,128]@[128,8] / [8,N]@[N,128] matmuls
    (8 of 128 output lanes carry slots), a wall XLA shares; the kernel's
    2x HBM-traffic saving (k/v resident in VMEM across both iterations)
    is hidden under that compute floor. Variants measured and rejected:
    slots padded to 128 lanes (16x redundant FLOPs, no gain — softmax VPU
    cost also 16x), bf16 k/v storage (0.72x — Mosaic layout conversions),
    in-kernel bf16 dot casts (elided by Mosaic, no effect). What DID help,
    kept in this kernel: attention laid out [S_PAD, N] so the softmax
    reduces over sublanes with N on lanes (1.2 -> 0.86 ms), and GRU gate
    weights concatenated to [D, 3D] so 9 issue-latency-bound small matmuls
    become 2 (0.86 -> 0.84 ms). Conclusion: XLA is already at the
    speed-of-light for this shape regime; the kernel stays OPT-IN
    (correct, gradient-exact, at-parity) and is NOT advertised as a perf
    asset. It would win where k/v re-reads dominate: more iterations
    (>=3) or larger N where XLA's per-iteration HBM round-trip bites.
    """
    orig = k.dtype
    h, attn = _fused_forward(
        k, v, slots, wp, num_iterations, n_slots, scale, eps, interpret
    )
    return h.astype(orig), attn.astype(orig)


def _fused_fwd(k, v, slots, wp, num_iterations, n_slots, scale, eps, interpret):
    out = fused_slot_attention(
        k, v, slots, wp, num_iterations, n_slots, scale, eps, interpret
    )
    return out, (k, v, slots, wp)


def _fused_bwd(num_iterations, n_slots, scale, eps, interpret, res, cts):
    k, v, slots, wp = res
    _, vjp = jax.vjp(
        lambda a, b, c, w: fused_reference(
            a, b, c, w, num_iterations, n_slots, scale, eps
        ),
        k, v, slots, wp,
    )
    return vjp(cts)


fused_slot_attention.defvjp(_fused_fwd, _fused_bwd)
