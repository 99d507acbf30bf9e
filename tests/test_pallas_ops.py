"""Pallas kernel tests (interpret mode on CPU; real compile covered by the
TPU drive in bench/verification)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotformer_tpu.ops.slot_attention_kernel import (
    _jnp_reference,
    slot_attention_update,
)


def _inputs(B=2, N=64, D=128, S=7, seed=0):
    rng = np.random.default_rng(seed)
    k = rng.normal(size=(B, N, D)).astype(np.float32)
    v = rng.normal(size=(B, N, D)).astype(np.float32)
    q = (rng.normal(size=(B, S, D)) * D**-0.5).astype(np.float32)
    return jnp.asarray(k), jnp.asarray(v), jnp.asarray(q)


def test_fused_kernel_matches_reference():
    k, v, q = _inputs()
    upd, attn = slot_attention_update(k, v, q, 1e-6, True)
    ref_upd, ref_attn = _jnp_reference(k, v, q, 1e-6)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd), np.asarray(ref_upd),
                               rtol=1e-4, atol=1e-4)


def test_fused_kernel_odd_slot_count():
    # S=5 exercises the S_PAD masking
    k, v, q = _inputs(S=5, N=32)
    upd, attn = slot_attention_update(k, v, q, 1e-6, True)
    ref_upd, ref_attn = _jnp_reference(k, v, q, 1e-6)
    assert upd.shape == (2, 5, 128) and attn.shape == (2, 32, 5)
    np.testing.assert_allclose(np.asarray(upd), np.asarray(ref_upd),
                               rtol=1e-4, atol=1e-4)
    # softmax over the real slots sums to 1 (padded slots masked out)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)


def test_fused_kernel_gradients_match_reference():
    k, v, q = _inputs(N=32)

    def loss_pallas(k, v, q):
        upd, attn = slot_attention_update(k, v, q, 1e-6, True)
        return (upd**2).sum() + (attn**3).sum()

    def loss_ref(k, v, q):
        upd, attn = _jnp_reference(k, v, q, 1e-6)
        return (upd**2).sum() + (attn**3).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(k, v, q)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(k, v, q)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
