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


# ---------------------------------------------------------------------------
# Whole-loop fused kernel (iterations + GRU + MLP)
# ---------------------------------------------------------------------------

def _wp(D=16, H=32, seed=1):
    rng = np.random.default_rng(seed)
    r = lambda *s: (rng.normal(size=s) * 0.3).astype(np.float32)
    return dict(
        q_ln_scale=1 + 0.1 * r(D), q_ln_bias=0.1 * r(D), wq=r(D, D),
        w_ir=r(D, D), w_iz=r(D, D), w_in=r(D, D),
        w_hr=r(D, D), w_hz=r(D, D), w_hn=r(D, D),
        b_ir=0.1 * r(D), b_iz=0.1 * r(D), b_in=0.1 * r(D), b_hn=0.1 * r(D),
        mlp_ln_scale=1 + 0.1 * r(D), mlp_ln_bias=0.1 * r(D),
        w1=r(D, H), b1=0.1 * r(H), w2=r(H, D), b2=0.1 * r(D),
    )


@pytest.mark.slow
def test_whole_loop_fused_kernel_matches_reference():
    from slotformer_tpu.ops import fused_reference, fused_slot_attention

    rng = np.random.default_rng(0)
    B, N, D, S = 2, 48, 16, 5
    k = rng.normal(size=(B, N, D)).astype(np.float32)
    v = rng.normal(size=(B, N, D)).astype(np.float32)
    slots = rng.normal(size=(B, S, D)).astype(np.float32)
    wp = _wp(D)
    scale = D**-0.5
    h, attn = fused_slot_attention(k, v, slots, wp, 2, S, scale, 1e-6, True)
    rh, rattn = fused_reference(k, v, slots, wp, 2, S, scale, 1e-6)
    assert h.shape == (B, S, D) and attn.shape == (B, N, S)
    np.testing.assert_allclose(np.asarray(h), np.asarray(rh),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(rattn),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda *a: (fn(*a)[0] ** 2).mean() + (fn(*a)[1] ** 3).mean()

    g_p = jax.grad(
        loss(lambda a, b, c, w: fused_slot_attention(a, b, c, w, 2, S, scale,
                                                     1e-6, True)),
        argnums=(0, 1, 2, 3),
    )(k, v, slots, wp)
    g_r = jax.grad(
        loss(lambda a, b, c, w: fused_reference(a, b, c, w, 2, S, scale, 1e-6)),
        argnums=(0, 1, 2, 3),
    )(k, v, slots, wp)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_slot_attention_module_use_pallas_parity():
    """SlotAttention(use_pallas=True) == use_pallas=False, values + grads,
    through the real flax module (fused path engaged post-init)."""
    from slotformer_tpu.models.slot_attention import (
        SlotAttention,
        SlotAttentionWMask,
    )

    rng = np.random.default_rng(3)
    B, N, D, S = 2, 40, 16, 4
    inputs = rng.normal(size=(B, N, 12)).astype(np.float32)
    slots = rng.normal(size=(B, S, D)).astype(np.float32)
    kw = dict(in_features=12, num_iterations=2, num_slots=S, slot_size=D,
              mlp_hidden_size=32)
    m_ref = SlotAttention(**kw)
    m_pal = SlotAttention(**kw, use_pallas=True)
    params = m_ref.init(jax.random.PRNGKey(0), inputs, slots)["params"]
    out_ref = m_ref.apply({"params": params}, inputs, slots)
    out_pal = m_pal.apply({"params": params}, inputs, slots)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)

    def loss(m):
        def f(p):
            return (m.apply({"params": p}, inputs, slots) ** 2).mean()
        return f

    g_ref = jax.grad(loss(m_ref))(params)
    g_pal = jax.grad(loss(m_pal))(params)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # mask-returning variant too (STEVE path)
    mw_ref = SlotAttentionWMask(**kw)
    mw_pal = SlotAttentionWMask(**kw, use_pallas=True)
    s_ref, a_ref = mw_ref.apply({"params": params}, inputs, slots)
    s_pal, a_pal = mw_pal.apply({"params": params}, inputs, slots)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref),
                               rtol=1e-4, atol=1e-5)
