"""Model unit tests: slot attention math, predictors, SAVi, SlotFormer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotformer_tpu.models import (
    SingleStepSlotFormer,
    SlotAttention,
    SlotAttentionWMask,
    SlotFormer,
    StoSAVi,
    get_sin_pos_enc,
)
from slotformer_tpu.runtime import graft


RNG = jax.random.PRNGKey(0)


# ---------------------------------------------------------------- helpers
def tiny_savi(kld="var-0.01", pred_rnn=False, pred_type="mlp", res=32):
    return StoSAVi(
        resolution=(res, res),
        clip_len=4,
        slot_dict=dict(
            num_slots=4, slot_size=16, slot_mlp_size=32, num_iterations=2,
            kernel_mlp=False,
        ),
        enc_dict=dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16),
        dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(8, 8), dec_ks=3),
        pred_dict=dict(
            pred_type=pred_type, pred_rnn=pred_rnn, pred_norm_first=True,
            pred_num_layers=1, pred_num_heads=2, pred_ffn_dim=32,
            pred_sg_every=None,
        ),
        loss_dict=dict(use_post_recon_loss=True, kld_method=kld),
    )


def tiny_slotformer(use_img=False, history=3, rollout=4):
    return SlotFormer(
        resolution=(16, 16),
        slot_dict=dict(num_slots=4, slot_size=16),
        dec_dict=dict(dec_channels=(16, 8), dec_resolution=(16, 16), dec_ks=3),
        rollout_dict=dict(
            num_slots=4, slot_size=16, history_len=history, t_pe="sin",
            d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
        ),
        loss_dict=dict(rollout_len=rollout, use_img_recon_loss=use_img),
    )


# ------------------------------------------------------------ phase deconv
# (5,1): s=1 fallback; (4,2): even-k fallback (torch output is s*H-1 there)
@pytest.mark.parametrize("mode", [1, 2])
@pytest.mark.parametrize("k,s,h", [(5, 2, 8), (3, 2, 5), (5, 1, 6), (4, 2, 7),
                                   (5, 3, 6), (7, 2, 5)])
@pytest.mark.slow
def test_phase_deconv_matches_dilated(k, s, h, mode):
    """The phase decompositions of the transposed conv (mode 1 = s*s
    separate convs, mode 2 = one conv + depth-to-space) are the same
    function as XLA's input-dilated lowering (forward AND backward), with
    an identical parameter tree."""
    from slotformer_tpu.models.nn import DeconvNormAct

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, h, h, 6), jnp.float32)
    dense = DeconvNormAct(5, kernel_size=k, stride=s, act="", phase=False)
    phased = DeconvNormAct(5, kernel_size=k, stride=s, act="", phase=mode)
    params = dense.init(rng, x)
    assert jax.tree.structure(params) == jax.tree.structure(
        phased.init(rng, x)
    )

    y_dense, g_dense = jax.value_and_grad(
        lambda p, xx: (dense.apply(p, xx) ** 2).sum(), argnums=(0, 1)
    )(params, x)
    y_phase, g_phase = jax.value_and_grad(
        lambda p, xx: (phased.apply(p, xx) ** 2).sum(), argnums=(0, 1)
    )(params, x)
    out_d = dense.apply(params, x)
    out_p = phased.apply(params, x)
    if k % 2:  # even k falls back (torch output is s*H-1 there)
        assert out_d.shape == (2, s * h, s * h, 5)
    assert out_p.shape == out_d.shape
    np.testing.assert_allclose(out_p, out_d, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(y_phase, y_dense, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_phase), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(a, b, atol=3e-4, rtol=1e-4)


def test_phase_deconv_defaults_off(monkeypatch):
    """SF_PHASE_DECONV unset -> the dense (input-dilated) lowering runs.
    Pins the round-4 fix: the phase forward + dense-VJP backward measured
    0.51x decode / 0.46x SlotFormer-train (logs/phase_deconv_probe_vjp.log)
    and shipping it ON halved the round-3 driver bench."""
    from slotformer_tpu.models.nn import DeconvNormAct

    monkeypatch.delenv("SF_PHASE_DECONV", raising=False)
    x = jnp.zeros((1, 4, 4, 3))
    m = DeconvNormAct(4, kernel_size=5, stride=2)
    p = m.init(RNG, x)
    bound = m.bind(p)
    assert bound._phase_mode(x) == 0
    monkeypatch.setenv("SF_PHASE_DECONV", "1")
    assert bound._phase_mode(x) == 1
    monkeypatch.setenv("SF_PHASE_DECONV", "2")
    assert bound._phase_mode(x) == 2


# ------------------------------------------------------------ slot attention
def manual_slot_attention(params, inputs, slots, num_iters=2, eps=1e-6):
    """Reference math in pure numpy (savi.py:56-102)."""

    def ln(x, scale, bias):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * scale + bias

    p = jax.tree.map(np.asarray, params)
    x = ln(inputs, p["norm_inputs"]["scale"], p["norm_inputs"]["bias"])
    k = x @ p["project_k"]["kernel"]
    v = x @ p["project_v"]["kernel"]
    D = slots.shape[-1]
    for _ in range(num_iters):
        prev = slots
        q = ln(slots, p["project_q_norm"]["scale"], p["project_q_norm"]["bias"])
        q = q @ p["project_q"]["kernel"]
        logits = (D**-0.5) * np.einsum("bnd,bsd->bns", k, q)
        attn = np.exp(logits - logits.max(-1, keepdims=True))
        attn = attn / attn.sum(-1, keepdims=True)
        attn = attn + eps
        attn = attn / attn.sum(1, keepdims=True)
        updates = np.einsum("bns,bnd->bsd", attn, v)
        # flax GRUCell: r,z gates with sigmoid, candidate n with tanh
        gp = p["gru"]
        def dense(x, w, b=None):
            out = x @ w["kernel"]
            return out + w.get("bias", 0.0) if b is None else out
        r = _sigmoid(updates @ gp["ir"]["kernel"] + gp["ir"]["bias"] + prev @ gp["hr"]["kernel"])
        z = _sigmoid(updates @ gp["iz"]["kernel"] + gp["iz"]["bias"] + prev @ gp["hz"]["kernel"])
        n = np.tanh(updates @ gp["in"]["kernel"] + gp["in"]["bias"] + r * (prev @ gp["hn"]["kernel"] + gp["hn"]["bias"]))
        slots = (1.0 - z) * n + z * prev
        h = ln(slots, p["mlp_norm"]["scale"], p["mlp_norm"]["bias"])
        h = np.maximum(h @ p["mlp_hidden"]["kernel"] + p["mlp_hidden"]["bias"], 0)
        slots = slots + h @ p["mlp_out"]["kernel"] + p["mlp_out"]["bias"]
    return slots


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_slot_attention_matches_manual_math():
    sa = SlotAttention(
        in_features=8, num_iterations=2, num_slots=3, slot_size=16,
        mlp_hidden_size=32,
    )
    inputs = jax.random.normal(jax.random.PRNGKey(1), (2, 25, 8))
    slots0 = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16))
    variables = sa.init(RNG, inputs, slots0)
    out = sa.apply(variables, inputs, slots0)
    ref = manual_slot_attention(
        variables["params"], np.asarray(inputs), np.asarray(slots0)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_slot_attention_mask_variant():
    sa = SlotAttentionWMask(
        in_features=8, num_iterations=2, num_slots=3, slot_size=16,
        mlp_hidden_size=32,
    )
    inputs = jax.random.normal(jax.random.PRNGKey(1), (2, 25, 8))
    slots0 = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16))
    variables = sa.init(RNG, inputs, slots0)
    slots, masks = sa.apply(variables, inputs, slots0)
    assert slots.shape == (2, 3, 16)
    assert masks.shape == (2, 3, 25)
    # attention over slots sums to 1 pixel-wise
    np.testing.assert_allclose(np.asarray(masks.sum(1)), 1.0, rtol=1e-5)


def test_sin_pos_enc_matches_reference_formula():
    """Reverse-ordered sinusoidal PE (slotformer.py:10-16)."""
    pe = get_sin_pos_enc(5, 8)
    assert pe.shape == (1, 5, 8)
    inv_freq = 1.0 / (10000 ** (np.arange(0, 8, 2) / 8))
    # last position corresponds to pos_seq value 0 -> sin=0, cos=1
    np.testing.assert_allclose(pe[0, -1, :4], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, -1, 4:], 1.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, 0, :4], np.sin(4 * inv_freq), rtol=1e-5)


# ------------------------------------------------------------------- StoSAVi
@pytest.mark.parametrize("kld,pred_rnn", [("var-0.01", False), ("none", True)])
@pytest.mark.slow
def test_stosavi_forward_shapes(kld, pred_rnn):
    model = tiny_savi(kld=kld, pred_rnn=pred_rnn, pred_type="transformer" if pred_rnn else "mlp")
    batch = {"img": jnp.zeros((2, 4, 32, 32, 3))}
    variables = model.init({"params": RNG, "sample": RNG}, batch)
    out = model.apply(variables, batch, rngs={"sample": RNG})
    assert out["post_slots"].shape == (2, 4, 4, 16)
    assert out["kernel_dist"].shape == (2, 4, 4, 32)
    assert out["post_recon_combined"].shape == (2, 4, 32, 32, 3)
    assert out["post_masks"].shape == (2, 4, 4, 32, 32, 1)
    # masks normalized over slots
    np.testing.assert_allclose(
        np.asarray(out["post_masks"]).sum(2), 1.0, rtol=1e-5
    )
    losses = model.apply(
        variables, batch, method="train_loss", rngs={"sample": RNG, "dropout": RNG}
    )
    assert set(losses) == {"kld_loss", "post_recon_loss"}
    if kld == "none":
        assert float(losses["kld_loss"]) == 0.0
    assert np.isfinite(float(losses["post_recon_loss"]))


@pytest.mark.slow
def test_stosavi_temporal_recurrence_uses_predictor():
    """Slots at t>0 must depend on slots at t-1 (recurrence, savi.py:393-410)."""
    model = tiny_savi(kld="none")
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 32, 32, 3))
    variables = model.init({"params": RNG}, {"img": img})

    def encode(img):
        return model.apply(variables, img, method="encode")[1]

    slots = encode(img)
    # change frame 1 only: slots at t=0 unchanged, t=1,2 change
    img2 = img.at[:, 1].add(1.0)
    slots2 = encode(img2)
    np.testing.assert_allclose(slots[:, 0], slots2[:, 0], atol=1e-6)
    assert np.abs(np.asarray(slots[:, 1] - slots2[:, 1])).max() > 1e-4
    assert np.abs(np.asarray(slots[:, 2] - slots2[:, 2])).max() > 1e-5


def test_stosavi_chunked_encode_carry():
    """Chunked encoding with slot carry must match one-shot encoding
    (replaces the reference's OOM-adaptive chunking, savi.py:421-463)."""
    model = tiny_savi(kld="none")  # deterministic for exactness
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 32, 32, 3))
    variables = model.init({"params": RNG}, {"img": img})

    _, full, _, _, _ = model.apply(variables, img, method="encode")
    _, s1, _, _, carry = model.apply(variables, img[:, :3], method="encode")
    slots_c, pred_state = carry
    _, s2, _, _, _ = model.apply(
        variables, img[:, 3:], slots_c, pred_state, method="encode"
    )
    chunked = jnp.concatenate([s1, s2], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)


@pytest.mark.parametrize("use_vid_len,chunk", [(False, 0), (True, 0),
                                               (False, 4), (True, 4)])
def test_frozen_decoder_custom_bwd_matches_autodiff(use_vid_len, chunk):
    """dec_custom_bwd (bool relu-mask residuals + linear_transpose backward,
    ops/frozen_decoder_loss.py) computes the SAME img-recon loss AND the
    same d(loss)/d(rollouter params) as the plain autodiff path — gradients
    are analytically exact, tolerances cover float reassociation only."""
    def build(**ld):
        return SlotFormer(
            resolution=(16, 16),
            slot_dict=dict(num_slots=4, slot_size=16),
            dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4),
                          dec_ks=3),
            rollout_dict=dict(
                num_slots=4, slot_size=16, history_len=3, t_pe="sin",
                d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
            ),
            loss_dict=dict(rollout_len=4, use_img_recon_loss=True,
                           dropout=0.0, **ld),
        )

    plain = build(dec_chunk_frames=0)
    # chunk=4 -> 2 scanned chunks of the custom loss (B*T_ro = 8 frames)
    custom = build(dec_custom_bwd=True, dec_chunk_frames=chunk)
    batch = {
        "slots": jax.random.normal(RNG, (2, 7, 4, 16)),
        "img": jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16, 16, 3)),
    }
    if use_vid_len:
        batch["vid_len"] = jnp.array([5, 7], jnp.int32)
    variables = plain.init(RNG, batch)
    kw = dict(method="train_loss", rngs={"dropout": jax.random.PRNGKey(5)})

    def total(model):
        def f(p):
            ld = model.apply({"params": p}, batch, **kw)
            return ld["img_recon_loss"] + ld["slot_recon_loss"], ld
        return f

    (l_p, ld_p), g_p = jax.value_and_grad(total(plain), has_aux=True)(
        variables["params"])
    (l_c, ld_c), g_c = jax.value_and_grad(total(custom), has_aux=True)(
        variables["params"])
    tol = 2e-5 if use_vid_len else 1e-6  # eps-in-denominator differs
    np.testing.assert_allclose(
        float(ld_c["img_recon_loss"]), float(ld_p["img_recon_loss"]),
        rtol=tol)
    # rollouter grads (the trained subtree) must match through the custom
    # backward; decoder grads are zero on the custom path by construction
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_p["rollouter"]),
        jax.tree_util.tree_leaves_with_path(g_c["rollouter"]),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6,
            err_msg=str(kp))
    for leaf in jax.tree_util.tree_leaves(g_c["decoder"]):
        assert float(jnp.abs(leaf).max()) == 0.0


def _tiny_dec_params_and_cfg(key):
    """Hand-built decoder param tree matching ops/frozen_decoder_loss's
    expected layout (pos_embedding/dense, deconv_i/ConvTranspose_0
    [kH,kW,out,in] kernels, out_conv HWIO)."""
    cfg = ((16, 8, 8), (4, 4), (16, 16), 3)
    n = lambda i, shape: (  # noqa: E731
        jax.random.normal(jax.random.fold_in(key, i), shape) * 0.3)
    params = {
        "pos_embedding": {"dense": {"kernel": n(0, (4, 16)),
                                    "bias": n(1, (16,))}},
        "deconv_0": {"ConvTranspose_0": {"kernel": n(2, (3, 3, 8, 16)),
                                         "bias": n(3, (8,))}},
        "deconv_1": {"ConvTranspose_0": {"kernel": n(4, (3, 3, 8, 8)),
                                         "bias": n(5, (8,))}},
        "out_conv": {"kernel": n(6, (1, 1, 8, 4)), "bias": n(7, (4,))},
    }
    return params, cfg


def test_frozen_decoder_loss_w_denom_cotangents_exact():
    """frozen_decoder_recon_loss returns EXACT cotangents for the frame
    weights w and the normalizer denom (not silent zeros) — a caller with
    learnable frame weights (e.g. curriculum weighting) gets correct
    grads. Checked against plain autodiff of the same math through the
    non-custom forward."""
    from slotformer_tpu.ops.frozen_decoder_loss import (
        _decode_fwd, frozen_decoder_recon_loss)

    params, cfg = _tiny_dec_params_and_cfg(jax.random.PRNGKey(11))
    S, D = 4, 16
    F, H, W = 3, 16, 16
    slots = jax.random.normal(jax.random.PRNGKey(12), (F, S, D))
    gt = jax.random.normal(jax.random.PRNGKey(13), (F, H, W, 3))
    w = jnp.asarray([1.0, 0.5, 2.0], jnp.float32)
    denom = jnp.asarray(1234.5, jnp.float32)

    def plain(slots_, gt_, w_, denom_):
        out, _ = _decode_fwd(params, slots_.reshape(-1, D), cfg)
        out = out.reshape(F, S, H, W, 4)
        m = jax.nn.softmax(out[..., 3], axis=1)
        recon = jnp.einsum("fshw,fshwc->fhwc", m, out[..., :3])
        sse = (((recon - gt_) ** 2).sum(axis=(1, 2, 3)) * w_).sum()
        return sse / denom_

    def custom(slots_, gt_, w_, denom_):
        return frozen_decoder_recon_loss(
            params, slots_, gt_, w_, denom_, cfg, S)

    g_plain = jax.grad(plain, argnums=(0, 1, 2, 3))(slots, gt, w, denom)
    g_custom = jax.grad(custom, argnums=(0, 1, 2, 3))(slots, gt, w, denom)
    for name, a, b in zip(("slots", "gt", "w", "denom"), g_plain, g_custom):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-5, atol=1e-7,
            err_msg=name)
    # w/denom grads are genuinely nonzero — the old code returned zeros
    assert float(jnp.abs(g_custom[2]).max()) > 1e-6
    assert float(jnp.abs(g_custom[3]).max()) > 1e-9


def test_frozen_decoder_loss_bf16_amp():
    """Under AMP (bf16 params/slots/gt), the op computes the SSE reduction
    in f32 (parity with _bf16_img_recon_loss's upcast) and returns
    cotangents in the primal dtypes (custom_vjp requires the match)."""
    from slotformer_tpu.ops.frozen_decoder_loss import (
        frozen_decoder_recon_loss)

    params, cfg = _tiny_dec_params_and_cfg(jax.random.PRNGKey(21))
    S, D, F, H, W = 4, 16, 3, 16, 16
    slots = jax.random.normal(jax.random.PRNGKey(22), (F, S, D))
    gt = jax.random.normal(jax.random.PRNGKey(23), (F, H, W, 3))
    w = jnp.ones((F,), jnp.float32)
    denom = jnp.asarray(float(F * H * W * 3), jnp.float32)

    def loss(p, s, g_, w_):
        return frozen_decoder_recon_loss(p, s, g_, w_, denom, cfg, S)

    l32, g32 = jax.value_and_grad(loss, argnums=(1, 2))(
        params, slots, gt, w)
    from slotformer_tpu.runtime import to_bf16 as bf
    l16, g16 = jax.value_and_grad(loss, argnums=(1, 2))(
        bf(params), bf(slots), bf(gt), w)
    assert l16.dtype == jnp.float32  # reduction upcast, not bf16
    assert g16[0].dtype == jnp.bfloat16 and g16[1].dtype == jnp.bfloat16
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(g16[0], np.float32), np.asarray(g32[0]),
        rtol=0.2, atol=0.02)


@pytest.mark.parametrize("pred_rnn", [False, True])
def test_stosavi_bf16_train_loss_scan_carry(pred_rnn):
    """AMP regression (round-4 crash): with all-f32 params cast to bf16 (the
    trainer's use_fp16 policy), the temporal nn.scan carry must stay
    dtype-stable — init_pred_state's f32 zeros used to promote the LSTM
    output (and the slots flowing through it) back to f32, and lax.scan
    rejected the carry. Covers both RNN-wrapped and stateless predictors."""
    model = tiny_savi(kld="var-0.01", pred_rnn=pred_rnn, pred_type="transformer")
    batch = {"img": jax.random.normal(jax.random.PRNGKey(7), (2, 3, 32, 32, 3))}
    variables = model.init({"params": RNG, "sample": RNG}, batch)
    from slotformer_tpu.runtime import to_bf16 as bf  # THE trainer cast
    losses = model.apply(
        {"params": bf(variables["params"])}, bf(batch), method="train_loss",
        rngs={"sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    for k, v in losses.items():
        assert v.dtype == jnp.bfloat16, (k, v.dtype)
        assert np.isfinite(float(v)), (k, float(v))


def test_savi_kld_loss_value():
    """KLD vs fixed-sigma prior: at log_var == kld_log_var the KLD is 0."""
    import math

    model = tiny_savi(kld="var-0.01")
    batch = {"img": jnp.zeros((1, 2, 32, 32, 3))}
    variables = model.init({"params": RNG, "sample": RNG}, batch)
    D = 16
    mu = jnp.ones((1, 2, 4, D))
    log_var = jnp.full((1, 2, 4, D), math.log(0.01))
    kd = jnp.concatenate([mu, log_var], -1)
    kld = model.apply(variables, kd, method="_kld_loss")
    assert float(kld) == pytest.approx(0.0, abs=1e-5)


# ---------------------------------------------------------------- SlotFormer
def test_slotformer_rollout_shapes_and_loss():
    model = tiny_slotformer(use_img=True)
    batch = {
        "slots": jax.random.normal(RNG, (2, 7, 4, 16)),
        "img": jnp.zeros((2, 7, 16, 16, 3)),
    }
    variables = model.init(RNG, batch)
    out = model.apply(variables, batch)
    assert out["pred_slots"].shape == (2, 4, 4, 16)
    assert out["recon_combined"].shape == (2, 4, 16, 16, 3)
    losses = model.apply(variables, batch, method="train_loss", rngs={"dropout": RNG})
    assert set(losses) == {"slot_recon_loss", "img_recon_loss"}


def test_slotformer_chunked_img_recon_matches_unchunked():
    """dec_chunk_frames chunked decode-loss path == whole-batch path, with
    and without vid_len masking (dropout 0 so both paths are rng-free)."""
    from slotformer_tpu.models.slotformer import _pick_chunks

    def build(chunk_frames):
        return SlotFormer(
            resolution=(16, 16),
            slot_dict=dict(num_slots=4, slot_size=16),
            dec_dict=dict(dec_channels=(16, 8), dec_resolution=(16, 16),
                          dec_ks=3),
            rollout_dict=dict(num_slots=4, slot_size=16, history_len=3,
                              t_pe="sin", d_model=16, num_layers=1,
                              num_heads=2, ffn_dim=32, dropout=0.0),
            loss_dict=dict(rollout_len=4, use_img_recon_loss=True,
                           dec_chunk_frames=chunk_frames),
        )

    base = build(0)  # chunking disabled
    chunked = build(2)  # 2 frames/chunk over B*T_ro = 8 frames
    assert _pick_chunks(8, 2) == 4
    batch = {
        "slots": jax.random.normal(RNG, (2, 7, 4, 16)),
        "img": jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16, 16, 3)),
    }
    variables = base.init(RNG, batch)
    kw = dict(method="train_loss", rngs={"dropout": jax.random.PRNGKey(5)})
    for extra in ({}, {"vid_len": jnp.array([5, 7])}):
        b = dict(batch, **extra)
        l_ref = base.apply(variables, b, **kw)
        l_chk = chunked.apply(variables, b, **kw)
        assert set(l_ref) == set(l_chk)
        for k in l_ref:
            np.testing.assert_allclose(
                np.asarray(l_ref[k]), np.asarray(l_chk[k]), rtol=2e-5,
                err_msg=f"{k} {sorted(extra)}")


def test_slotformer_bf16_img_recon_matches_f32():
    """dec_recon_bf16 whole-batch bf16 decode-loss == the f32 path to bf16
    precision, with and without vid_len masking; grads still reach the
    rollouter. Params are identical trees (same init through __call__)."""

    def build(**ld):
        return SlotFormer(
            resolution=(16, 16),
            slot_dict=dict(num_slots=4, slot_size=16),
            dec_dict=dict(dec_channels=(16, 8), dec_resolution=(16, 16),
                          dec_ks=3),
            rollout_dict=dict(num_slots=4, slot_size=16, history_len=3,
                              t_pe="sin", d_model=16, num_layers=1,
                              num_heads=2, ffn_dim=32, dropout=0.0),
            loss_dict=dict(rollout_len=4, use_img_recon_loss=True,
                           dec_chunk_frames=0, **ld),
        )

    base = build()
    bf16 = build(dec_recon_bf16=True)
    batch = {
        "slots": jax.random.normal(RNG, (2, 7, 4, 16)),
        "img": jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16, 16, 3)),
    }
    variables = bf16.init(RNG, batch)  # init must route through f32 paths
    kw = dict(method="train_loss", rngs={"dropout": jax.random.PRNGKey(5)})
    for extra in ({}, {"vid_len": jnp.array([5, 7])}):
        b = dict(batch, **extra)
        l_ref = base.apply(variables, b, **kw)
        l_16 = bf16.apply(variables, b, **kw)
        assert set(l_ref) == set(l_16)
        for k in l_ref:
            tol = 3e-2 if k == "img_recon_loss" else 2e-5
            np.testing.assert_allclose(
                np.asarray(l_ref[k]), np.asarray(l_16[k]), rtol=tol,
                err_msg=f"{k} {sorted(extra)}")

    def total(p):
        ld = bf16.apply({"params": p}, batch, **kw)
        return sum(jnp.asarray(v) for v in ld.values())

    g = jax.grad(total)(variables["params"])
    gnorm = float(
        sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(g["rollouter"]))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_slotformer_autoregressive_dependency():
    """Prediction t depends on predictions < t (window slides)."""
    model = tiny_slotformer(use_img=False, history=3, rollout=1)
    slots = jax.random.normal(RNG, (1, 4, 4, 16))
    variables = model.init(RNG, {"slots": slots})
    # rollout 3 steps from the same 3-frame history
    preds = model.apply(variables, slots[:, :3], 3, method="rollout")
    # step 1 from shifted history [s1, s2, p0] must equal what the scan did
    hist2 = jnp.concatenate([slots[:, 1:3], preds[:, :1]], axis=1)
    p1_manual = model.apply(variables, hist2, 1, method="rollout")
    np.testing.assert_allclose(
        np.asarray(preds[:, 1]), np.asarray(p1_manual[:, 0]), atol=1e-5
    )


def test_slotformer_loss_decay_weighting():
    model = tiny_slotformer()
    slots = jax.random.normal(RNG, (2, 7, 4, 16))
    batch = {"slots": slots}
    variables = model.init(RNG, batch)
    l_flat = model.apply(variables, batch, method="train_loss", rngs={"dropout": RNG},
                         loss_decay_factor=1.0)
    l_decay = model.apply(variables, batch, method="train_loss", rngs={"dropout": RNG},
                          loss_decay_factor=0.5)
    assert float(l_flat["slot_recon_loss"]) != float(l_decay["slot_recon_loss"])


def test_slotformer_vid_len_masking():
    """Zero-padded PHYRE clips only count valid frames (slotformer.py:306-318)."""
    model = tiny_slotformer(history=3, rollout=4)
    slots = jax.random.normal(RNG, (2, 7, 4, 16))
    variables = model.init(RNG, {"slots": slots})
    out = model.apply(variables, {"slots": slots})
    full = model.apply(variables, {"slots": slots}, out, method="calc_train_loss")
    # vid_len = 7 for both -> same as unmasked
    vl = np.array([7, 7])
    masked_full = model.apply(
        variables, {"slots": slots, "vid_len": vl}, out, method="calc_train_loss"
    )
    np.testing.assert_allclose(
        float(full["slot_recon_loss"]), float(masked_full["slot_recon_loss"]),
        rtol=1e-5,
    )
    # vid_len = 3: sample 0 contributes nothing
    vl2 = np.array([3, 7])
    masked = model.apply(
        variables, {"slots": slots, "vid_len": vl2}, out, method="calc_train_loss"
    )
    err = np.asarray((out["pred_slots"] - out["gt_slots"]) ** 2)
    expect = err[1].mean()  # only sample 1, all 4 steps valid
    np.testing.assert_allclose(float(masked["slot_recon_loss"]), expect, rtol=1e-4)


def test_decoder_graft_savi_to_slotformer():
    """SlotFormer must reproduce SAVi's decoder output after grafting
    (frozen-decoder contract, slotformer.py:196-218)."""
    savi = tiny_savi()
    batch = {"img": jnp.zeros((1, 2, 32, 32, 3))}
    savi_vars = savi.init({"params": RNG, "sample": RNG}, batch)

    sf = SlotFormer(
        resolution=(32, 32),
        slot_dict=dict(num_slots=4, slot_size=16),
        dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(8, 8), dec_ks=3),
        rollout_dict=dict(
            num_slots=4, slot_size=16, history_len=3, t_pe="sin",
            d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
        ),
        loss_dict=dict(rollout_len=2, use_img_recon_loss=False),
    )
    sf_batch = {"slots": jnp.zeros((1, 5, 4, 16))}
    sf_vars = sf.init(RNG, sf_batch)
    grafted = graft(sf_vars["params"], savi_vars["params"], {"decoder": "decoder"})

    slots = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 16))
    rec_savi = savi.apply(savi_vars, slots, method="decode")[0]
    rec_sf = SlotFormer.apply(sf, {"params": grafted}, slots, method="decode")[0]
    np.testing.assert_allclose(np.asarray(rec_savi), np.asarray(rec_sf), atol=1e-6)


def test_single_step_rollouter_growing_context():
    model = SingleStepSlotFormer(
        resolution=(16, 16),
        slot_dict=dict(num_slots=3, slot_size=16),
        dec_dict=dict(dec_channels=(16, 8), dec_resolution=(16, 16), dec_ks=3),
        rollout_dict=dict(
            num_slots=3, slot_size=16, history_len=1, cond_len=3, t_pe="sin",
            d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
        ),
        loss_dict=dict(rollout_len=5, use_img_recon_loss=False),
    )
    batch = {"slots": jax.random.normal(RNG, (2, 6, 3, 16))}
    variables = model.init(RNG, batch)
    out = model.apply(variables, batch)
    assert out["pred_slots"].shape == (2, 5, 3, 16)
    assert np.isfinite(np.asarray(out["pred_slots"])).all()
