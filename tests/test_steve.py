"""STEVE family tests: dVAE roundtrip, KV-cached generate parity, STEVE
forward/loss, STEVESlotFormer decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotformer_tpu.models.dvae import dVAE, gumbel_softmax, make_one_hot, pixel_shuffle
from slotformer_tpu.models.steve import STEVE
from slotformer_tpu.models.steve_slotformer import STEVESlotFormer
from slotformer_tpu.models.steve_transformer import STEVETransformerDecoder

RNG = jax.random.PRNGKey(0)


def test_pixel_shuffle_matches_torch_semantics():
    import torch

    x = np.random.default_rng(0).normal(size=(2, 3, 3, 16)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    # torch: NCHW
    t = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, t, atol=1e-6)


def test_gumbel_softmax_properties():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)))
    soft = gumbel_softmax(logits, RNG, tau=1.0, hard=False)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    hard = gumbel_softmax(logits, RNG, tau=1.0, hard=True)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}
    assert np.asarray(hard.sum(-1)).tolist() == [1.0] * 4
    oh = make_one_hot(logits)
    assert (np.asarray(oh.argmax(-1)) == np.asarray(logits.argmax(-1))).all()


@pytest.mark.slow
def test_dvae_shapes_and_loss():
    model = dVAE(vocab_size=32)
    batch = {"img": jnp.zeros((2, 16, 16, 3))}
    variables = model.init({"params": RNG, "sample": RNG}, batch)
    out = model.apply(variables, batch, tau=1.0, rngs={"sample": RNG})
    assert out["recon"].shape == (2, 16, 16, 3)
    assert out["z_logits"].shape == (2, 4, 4, 32)
    # tokenize / detokenize
    ids = model.apply(variables, batch["img"], False, method="tokenize")
    assert ids.shape == (2, 4, 4) and ids.dtype in (jnp.int32, jnp.int64)
    oh = model.apply(variables, batch["img"], True, method="tokenize")
    rec = model.apply(variables, oh, method="detokenize")
    assert rec.shape == (2, 16, 16, 3)
    # video input
    vid = {"img": jnp.zeros((2, 3, 16, 16, 3))}
    out = model.apply(variables, vid, rngs={"sample": RNG})
    assert out["recon"].shape == (2, 3, 16, 16, 3)
    losses = model.apply(variables, vid, method="train_loss", rngs={"sample": RNG})
    assert "recon_loss" in losses


def test_steve_decoder_forward_shapes():
    dec = STEVETransformerDecoder(
        vocab_size=16, d_model=32, n_head=4, max_len=15, num_slots=3, num_layers=2
    )
    slots = jax.random.normal(RNG, (2, 3, 32))
    idx = jnp.zeros((2, 15), jnp.int32)
    variables = dec.init(RNG, slots, idx)
    logits = dec.apply(variables, slots, idx)
    assert logits.shape == (2, 16, 16)


@pytest.mark.slow
def test_kv_cached_generate_matches_full_reforward():
    """The KV-cached generate must produce the same tokens/logits as the
    reference's full-prefix re-forward algorithm."""
    dec = STEVETransformerDecoder(
        vocab_size=11, d_model=32, n_head=4, max_len=15, num_slots=3,
        num_layers=2, dropout=0.0,
    )
    slots = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32))
    variables = dec.init(RNG, slots, jnp.zeros((2, 15), jnp.int32))

    steps = 8
    ids, logits = dec.apply(variables, slots, steps, method="generate")
    assert ids.shape == (2, steps)
    assert logits.shape == (2, steps, 11)

    # naive reference algorithm: re-forward the whole prefix each step
    idx_cond = jnp.zeros((2, 0), jnp.int32)
    ref_logits = []
    for _ in range(steps):
        lg = dec.apply(variables, slots, idx_cond)
        lg = lg[:, -1]
        ref_logits.append(lg)
        ix = lg.argmax(-1).astype(jnp.int32)
        idx_cond = jnp.concatenate([idx_cond, ix[:, None]], axis=1)
    ref_logits = jnp.stack(ref_logits, axis=1)

    np.testing.assert_array_equal(np.asarray(ids), np.asarray(idx_cond))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=2e-4
    )


def _tiny_steve():
    return STEVE(
        resolution=(16, 16),
        clip_len=3,
        slot_dict=dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                       num_iterations=2),
        dvae_dict=dict(down_factor=4, vocab_size=16, dvae_ckp_path=""),
        enc_dict=dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16),
        dec_dict=dict(dec_num_layers=2, dec_num_heads=4, dec_d_model=32),
        pred_dict=dict(pred_type="transformer", pred_rnn=True,
                       pred_norm_first=True, pred_num_layers=1,
                       pred_num_heads=2, pred_ffn_dim=32, pred_sg_every=None),
        loss_dict=dict(use_img_recon_loss=False),
    )


@pytest.mark.slow
def test_steve_forward_and_loss():
    model = _tiny_steve()
    batch = {"img": jnp.zeros((2, 3, 16, 16, 3))}
    variables = model.init({"params": RNG, "sample": RNG, "dropout": RNG}, batch)
    out = model.apply(variables, batch, rngs={"sample": RNG})
    assert out["slots"].shape == (2, 3, 3, 16)
    assert out["masks"].shape == (2, 3, 3, 16, 16)  # upsampled at eval
    # masks sum to 1 over slots (softmax-over-slots attention)
    np.testing.assert_allclose(np.asarray(out["masks"].sum(2)), 1.0, rtol=1e-4)
    assert out["pred_token_id"].shape == (6, 16, 16)  # [B*T, h*w, vocab]
    assert out["target_token_id"].shape == (6, 16)
    losses = model.apply(
        variables, batch, method="train_loss",
        rngs={"sample": RNG, "dropout": RNG},
    )
    assert "token_recon_loss" in losses
    assert np.isfinite(float(losses["token_recon_loss"]))
    # precomputed token ids path
    batch2 = {"img": batch["img"],
              "token_id": jnp.zeros((2, 3, 16), jnp.int32)}
    out2 = model.apply(variables, batch2, rngs={"sample": RNG})
    assert out2["target_token_id"].shape == (6, 16)


def test_steve_bf16_train_loss_scan_carry():
    """AMP scan-carry dtype stability for STEVE's encode (same round-4
    regression as StoSAVi: f32 init_pred_state zeros vs bf16 init_latents)."""
    model = _tiny_steve()
    batch = {"img": jax.random.normal(jax.random.PRNGKey(9), (2, 3, 16, 16, 3))}
    variables = model.init({"params": RNG, "sample": RNG, "dropout": RNG}, batch)
    from slotformer_tpu.runtime import to_bf16 as bf  # THE trainer cast
    losses = model.apply(
        {"params": bf(variables["params"])}, bf(batch), method="train_loss",
        rngs={"sample": RNG, "dropout": RNG},
    )
    assert np.isfinite(float(losses["token_recon_loss"]))


def test_steve_slotformer_rollout_and_decode():
    model = STEVESlotFormer(
        resolution=(16, 16),
        slot_dict=dict(num_slots=3, slot_size=16),
        dvae_dict=dict(down_factor=4, vocab_size=16),
        dec_dict=dict(dec_num_layers=2, dec_num_heads=4, dec_d_model=32),
        rollout_dict=dict(num_slots=3, slot_size=16, history_len=3, t_pe="sin",
                          d_model=16, num_layers=1, num_heads=2, ffn_dim=32),
        loss_dict=dict(rollout_len=3, use_img_recon_loss=True),
    )
    batch = {"slots": jax.random.normal(RNG, (2, 6, 3, 16)),
             "img": jnp.zeros((2, 6, 16, 16, 3))}
    variables = model.init({"params": RNG, "sample": RNG}, batch)
    out = model.apply(variables, batch, rngs={"sample": RNG})
    assert out["pred_slots"].shape == (2, 3, 3, 16)
    assert out["pred_token_id"].shape == (6, 16, 16)
    losses = model.apply(
        variables, batch, method="train_loss",
        rngs={"sample": RNG, "dropout": RNG},
    )
    assert set(losses) == {"slot_recon_loss", "img_recon_loss"}
    # decode via autoregressive generation
    slots = jax.random.normal(RNG, (2, 3, 16))
    soft, hard = model.apply(variables, slots, method="decode",
                             rngs={"sample": RNG})
    assert soft.shape == (2, 16, 16, 3)
    assert hard.shape == (2, 16, 16, 3)
