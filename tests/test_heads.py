"""Downstream heads: Aloe VQA transformer, PHYRE/Physion readouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotformer_tpu.models.aloe import CLEVRERAloe
from slotformer_tpu.models.readout import PHYREReadout, PhysionReadout

RNG = jax.random.PRNGKey(0)


def _aloe_batch(B=4, T=3, N=4, Cv=16, L=8, q_len=5, n_answers=6):
    rng = np.random.default_rng(0)
    return {
        "video_emb": rng.normal(size=(B, T, N, Cv)).astype(np.float32),
        "q_tokens": rng.integers(0, 10, size=(B, L)).astype(np.int32),
        "q_pad_mask": np.zeros((B, L), bool),
        "is_cls": np.array([True, True, False, False]),
        "label": np.array([2, 5, 1, 0], np.int32),
    }


def _tiny_aloe(B=4, T=3, N=4, Cv=16, L=8):
    return CLEVRERAloe(
        transformer_dict=dict(
            input_len=T * N + L, input_dim=8, pos_enc="learnable",
            num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
            cls_mlp_size=16,
        ),
        lang_dict=dict(question_vocab_size=10, answer_vocab_size=6,
                       question_len=5),
        vision_dict=dict(vision_dim=16),
        loss_dict=dict(use_mask_obj_loss=False),
    )


@pytest.mark.slow
def test_aloe_forward_and_losses():
    model = _tiny_aloe()
    batch = _aloe_batch()
    variables = model.init(RNG, batch)
    out = model.apply(variables, batch)
    assert out["cls_answer_logits"].shape == (4, 6)
    assert out["mc_answer_logits"].shape == (4,)
    losses = model.apply(variables, batch, method="train_loss",
                         rngs={"dropout": RNG})
    assert set(losses) == {"cls_answer_loss", "mc_answer_loss"}
    assert all(np.isfinite(float(v)) for v in losses.values())
    ev = model.apply(variables, batch, method="eval_loss")
    assert "descriptive_acc" in ev and "choice_acc" in ev


def test_aloe_padding_mask_invariance():
    """Padded question positions must not affect outputs."""
    model = _tiny_aloe()
    batch = _aloe_batch()
    batch["q_pad_mask"][:, 6:] = True  # last 2 tokens padded
    variables = model.init(RNG, batch)
    out1 = model.apply(variables, batch)
    batch2 = dict(batch)
    batch2["q_tokens"] = batch["q_tokens"].copy()
    batch2["q_tokens"][:, 6:] = 3  # change padded token ids
    out2 = model.apply(variables, batch2)
    np.testing.assert_allclose(
        np.asarray(out1["cls_answer_logits"]),
        np.asarray(out2["cls_answer_logits"]),
        atol=1e-5,
    )


def test_aloe_loss_masking():
    """cls loss only counts is_cls rows; mc loss the rest."""
    model = _tiny_aloe()
    batch = _aloe_batch()
    variables = model.init(RNG, batch)
    out = model.apply(variables, batch)
    losses = model.apply(variables, batch, out, method="calc_train_loss")
    # manual check of mc bce over rows 2-3
    mc_logits = np.asarray(out["mc_answer_logits"])[2:]
    mc_labels = np.array([1.0, 0.0])
    bce = np.maximum(mc_logits, 0) - mc_logits * mc_labels + np.log1p(
        np.exp(-np.abs(mc_logits))
    )
    assert float(losses["mc_answer_loss"]) == pytest.approx(bce.mean(), abs=1e-5)


def test_phyre_readout():
    model = PHYREReadout(
        readout_dict=dict(num_slots=3, slot_size=16, t_pe="sin", d_model=16,
                          num_layers=1, num_heads=2, ffn_dim=32,
                          norm_first=True, sel_slots=[0, 2]),
    )
    batch = {
        "slots": jax.random.normal(RNG, (4, 5, 3, 16)),
        "label": jnp.array([1, 0, 1, 0]),
    }
    variables = model.init(RNG, batch)
    out = model.apply(variables, batch)
    assert out["logits"].shape == (4,)
    ev = model.apply(variables, batch, method="eval_loss")
    assert "vqa_loss" in ev and "acc_0.50" in ev
    # only sel_slots timesteps matter
    slots2 = batch["slots"].at[:, 1].add(100.0)  # unselected timestep
    out2 = model.apply(variables, {"slots": slots2, "label": batch["label"]})
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(out2["logits"]), atol=1e-5
    )


def test_physion_readout_max_over_time_and_pairs():
    model = PhysionReadout(
        readout_dict=dict(num_slots=4, slot_size=8, agg_func="max", feats_dim=16),
    )
    batch = {
        "slots": jax.random.normal(RNG, (2, 3, 4, 8)),
        "label": jnp.array([1, 0]),
    }
    variables = model.init(RNG, batch)
    out = model.apply(variables, batch)
    assert out["logits"].shape == (2,)
    losses = model.apply(variables, batch, method="train_loss")
    assert np.isfinite(float(losses["vqa_loss"]))
    # manual: max over pairs then time
    from itertools import combinations

    p = variables["params"]
    slots = np.asarray(batch["slots"])
    combs = list(combinations(range(4), 2))
    pairs = np.stack(
        [np.concatenate([slots[:, :, i], slots[:, :, j]], -1) for i, j in combs],
        axis=2,
    )  # [B, T, num_combs, 2C]
    rel = pairs @ np.asarray(p["linear1"]["kernel"]) + np.asarray(p["linear1"]["bias"])
    rel = rel.max(2)
    logits = (rel @ np.asarray(p["linear2"]["kernel"]) + np.asarray(p["linear2"]["bias"]))[..., 0]
    np.testing.assert_allclose(
        np.asarray(out["logits"]), logits.max(1), atol=1e-5
    )
