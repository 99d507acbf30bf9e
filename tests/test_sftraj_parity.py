"""SlotFormer TRAINING-TRAJECTORY parity vs the executed reference.

``tests/golden/gen_sftraj_golden.py`` ran 12 Adam steps of the flagship
SlotFormer recipe with the REFERENCE torch model — temporal loss-decay
schedule (ramp + clamp regimes), vid_len truncation masking, and the
frozen-decoder img-recon gradient path — and recorded the initial state
dict + per-step losses. This test converts that state dict via
torch_compat, replays the identical schedule with optax, and asserts

  * slot_recon / img_recon loss trajectories track step for step, and
  * the decoder subtree stays bit-frozen under our masking (the grads
    that flow THROUGH the frozen decoder into the rollouter are live on
    both sides — that is what moves slot+img losses together).

Both sides run dropout-free (see the generator docstring)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "sftraj_golden.npz")

N_STEPS, DECAY_STEPS, LR = 12, 8, 3e-4
HIST, RO = 4, 6


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


def test_slotformer_training_trajectory_parity(gold):
    from slotformer_tpu.models.slotformer import SlotFormer
    from slotformer_tpu.runtime import torch_compat as tc

    sd = {k[3:]: gold[k] for k in gold.files if k.startswith("sd/")}
    tree = tc.slotformer(sd, num_layers=2, num_heads=2)
    tree["decoder"] = tc.savi_decoder(sd, n_deconvs=2)

    model = SlotFormer(
        resolution=(16, 16),
        slot_dict=dict(num_slots=5, slot_size=16),
        rollout_dict=dict(num_slots=5, slot_size=16, history_len=HIST,
                          t_pe="sin", slots_pe="", d_model=16, num_layers=2,
                          num_heads=2, ffn_dim=32, norm_first=True),
        dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4),
                      dec_ks=3, dec_norm="", dec_ckp_path=""),
        loss_dict=dict(rollout_len=RO, use_img_recon_loss=True),
    )
    batch = {
        "slots": np.asarray(gold["in/slots"]),
        # reference video is NCHW; ours NHWC
        "img": np.transpose(np.asarray(gold["in/img"]), (0, 1, 3, 4, 2)),
        "vid_len": np.asarray(gold["in/vid_len"], np.int32),
    }

    tx = optax.adam(LR)
    opt_state = tx.init(tree)

    def losses_fn(p, factor):
        def run(m, b, f):
            out = m(b, deterministic=True)
            return m.calc_train_loss(b, out, loss_decay_factor=f,
                                     training=True)

        return model.apply({"params": p}, batch, factor, method=run)

    @jax.jit
    def train_step(p, o, factor):
        def loss_fn(pp):
            ld = losses_fn(pp, factor)
            return ld["slot_recon_loss"] + ld["img_recon_loss"], ld

        (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        # production freezing = optimizer mask over the decoder prefix
        # (runtime frozen_prefixes); equivalent here: zero decoder grads
        grads["decoder"] = jax.tree.map(jnp.zeros_like, grads["decoder"])
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, ld

    def decay_factor(step):
        # methods.SlotFormerMethod.train_loss_kwargs (ramp 0.01->1 + clamp)
        return min(0.01 + step / DECAY_STEPS * 0.99, 1.0)

    dec0 = jax.tree.leaves(tree["decoder"])
    slot_losses, img_losses = [], []
    for i in range(N_STEPS):
        tree, opt_state, ld = train_step(tree, opt_state, decay_factor(i))
        slot_losses.append(float(ld["slot_recon_loss"]))
        img_losses.append(float(ld["img_recon_loss"]))

    np.testing.assert_allclose(
        slot_losses, gold["out/slot_losses"], rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        img_losses, gold["out/img_losses"], rtol=5e-3, atol=1e-5)
    for a, b in zip(dec0, jax.tree.leaves(tree["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
