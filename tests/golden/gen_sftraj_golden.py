#!/usr/bin/env python
"""Generate the SlotFormer TRAINING-TRAJECTORY parity golden.

12 Adam steps of the flagship SlotFormer training recipe executed with the
REFERENCE torch model (/root/reference/slotformer/video_prediction/models/
slotformer.py) on a fixed batch, pinning over actual optimization:

  * the RPIN temporal loss-decay weighting (calc_train_loss:297-305) under
    the method's linear 0.01->1 factor schedule with clamp
    (vp/method.py:26-48; steps 8-11 run in the clamped factor=1 regime);
  * PHYRE-style ``vid_len`` truncation masking of BOTH the slot and img
    losses during training (calc_train_loss:306-327; sample 1 is
    truncated to 7 < history+rollout);
  * the frozen-decoder img-recon gradient path: grads flow THROUGH the
    decoder to the rollouter while the decoder itself must not move
    (torch: requires_grad=False, slotformer.py:212-218; ours: optimizer
    masking) — the golden records the reference's per-step
    slot_recon/img_recon losses and asserts its decoder stayed frozen;
  * Adam dynamics on the rollouter.

Both sides run dropout-free (torch model in eval(); flax deterministic) so
the trajectories are noise-matched — the reference trains with the
rollouter's dropout active, which cannot be seeded identically across
frameworks (same approach as the g_savitraj golden's MLP choice).

``tests/test_sftraj_parity.py`` converts the recorded initial state dict
via torch_compat and replays the schedule with optax, asserting the loss
trajectories track step for step and our decoder leaves stay bit-frozen.

Run from the repo root:  python tests/golden/gen_sftraj_golden.py
(needs /root/reference checked out; the committed .npz does not)
"""

import os
import sys
import tempfile
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

import gen_model_goldens as gg  # noqa: E402  (nerv stub + _load)

N_STEPS, DECAY_STEPS, LR = 12, 8, 3e-4
HIST, RO = 4, 6
B, N, C = 2, 5, 16


def decay_factor(step):
    """vp/method.py:26-48 (loss_decay_pct * total_steps = DECAY_STEPS)."""
    if step >= DECAY_STEPS:
        return 1.0
    return 0.01 + step / DECAY_STEPS * 0.99


def main():
    gg._install_nerv_stub()
    for name in ("slotformer", "slotformer.base_slots",
                 "slotformer.base_slots.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    savi_mod = gg._load(
        "refsftraj.savi", "slotformer/base_slots/models/savi.py",
        os.path.join(gg.REF, "slotformer/base_slots/models"))
    sys.modules["slotformer.base_slots.models"].StoSAVi = savi_mod.StoSAVi
    sf_mod = gg._load(
        "refsftraj.slotformer",
        "slotformer/video_prediction/models/slotformer.py",
        os.path.join(gg.REF, "slotformer/video_prediction/models"))

    torch.manual_seed(19)
    savi = savi_mod.StoSAVi(
        resolution=(16, 16), clip_len=4,
        slot_dict=dict(num_slots=N, slot_size=C, slot_mlp_size=32,
                       num_iterations=2),
        enc_dict=dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16,
                      enc_norm=''),
        dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4),
                      dec_ks=3, dec_norm=''),
        pred_dict=dict(pred_type='transformer', pred_rnn=False,
                       pred_norm_first=True, pred_num_layers=1,
                       pred_num_heads=2, pred_ffn_dim=32, pred_sg_every=None),
        loss_dict=dict(use_post_recon_loss=True, kld_method='none'),
    )
    with tempfile.NamedTemporaryFile(suffix=".pth") as tf:
        torch.save({"state_dict": savi.state_dict()}, tf.name)
        model = sf_mod.SlotFormer(
            resolution=(16, 16), clip_len=HIST + RO,
            slot_dict=dict(num_slots=N, slot_size=C),
            dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4),
                          dec_ks=3, dec_norm='', dec_ckp_path=tf.name),
            rollout_dict=dict(num_slots=N, slot_size=C, history_len=HIST,
                              t_pe='sin', slots_pe='', d_model=16,
                              num_layers=2, num_heads=2, ffn_dim=32,
                              norm_first=True),
            loss_dict=dict(rollout_len=RO, use_img_recon_loss=True),
        )
    model.eval()  # dropout-free trajectory (see module docstring)

    rs = np.random.RandomState(23)
    slots_in = rs.randn(B, HIST + RO, N, C).astype(np.float32)
    img = rs.uniform(-1, 1, (B, HIST + RO, 3, 16, 16)).astype(np.float32)
    vid_len = np.array([HIST + RO, 7], np.int64)  # sample 1 truncated
    data_dict = {
        "slots": torch.from_numpy(slots_in),
        "img": torch.from_numpy(img),
        "vid_len": torch.from_numpy(vid_len),
    }

    sd0 = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    dec0 = {k: v for k, v in sd0.items()
            if k.startswith(("decoder.", "decoder_pos_embedding."))}
    assert dec0, "decoder keys expected in the reference state dict"

    trainable = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.Adam(trainable, lr=LR)
    slot_losses, img_losses = [], []
    for i in range(N_STEPS):
        model.loss_decay_factor = decay_factor(i)
        out = model(data_dict)
        ld = model.calc_train_loss(data_dict, out)
        loss = ld["slot_recon_loss"] + ld["img_recon_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        slot_losses.append(float(ld["slot_recon_loss"]))
        img_losses.append(float(ld["img_recon_loss"]))

    # the reference's freeze really held
    for k, v0 in dec0.items():
        np.testing.assert_array_equal(
            v0, model.state_dict()[k].detach().numpy(), err_msg=k)

    store = {
        "in/slots": slots_in, "in/img": img, "in/vid_len": vid_len,
        "out/slot_losses": np.array(slot_losses, np.float64),
        "out/img_losses": np.array(img_losses, np.float64),
    }
    for k, v in sd0.items():
        store[f"sd/{k}"] = v
    out_path = os.path.join(HERE, "sftraj_golden.npz")
    np.savez_compressed(out_path, **store)
    print(f"wrote {out_path}")
    print("slot:", np.round(slot_losses, 5))
    print("img: ", np.round(img_losses, 5))


if __name__ == "__main__":
    main()
