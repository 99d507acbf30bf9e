"""End-to-end converted-checkpoint rollout-slots CLI parity.

``tests/golden/gen_rollout_golden.py`` executed the reference's VERBATIM
``rollout_video_slots`` (rollout_clevrer_slots.py:19-66 — zero-pad to the
target length, per-offset phase rollouts via the rollout_len mutation,
phase re-interleaving) in torch on the committed input slots with the
testvp golden's SlotFormer weights, at frame_offset=3 so all three
interleaved phase streams run. This test drives OUR full CLI stack:

    reference .pth -> cli.convert_reference_ckpt
      -> cli.rollout_slots --task clevrer

and asserts the saved pickle matches per video — observed frames
bit-exact (pure passthrough on both sides), rolled frames to float
tolerance (autoregressive XLA-vs-torch drift). Covers the seams the
testvp parity does not: the offset-interleaved stitching, the static
per-phase jit programs replacing the reference's rollout_len mutation,
and the {split: {fn: [target, N, C]}} output contract consumed by the
VQA/readout pipelines."""

import os
import pickle

import numpy as np
import pytest
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "rollout_golden.npz")
TESTVP_GOLD = os.path.join(HERE, "golden", "testvp_golden.npz")
CFG = os.path.join(HERE, "golden", "rollout_cfg.py")
OBS, TARGET = 12, 18


def test_rollout_cli_matches_reference_flow(tmp_path):
    from slotformer_tpu.cli import convert_reference_ckpt, rollout_slots

    gold = np.load(GOLD)
    sd = {k[3:]: torch.from_numpy(v)
          for k, v in np.load(TESTVP_GOLD).items() if k.startswith("sd/")}
    ref_pth = str(tmp_path / "ref_sf.pth")
    torch.save({"state_dict": sd}, ref_pth)
    ckpt = str(tmp_path / "converted.ckpt.pkl")
    convert_reference_ckpt.main(
        ["--params", CFG, "--ref_ckpt", ref_pth, "--save_path", ckpt])

    save = str(tmp_path / "out" / "rollout_slots.pkl")
    rollout_slots.main([
        "--task", "clevrer", "--params", CFG, "--weight", ckpt,
        "--save_path", save, "--batch_size", "2",
        "--obs_frames", str(OBS), "--target_len", str(TARGET)])

    with open(save, "rb") as f:
        ours = pickle.load(f)
    with open(os.path.join(HERE, "golden", "rollout_slots_in.pkl"),
              "rb") as f:
        inputs = pickle.load(f)

    rolled_keys = [k for k in gold.files if k.startswith("rolled/")]
    assert len(rolled_keys) == 7
    for k in rolled_keys:
        _, split, fn = k.split("/", 2)
        ref = gold[k]
        got = ours[split][fn]
        assert got.shape == (TARGET, 5, 16)
        # observed prefix: passthrough on both sides
        np.testing.assert_array_equal(got[:OBS], inputs[split][fn],
                                      err_msg=f"{k} obs")
        np.testing.assert_array_equal(ref[:OBS], inputs[split][fn],
                                      err_msg=f"{k} ref obs")
        # rolled tail: 2 autoregressive steps per phase stream
        np.testing.assert_allclose(got[OBS:], ref[OBS:], rtol=1e-4,
                                   atol=1e-4, err_msg=f"{k} rolled")

    # the rollout_slots.pkl symlink lands next to the weight (reference
    # rollout_clevrer_slots.py:103-105)
    link = tmp_path / "rollout_slots.pkl"
    assert link.is_symlink() and os.path.realpath(link) == \
        os.path.realpath(save)
