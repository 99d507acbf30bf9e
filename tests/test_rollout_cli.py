"""Rollout CLI + AUCCESS tests."""

import os

import jax
import numpy as np
import pytest

from slotformer_tpu.metrics.auccess import auccess_from_conf


def test_auccess_perfect_and_random():
    # 2 tasks, 10 actions; perfect ranking: solved actions get top conf
    gt = np.full((2, 10), -1.0)
    gt[:, :3] = 1.0  # 3 solved actions per task
    conf_perfect = np.linspace(1, 0, 10)[None].repeat(2, 0)
    score, s = auccess_from_conf(conf_perfect, gt, attempts=10)
    assert s[0] == 1.0  # first attempt already succeeds
    assert score == pytest.approx(100.0)
    # worst ranking: solved actions ranked last
    conf_worst = np.linspace(0, 1, 10)[None].repeat(2, 0)
    score_w, s_w = auccess_from_conf(conf_worst, gt, attempts=10)
    assert s_w[0] == 0.0 and s_w[-1] == 1.0
    assert score_w < score


def test_auccess_invalid_filtering():
    gt = np.array([[1.0, 0.0, -1.0, -1.0]])  # one solved, one invalid
    conf = np.array([[0.1, 0.9, 0.8, 0.7]])  # invalid has high conf: ignored
    score, s = auccess_from_conf(conf, gt, attempts=3)
    # valid ranking: conf .8, .7, .1 -> statuses -1, -1, 1 -> success at k=3
    assert s.tolist() == [0.0, 0.0, 1.0]


def test_interleaved_rollout_semantics(tmp_path):
    """Phase reassembly must put phase p step s at global index s*offset+p."""
    from slotformer_tpu.cli.rollout_slots import interleaved_rollout

    history, offset, obs, target = 2, 2, 8, 12
    N, C = 3, 4

    # fake rollout fn: predicts past[-1] + step + 1000*phase_marker where the
    # phase marker is the last observed frame index parity
    def rollout_fn(params_tree, past, pred_len):
        B = past.shape[0]
        out = []
        last = past[:, -1]
        for s in range(pred_len):
            out.append(last + (s + 1))
        return np.stack(out, axis=1)

    slots = {
        "vid": np.arange(obs, dtype=np.float32)[:, None, None]
        * np.ones((1, N, C), np.float32)
    }
    out = interleaved_rollout(
        rollout_fn, None, slots, obs, target, history, offset, batch_size=1
    )
    v = out["vid"][:, 0, 0]  # frame values
    np.testing.assert_array_equal(v[:obs], np.arange(obs))
    # phase 0 sees [4, 6] -> predicts 7, 8 at global 8, 10
    # phase 1 sees [5, 7] -> predicts 8, 9 at global 9, 11
    np.testing.assert_array_equal(v[obs:], [7, 8, 8, 9])


@pytest.mark.slow
def test_rollout_cli_on_synthetic(tmp_path):
    """rollout_slots CLI end-to-end with a tiny SlotFormer."""
    from slotformer_tpu.cli.rollout_slots import main as rollout_main
    from slotformer_tpu.models import SlotFormer
    from slotformer_tpu.runtime import dump_obj, load_obj, save_checkpoint

    cfg = tmp_path / "sf_params.py"
    cfg.write_text(
        "from slotformer_tpu.runtime import BaseParams\n"
        "class SlotFormerParams(BaseParams):\n"
        "    model = 'SlotFormer'\n"
        "    dataset = 'synthetic_slots'\n"
        f"    slots_root = {str(tmp_path / 'slots.pkl')!r}\n"
        "    resolution = (16, 16)\n"
        "    input_frames = 3\n"
        "    frame_offset = 2\n"
        "    n_sample_frames = 6\n"
        "    slot_dict = dict(num_slots=3, slot_size=16)\n"
        "    dec_dict = dict(dec_channels=(16, 8), dec_resolution=(16, 16), dec_ks=3)\n"
        "    rollout_dict = dict(num_slots=3, slot_size=16, history_len=3,\n"
        "                        t_pe='sin', d_model=16, num_layers=1,\n"
        "                        num_heads=2, ffn_dim=32)\n"
        "    loss_dict = dict(rollout_len=3, use_img_recon_loss=False)\n"
    )
    rng = np.random.default_rng(0)
    slots = {
        "train": {"a": rng.normal(size=(8, 3, 16)).astype(np.float32)},
        "val": {"b": rng.normal(size=(8, 3, 16)).astype(np.float32)},
    }
    dump_obj(slots, str(tmp_path / "slots.pkl"))

    from slotformer_tpu.runtime import load_params
    from slotformer_tpu.models import build_model

    params = load_params(str(cfg))
    model = build_model(params)
    variables = model.init(
        jax.random.PRNGKey(0), {"slots": np.zeros((1, 6, 3, 16), np.float32)}
    )
    ckpt = str(tmp_path / "sf.ckpt.pkl")
    save_checkpoint(ckpt, variables["params"], step=0)

    out_path = str(tmp_path / "rollout_slots.pkl")
    rollout_main(
        ["--task", "synthetic", "--params", str(cfg), "--weight", ckpt,
         "--save_path", out_path, "--obs_frames", "8", "--target_len", "12",
         "--batch_size", "1"]
    )
    out = load_obj(out_path)
    assert set(out) == {"train", "val"}
    assert out["train"]["a"].shape == (12, 3, 16)
    np.testing.assert_array_equal(out["train"]["a"][:8], slots["train"]["a"])
    assert np.isfinite(out["train"]["a"]).all()
