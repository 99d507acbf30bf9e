"""End-to-end pipeline test on the synthetic dataset (the BASELINE.json
"minimum end-to-end slice"): train SAVi -> extract slots -> train SlotFormer
(frozen grafted decoder) -> test_vp metrics. Exercises every CLI."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SAVI_CFG = """
from slotformer_tpu.runtime import BaseParams

class SlotFormerParams(BaseParams):
    model = 'StoSAVi'
    max_epochs = 1
    save_interval = 1.0
    eval_interval = 1
    print_iter = 100
    optimizer = 'Adam'
    lr = 1e-3
    clip_grad = 0.05
    warmup_steps_pct = 0.1
    dataset = 'synthetic'
    num_videos_train = 8
    num_videos_val = 4
    video_len = 10
    n_sample_frames = 3
    frame_offset = 1
    train_batch_size = 8
    val_batch_size = 4
    num_workers = 0
    resolution = (32, 32)
    input_frames = 3
    slot_dict = dict(num_slots=4, slot_size=16, slot_mlp_size=32,
                     num_iterations=2, kernel_mlp=False)
    enc_dict = dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(8, 8), dec_ks=3)
    pred_dict = dict(pred_type='mlp', pred_rnn=False, pred_norm_first=True)
    loss_dict = dict(use_post_recon_loss=True, kld_method='var-0.01')
    post_recon_loss_w = 1.0
    kld_loss_w = 1e-4
"""

SF_CFG = """
from slotformer_tpu.runtime import BaseParams

class SlotFormerParams(BaseParams):
    model = 'SlotFormer'
    max_epochs = 1
    save_interval = 1.0
    eval_interval = 1
    print_iter = 100
    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    dataset = 'synthetic_slots'
    slots_root = {slots_root!r}
    num_videos_train = 8
    num_videos_val = 4
    video_len = 10
    n_sample_frames = 6
    frame_offset = 1
    load_img = True
    train_batch_size = 8
    val_batch_size = 4
    num_workers = 0
    resolution = (32, 32)
    input_frames = 3
    slot_dict = dict(num_slots=4, slot_size=16)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(8, 8), dec_ks=3,
                    dec_ckp_path={dec_ckp!r})
    rollout_dict = dict(num_slots=4, slot_size=16, history_len=3, t_pe='sin',
                        d_model=16, num_layers=1, num_heads=2, ffn_dim=32)
    loss_dict = dict(rollout_len=3, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
"""


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from slotformer_tpu.cli.extract_slots import main as extract_main
    from slotformer_tpu.cli.test_vp import main as test_vp_main
    from slotformer_tpu.cli.train import main as train_main
    from slotformer_tpu.runtime import load_obj

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        # ---- stage 1: train SAVi
        savi_cfg = tmp_path / "savi_synth_params.py"
        savi_cfg.write_text(SAVI_CFG)
        savi_ckp_dir = str(tmp_path / "savi_ckp")
        train_main(
            ["--params", str(savi_cfg), "--ckp_path", savi_ckp_dir,
             "--san_check_val_step", "0"]
        )
        savi_ckpt = os.path.join(savi_ckp_dir, "latest.ckpt.pkl")
        assert os.path.exists(savi_ckpt)

        # ---- stage 2: extract slots
        slots_path = str(tmp_path / "synth_slots.pkl")
        extract_main(
            ["--params", str(savi_cfg), "--weight", savi_ckpt,
             "--save_path", slots_path, "--batch_size", "4", "--chunk_len", "6"]
        )
        slots = load_obj(slots_path)
        assert set(slots) == {"train", "val"}
        assert len(slots["train"]) == 8 and len(slots["val"]) == 4
        some = next(iter(slots["train"].values()))
        assert some.shape == (10, 4, 16) and some.dtype == np.float32
        # chunked encoding produced finite slots
        assert np.isfinite(some).all()

        # ---- stage 3: train SlotFormer on extracted slots
        sf_cfg = tmp_path / "slotformer_synth_params.py"
        sf_cfg.write_text(
            SF_CFG.format(slots_root=slots_path, dec_ckp=savi_ckpt)
        )
        sf_ckp_dir = str(tmp_path / "sf_ckp")
        train_main(
            ["--params", str(sf_cfg), "--ckp_path", sf_ckp_dir,
             "--san_check_val_step", "1"]
        )
        sf_ckpt = os.path.join(sf_ckp_dir, "latest.ckpt.pkl")
        assert os.path.exists(sf_ckpt)

        # ---- stage 4: evaluate video prediction
        test_vp_main(
            ["--params", str(sf_cfg), "--weight", sf_ckpt,
             "--batch_size", "4", "--max_batches", "1",
             "--vis_dir", str(tmp_path / "vis")]
        )
        metric_dir = tmp_path / "vis" / "synthetic" / "slotformer_synth_params"
        for m in ("psnr", "ssim", "miou", "ari"):
            arr = np.load(metric_dir / f"{m}.npy")
            assert np.isfinite(arr).all(), m
        psnr = np.load(metric_dir / "psnr.npy")
        assert psnr.mean() > 5.0  # decodes into a sane range
    finally:
        os.chdir(cwd)
