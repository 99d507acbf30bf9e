"""End-to-end converted-checkpoint test_vp parity (VERDICT r4 next-round #4).

``tests/golden/gen_testvp_golden.py`` ran the REFERENCE's evaluation flow
(torch SlotFormer with frozen-decoder graft -> get_output -> reference
pred_eval_step -> per-step AverageMeters) on our deterministic synthetic
fixture and recorded the torch state_dict + aggregated metrics. This test
drives OUR full CLI stack on the same config:

    reference .pth -> cli.convert_reference_ckpt -> cli.test_vp (--wire f32)

and asserts the saved per-step .npy metrics match the reference flow
metric-for-metric — the one seam the 15 module goldens did not cover
(CLI adjust_params + full converted checkpoint + jit rollout + metric
aggregation). percept_dist excluded (no LPIPS weights in this env)."""

import os
import pickle

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "testvp_golden.npz")
CFG = os.path.join(HERE, "golden", "testvp_cfg.py")

METRICS = ["mse", "psnr", "ssim", "ari", "fari", "miou", "ar"]


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


def test_loader_batches_match_golden(gold):
    """Guard: the deterministic synthetic loader still reproduces the exact
    batches the reference flow consumed at golden-generation time."""
    from slotformer_tpu.cli.test_vp import adjust_params
    from slotformer_tpu.datasets import build_dataset
    from slotformer_tpu.runtime import BaseDataModule, load_params

    params = adjust_params(load_params(CFG), batch_size=-1)
    val_set = build_dataset(params, val_only=True)
    dm = BaseDataModule(params, train_set=None, val_set=val_set)
    batches = list(dm.val_loader)
    assert len(batches) == 2
    for bi, b in enumerate(batches):
        for k in ("img", "slots", "mask", "bbox", "pres_mask"):
            np.testing.assert_array_equal(
                np.asarray(b[k]), gold[f"batch{bi}/{k}"], err_msg=f"b{bi}/{k}")


def test_converted_ckpt_testvp_matches_reference_flow(gold, tmp_path):
    from slotformer_tpu.cli import convert_reference_ckpt, test_vp

    sd = {k[3:]: torch.from_numpy(gold[k])
          for k in gold.files if k.startswith("sd/")}
    ref_pth = str(tmp_path / "ref_sf.pth")
    torch.save({"state_dict": sd}, ref_pth)

    ckpt = str(tmp_path / "converted.ckpt.pkl")
    convert_reference_ckpt.main([
        "--params", CFG, "--ref_ckpt", ref_pth, "--save_path", ckpt])
    assert os.path.isfile(ckpt)

    vis = str(tmp_path / "vis")
    test_vp.main([
        "--params", CFG, "--weight", ckpt, "--vis_dir", vis, "--wire", "f32"])

    cfg_name = "testvp_cfg"
    save_dir = os.path.join(vis, "synthetic", cfg_name)
    for m in METRICS:
        ours = np.load(os.path.join(save_dir, f"{m}.npy"))
        ref = gold[f"metric/{m}"]
        # continuous pixel metrics accumulate tiny XLA-vs-torch float
        # differences through the 6-step autoregressive rollout; mask/bbox
        # metrics are argmax-discrete and should agree almost exactly
        tol = dict(rtol=2e-3, atol=2e-3) if m in ("mse", "psnr", "ssim") \
            else dict(rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ours, ref, err_msg=m, **tol)


def test_converted_ckpt_decoder_matches_reference_weights(gold, tmp_path):
    """The frozen-decoder subtree of the converted ckpt IS the reference
    SAVi decoder (key-prefix graft parity, slotformer.py:196-218)."""
    from slotformer_tpu.cli import convert_reference_ckpt
    from slotformer_tpu.runtime import load_state_dict

    sd = {k[3:]: torch.from_numpy(gold[k])
          for k in gold.files if k.startswith("sd/")}
    ref_pth = str(tmp_path / "ref_sf.pth")
    torch.save({"state_dict": sd}, ref_pth)
    ckpt = str(tmp_path / "converted.ckpt.pkl")
    convert_reference_ckpt.main([
        "--params", CFG, "--ref_ckpt", ref_pth, "--save_path", ckpt])
    tree = load_state_dict(ckpt)
    # torch ConvTranspose2d [in, out, kH, kW] -> flax [kH, kW, out, in]
    ref_k = gold["sd/decoder.0.0.weight"]
    ours_k = np.asarray(
        tree["decoder"]["deconv_0"]["ConvTranspose_0"]["kernel"])
    np.testing.assert_allclose(
        ours_k, np.transpose(ref_k, (2, 3, 1, 0)), atol=1e-7)
