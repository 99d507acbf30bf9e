#!/usr/bin/env python
"""Generate the end-to-end test_vp parity golden (VERDICT r4 next-round #4).

Runs the REFERENCE's own video-prediction evaluation flow
(/root/reference/slotformer/video_prediction/test_vp.py:110-163) in torch:

    seeded tiny torch SAVi decoder ckpt
      -> reference SlotFormer (frozen-decoder graft, slotformer.py:196-218)
      -> per-batch forward (rollout + decode, use_img_recon_loss)
      -> get_output: postproc_mask + masks_to_boxes (test_vp.py:89-107)
      -> reference pred_eval_step (vp_utils.py:258-344)
      -> per-rollout-step AverageMeter aggregation (test_vp.py:125-131)

fed by OUR val loader's exact batches (tests/golden/testvp_cfg.py; the
synthetic dataset is deterministic, batches are also stored for a
reproducibility assert). Records the reference torch state_dict + the
aggregated per-step metrics into ``testvp_golden.npz``; the slots fixture
goes to ``testvp_slots.pkl``. ``tests/test_testvp_e2e_parity.py`` then runs
cli.convert_reference_ckpt + cli.test_vp on the same config and asserts
metric-for-metric equality — covering the last untested seam (CLI
adjust_params + converted full checkpoint + jit rollout + metric
aggregation) end-to-end. percept_dist excluded (zero-lpips stub here; no
LPIPS weights in this env).

Run from the repo root:  python tests/golden/gen_testvp_golden.py
(needs /root/reference checked out; the committed .npz/.pkl do not)
"""

import os
import pickle
import sys
import tempfile

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

import gen_metrics_golden as gm  # noqa: E402  (skimage/torchvision stubs)
import gen_model_goldens as gg  # noqa: E402  (nerv stub + _load)


class _Meter:
    """nerv AverageMeter arithmetic (update(val, n) -> weighted avg)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val, n):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count


def _nchw(x):
    return np.moveaxis(np.asarray(x), -1, -3)


def main():
    # stub order matters: metrics stubs install the slotformer.* shim that
    # vp_utils imports to_rgb_from_tensor from; the nerv stub + StoSAVi shim
    # then let savi.py / vp models load
    gm._install_stubs()
    gg._install_nerv_stub()
    base_dir = os.path.join(gg.REF, "slotformer/base_slots/models")
    vp_dir = os.path.join(gg.REF, "slotformer/video_prediction/models")
    savi_mod = gg._load(
        "refvpgold.savi", "slotformer/base_slots/models/savi.py", base_dir)
    sys.modules["slotformer.base_slots.models"].StoSAVi = savi_mod.StoSAVi
    sf_mod = gg._load(
        "refvpgold.slotformer",
        "slotformer/video_prediction/models/slotformer.py", vp_dir)
    vp = gg._load(
        "refvpgold.vp_utils",
        "slotformer/video_prediction/vp_utils.py",
        os.path.join(gg.REF, "slotformer/video_prediction"))

    # ---- slots fixture (committed; both sides read it through the config)
    rs = np.random.RandomState(42)
    slots = {
        split: {
            f"synthetic_{split}_{i:05d}":
                rs.randn(10, 5, 16).astype(np.float32)
            for i in range(n)
        }
        for split, n in (("val", 10), ("train", 2))
    }
    with open(os.path.join(HERE, "testvp_slots.pkl"), "wb") as f:
        pickle.dump(slots, f)

    # ---- our loader's batches (deterministic; also stored for the test's
    # reproducibility assert)
    from slotformer_tpu.cli.test_vp import adjust_params
    from slotformer_tpu.datasets import build_dataset
    from slotformer_tpu.runtime import BaseDataModule, load_params

    params = load_params(os.path.join(HERE, "testvp_cfg.py"))
    params = adjust_params(params, batch_size=-1)
    val_set = build_dataset(params, val_only=True)
    dm = BaseDataModule(params, train_set=None, val_set=val_set)
    batches = [
        {k: np.asarray(v) for k, v in b.items() if hasattr(v, "shape")}
        for b in dm.val_loader
    ]
    assert len(batches) == 2 and batches[0]["img"].shape[0] == 8, (
        "fixture expects batches of 8 + 2 to exercise meter weighting")

    # ---- reference torch SlotFormer with a seeded frozen-decoder graft
    torch.manual_seed(7)
    savi = savi_mod.StoSAVi(
        resolution=(16, 16), clip_len=4,
        slot_dict=dict(num_slots=5, slot_size=16, slot_mlp_size=32,
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
            resolution=(16, 16), clip_len=10,
            slot_dict=dict(num_slots=5, slot_size=16),
            dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4),
                          dec_ks=3, dec_norm='', dec_ckp_path=tf.name),
            rollout_dict=dict(num_slots=5, slot_size=16, history_len=4,
                              t_pe='sin', slots_pe='', d_model=16,
                              num_layers=2, num_heads=2, ffn_dim=32,
                              norm_first=True),
            loss_dict=dict(rollout_len=6, use_img_recon_loss=True),
        ).eval()

    # ---- the reference test_vp per-batch flow + meter aggregation
    history_len = 4
    rollout_len = 6
    metrics = ["mse", "psnr", "ssim", "ari", "fari", "miou", "ap", "ar"]
    meters = {m: [_Meter() for _ in range(rollout_len)] for m in metrics}
    zero_lpips = lambda x, y: torch.zeros(x.shape[0])  # noqa: E731

    store = {}
    for bi, b in enumerate(batches):
        for k, v in b.items():
            store[f"batch{bi}/{k}"] = v
        data_dict = {
            "slots": torch.from_numpy(b["slots"]),
            "img": torch.from_numpy(_nchw(b["img"])),
        }
        B = b["img"].shape[0]
        with torch.no_grad():
            out = model(data_dict)
            pred = out["recon_combined"]
            pred_mask = vp.postproc_mask(out["masks"])
            pred_bbox = vp.masks_to_boxes(pred_mask, 5)
            md = vp.pred_eval_step(
                gt=data_dict["img"][:, history_len:],
                pred=pred,
                lpips_fn=zero_lpips,
                gt_mask=torch.from_numpy(b["mask"][:, history_len:]).long(),
                pred_mask=pred_mask,
                gt_pres_mask=torch.from_numpy(
                    b["pres_mask"][:, history_len:]).bool(),
                gt_bbox=torch.from_numpy(b["bbox"][:, history_len:]),
                pred_bbox=pred_bbox,
                eval_traj=True,
            )
        for i in range(rollout_len):
            for m in metrics:
                meters[m][i].update(md[m][i], B)

    for m in metrics:
        store[f"metric/{m}"] = np.array(
            [meters[m][i].avg for i in range(rollout_len)], np.float64)
    for k, v in model.state_dict().items():
        store[f"sd/{k}"] = v.detach().numpy().copy()

    out_path = os.path.join(HERE, "testvp_golden.npz")
    np.savez_compressed(out_path, **store)
    print(f"wrote {out_path}")
    for m in metrics:
        print(f"  {m}: {store[f'metric/{m}']}")


if __name__ == "__main__":
    main()
