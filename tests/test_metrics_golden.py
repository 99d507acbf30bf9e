"""Reference-anchored metric goldens (VERDICT r4 next-round #3).

``tests/golden/gen_metrics_golden.py`` EXECUTED the reference's own
vp_utils.py (torch) on seeded fixtures and recorded every output;
these tests assert ``slotformer_tpu.metrics.vp_metrics`` reproduces the
numbers — the strongest metric-parity evidence available without real
datasets. Layout note: the goldens store images NCHW and soft masks
[B,T,N,1,H,W] (reference conventions); ours are NHWC / [B,T,N,H,W,1].
percept_dist is excluded (no LPIPS weights in this env; a zero stub fed
both sides)."""

import os

import numpy as np
import pytest

from slotformer_tpu.metrics.vp_metrics import (
    ARI_metric,
    batch_bbox_precision_recall,
    fARI_metric,
    masks_to_boxes,
    miou_metric,
    mse_metric,
    postproc_mask,
    pred_eval_step,
    psnr_metric,
    ssim_metric,
)

GOLD = os.path.join(os.path.dirname(__file__), "golden", "metrics_golden.npz")


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


def _nhwc(x):  # [..., C, H, W] -> [..., H, W, C]
    return np.moveaxis(x, -3, -1)


def _img01(x):  # reference to_rgb_from_tensor
    return np.clip(x * 0.5 + 0.5, 0.0, 1.0)


def test_postproc_mask_matches_reference(gold):
    soft = gold["in/soft_masks"]  # [B, T, N, 1, H, W]
    ours = np.asarray(postproc_mask(np.moveaxis(soft, 3, -1)))
    np.testing.assert_array_equal(ours, gold["out/pred_mask"])


def test_masks_to_boxes_matches_reference(gold):
    for key, masks in (("out/gt_bbox", gold["in/gt_mask"]),
                       ("out/pred_bbox", gold["out/pred_mask"])):
        ours = np.asarray(masks_to_boxes(masks.astype(np.int32), num_boxes=5))
        np.testing.assert_allclose(ours, gold[key], atol=1e-6)


def test_pixel_metrics_match_reference(gold):
    g = _img01(_nhwc(gold["in/gt_img"][:, 0]))
    p = _img01(_nhwc(gold["in/pred_img"][:, 0]))
    assert float(mse_metric(g, p)) == pytest.approx(
        float(gold["out/mse_t0"]), rel=1e-5)
    assert float(psnr_metric(g, p)) == pytest.approx(
        float(gold["out/psnr_t0"]), rel=1e-5)
    assert float(ssim_metric(g, p)) == pytest.approx(
        float(gold["out/ssim_t0"]), rel=1e-4)


def test_clustering_metrics_match_reference(gold):
    gt = gold["in/gt_mask"][:, 0].astype(np.int32)
    pm = gold["out/pred_mask"][:, 0].astype(np.int32)
    nc = int(max(gt.max(), pm.max())) + 1
    assert ARI_metric(gt, pm, num_classes=nc) == pytest.approx(
        float(gold["out/ari"]), abs=1e-5)
    assert fARI_metric(gt, pm, num_classes=nc) == pytest.approx(
        float(gold["out/fari"]), abs=1e-5)
    # incl. the absent-mid-id undetected-object penalty (fixture sample 0
    # is missing gt id 3)
    assert miou_metric(gt, pm, n_gt=nc, n_pred=nc) == pytest.approx(
        float(gold["out/miou"]), abs=1e-5)


def test_bbox_ap_ar_match_reference(gold):
    ap, ar = batch_bbox_precision_recall(
        gold["in/gt_pres"][:, 0], gold["out/gt_bbox"][:, 0],
        gold["out/pred_bbox"][:, 0])
    assert ap == pytest.approx(float(gold["out/ap"]), abs=1e-6)
    assert ar == pytest.approx(float(gold["out/ar"]), abs=1e-6)


def test_pred_eval_step_matches_reference(gold):
    res = pred_eval_step(
        gt=_nhwc(gold["in/gt_img"]),
        pred=_nhwc(gold["in/pred_img"]),
        lpips_fn=None,
        gt_mask=gold["in/gt_mask"].astype(np.int32),
        pred_mask=gold["out/pred_mask"].astype(np.int32),
        gt_pres_mask=gold["in/gt_pres"],
        gt_bbox=gold["out/gt_bbox"],
        pred_bbox=gold["out/pred_bbox"],
        eval_traj=True,
    )
    for key in ("mse", "psnr", "ssim", "ari", "fari", "miou", "ap", "ar"):
        np.testing.assert_allclose(
            res[key], gold[f"out/step/{key}"],
            rtol=2e-4, atol=1e-5, err_msg=key)
