"""Metric golden-value tests (ARI vs sklearn, analytic SSIM/PSNR, mIoU/bbox
known cases, postproc_mask semantics)."""

import numpy as np
import pytest

from slotformer_tpu.metrics import (
    ARI_metric,
    adjusted_rand_index,
    batch_bbox_precision_recall,
    bbox_precision_recall,
    box_iou,
    fARI_metric,
    masks_to_boxes,
    miou_metric,
    mse_metric,
    postproc_mask,
    pred_eval_step,
    psnr_metric,
    ssim_metric,
)


def test_ari_matches_sklearn():
    from sklearn.metrics import adjusted_rand_score

    rng = np.random.default_rng(0)
    for _ in range(5):
        gt = rng.integers(0, 4, size=(1, 1, 8, 8)).astype(np.int32)
        pred = rng.integers(0, 5, size=(1, 1, 8, 8)).astype(np.int32)
        ours = float(adjusted_rand_index(gt, pred, 6)[0])
        ref = adjusted_rand_score(gt.flatten(), pred.flatten())
        assert ours == pytest.approx(ref, abs=1e-5)


def test_ari_perfect_and_degenerate():
    gt = np.array([[[[0, 1], [1, 2]]]], np.int32)
    assert ARI_metric(gt[:, 0], gt[:, 0], 4) == pytest.approx(1.0)
    # all one cluster in both -> defined as 1.0
    ones = np.ones((1, 2, 2), np.int32)
    assert ARI_metric(ones, ones, 4) == pytest.approx(1.0)


def test_fg_ari_ignores_background():
    # bg (id 0) disagreement should not matter for FG-ARI
    gt = np.array([[[0, 0, 1, 1, 2, 2]]], np.int32).reshape(1, 1, 6)
    pred_same_fg = np.array([[[3, 3, 1, 1, 2, 2]]], np.int32).reshape(1, 1, 6)
    gt4 = gt.reshape(1, 1, 1, 6)
    pred4 = pred_same_fg.reshape(1, 1, 1, 6)
    assert float(adjusted_rand_index(gt4, pred4, 5, ignore_background=True)[0]) == pytest.approx(1.0)


def test_psnr_analytic():
    x = np.zeros((2, 8, 8, 3), np.float32)
    y = np.full_like(x, 0.1)
    # mse = 0.01 -> psnr = -10 log10(0.01) = 20
    assert float(psnr_metric(x, y)) == pytest.approx(20.0, abs=1e-4)


def test_mse_video_prediction_convention():
    x = np.zeros((2, 4, 4, 3), np.float32)
    y = np.full_like(x, 0.5)
    # sum over spatial (4x4), mean over batch+channel: 0.25 * 16 = 4
    assert float(mse_metric(x, y)) == pytest.approx(4.0, abs=1e-5)


def test_ssim_analytic_constant_images():
    # constant images: variances 0 -> SSIM = (2ab+C1)/(a^2+b^2+C1), a,b in 0..255
    a, b = 0.3, 0.7
    x = np.full((1, 24, 24, 1), a, np.float32)
    y = np.full((1, 24, 24, 1), b, np.float32)
    C1 = (0.01 * 255) ** 2
    expect = (2 * (a * 255) * (b * 255) + C1) / ((a * 255) ** 2 + (b * 255) ** 2 + C1)
    assert float(ssim_metric(x, y)) == pytest.approx(expect, abs=1e-4)
    assert float(ssim_metric(x, x)) == pytest.approx(1.0, abs=1e-6)


def test_ssim_matches_skimage_formula_on_random():
    """Pure-numpy reimplementation cross-check (independent filtering path)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(1)
    x = rng.random((1, 32, 32, 1)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.random((1, 32, 32, 1)).astype(np.float32), 0, 1)

    def np_ssim(a, b):
        a = a[0, :, :, 0] * 255.0
        b = b[0, :, :, 0] * 255.0
        sigma, truncate = 1.5, 3.5
        pad = int(truncate * sigma + 0.5)
        f = lambda im: gaussian_filter(im, sigma, truncate=truncate)
        ux, uy = f(a), f(b)
        uxx, uyy, uxy = f(a * a), f(b * b), f(a * b)
        vx, vy, vxy = uxx - ux**2, uyy - uy**2, uxy - ux * uy
        C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2)
        )
        return S[pad:-pad, pad:-pad].mean()

    assert float(ssim_metric(x, y)) == pytest.approx(np_ssim(x, y), abs=2e-4)


def test_miou_known_case():
    # gt: object 1 occupies left half; pred: slot 2 occupies left half exactly
    gt = np.zeros((1, 4, 4), np.int32)
    gt[0, :, :2] = 1
    pred = np.zeros((1, 4, 4), np.int32)
    pred[0, :, :2] = 2
    pred[0, :, 2:] = 1
    assert miou_metric(gt, pred, 3, 3) == pytest.approx(1.0)
    # half-overlap: pred slot covers only top half of the object
    pred2 = np.zeros((1, 4, 4), np.int32)
    pred2[0, :2, :2] = 2
    pred2[0, 2:, :] = 1
    # best match IoU = 4/8 = 0.5... pred slot2 ∩ gt obj = 4 px, union = 8+4-4=8
    assert miou_metric(gt, pred2, 3, 3) == pytest.approx(0.5, abs=1e-5)


def test_miou_undetected_object_penalty():
    # two gt objects, pred detects only one perfectly with a single fg slot
    gt = np.zeros((1, 4, 4), np.int32)
    gt[0, :, 0] = 1
    gt[0, :, 3] = 2
    pred = np.zeros((1, 4, 4), np.int32)
    pred[0, :, 0] = 1
    # pred has 2 classes (bg 0 + fg 1): M=2 >= N=2 so bg can "match" obj2 at 0 IoU?
    # bg slot covers cols 1-3 -> IoU with obj2 = 4/(12+4-4)=1/3
    val = miou_metric(gt, pred, 3, 2)
    assert 0.5 < val < 0.75  # (1.0 + 1/3)/2


def test_box_iou_and_precision_recall():
    gt_boxes = np.array([[0, 0, 4, 4], [8, 8, 12, 12]], np.float32)
    pred = np.array([[0, 0, 4, 4], [8, 8, 12, 12], [-1, -1, -1, -1]], np.float32)
    pres = np.array([True, True])
    ap, ar = bbox_precision_recall(pres, gt_boxes, pred)
    assert ar == pytest.approx(1.0)
    assert ap == pytest.approx(1.0)  # -1 boxes filtered out
    # shifted prediction below IoU threshold
    pred2 = np.array([[0, 0, 4, 4], [20, 20, 24, 24]], np.float32)
    ap2, ar2 = bbox_precision_recall(pres, gt_boxes, pred2)
    assert ar2 == pytest.approx(0.5)
    assert ap2 == pytest.approx(0.5)


def test_postproc_mask_background_rule():
    # two slots; slot 0 weak everywhere (bg candidate), slot 1 strong on left
    masks = np.zeros((1, 1, 2, 4, 4, 1), np.float32)
    masks[0, 0, 0] = 0.3  # weak everywhere -> bg slot
    masks[0, 0, 1, :, :2] = 0.9  # strong left
    out = np.asarray(postproc_mask(masks))
    assert out.shape == (1, 1, 4, 4)
    # left pixels -> slot 1; right pixels below FG_THRE -> forced to bg slot 0
    assert (out[0, 0, :, :2] == 1).all()
    assert (out[0, 0, :, 2:] == 0).all()


def test_masks_to_boxes_with_empty():
    m = np.zeros((1, 1, 6, 6), np.int32)
    m[0, 0, 1:4, 2:5] = 1
    boxes = np.asarray(masks_to_boxes(m, num_boxes=3))
    np.testing.assert_allclose(boxes[0, 0, 1], [2, 1, 4, 3])
    assert (boxes[0, 0, 2] == -1).all()  # empty slot


def test_pred_eval_step_end_to_end():
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, (2, 3, 16, 16, 3)).astype(np.float32)
    pred = np.clip(gt + 0.05 * rng.normal(size=gt.shape).astype(np.float32), -1, 1)
    gt_mask = rng.integers(0, 3, (2, 3, 16, 16)).astype(np.int32)
    pred_mask = gt_mask.copy()
    pres = np.ones((2, 3, 2), bool)
    gt_bbox = np.tile(np.array([0, 0, 4, 4], np.float32), (2, 3, 2, 1))
    out = pred_eval_step(
        gt, pred, None, gt_mask, pred_mask, pres, gt_bbox, gt_bbox,
        eval_traj=True, num_classes=4,
    )
    assert set(out) == {"mse", "ssim", "psnr", "percept_dist", "ari", "fari",
                        "miou", "ap", "ar"}
    assert all(len(v) == 3 for v in out.values())
    assert all(a == pytest.approx(1.0) for a in out["ari"])  # identical masks
    assert all(m == pytest.approx(1.0) for m in out["miou"])
    assert all(p > 20 for p in out["psnr"])


def test_pred_eval_step_uint8_wire_and_device_pred():
    """The uint8 GT wire format + device-resident predictions (the
    cli/test_vp hot path) must give the same metrics as host-f32 inputs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    # gt originates from uint8 pixels (as real video data does), so the
    # uint8 wire roundtrip is exactly lossless
    gt_u8 = rng.integers(0, 256, (2, 3, 16, 16, 3), dtype=np.uint8)
    gt = gt_u8.astype(np.float32) / 127.5 - 1.0
    pred = np.clip(gt + 0.05 * rng.normal(size=gt.shape).astype(np.float32), -1, 1)
    gt_mask = rng.integers(0, 3, (2, 3, 16, 16)).astype(np.int64)
    pred_mask = gt_mask.copy()
    pres = np.ones((2, 3, 2), bool)
    gt_bbox = np.tile(np.array([0, 0, 4, 4], np.float32), (2, 3, 2, 1))

    ref = pred_eval_step(gt, pred, None, gt_mask, pred_mask, pres,
                         gt_bbox, gt_bbox, eval_traj=True, num_classes=4)
    out = pred_eval_step(
        gt_u8, jnp.asarray(pred), None,
        gt_mask.astype(np.int32), jnp.asarray(pred_mask), pres,
        gt_bbox, jnp.asarray(gt_bbox), eval_traj=True, num_classes=4,
    )
    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
