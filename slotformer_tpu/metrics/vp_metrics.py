"""Video-prediction & object-centric evaluation metrics.

Behavioral spec: /root/reference/slotformer/video_prediction/vp_utils.py —
``postproc_mask`` (background-aware argmax), ``masks_to_boxes`` (+empty-mask
handling), video-prediction MSE (summed over spatial dims), per-frame
PSNR/SSIM (skimage conventions: gaussian weights, sigma 1.5, no sample
covariance, data_range 255), ARI/FG-ARI (google slot-attention-video
formula), Hungarian-matched mIoU with undetected-object penalty (the
post-fix version, README.md:31-35), bbox precision/recall @ IoU 0.5, and the
``pred_eval_step`` per-timestep aggregator.

TPU-native design: everything differentiable/batched (MSE, PSNR, SSIM, ARI,
pairwise IoU tables) is jitted jnp over ALL timesteps at once — one device
program per eval batch instead of the reference's per-frame python loop with
GPU->CPU sync each step (test_vp call stack, SURVEY.md §3.4). Only the tiny
Hungarian assignment (scipy, <=8x8) and greedy bbox matching run on host.

Images here are NHWC [B, T, H, W, C] in [-1, 1].
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

FG_THRE = 0.5

PALETTE = [(0, 255, 0), (0, 0, 255), (0, 255, 255), (255, 255, 0),
           (255, 0, 255), (100, 100, 255), (200, 200, 100), (170, 120, 200),
           (255, 0, 0), (200, 100, 100), (10, 200, 100), (200, 200, 200),
           (50, 50, 50)]
PALETTE_np = np.array(PALETTE, dtype=np.uint8)


def to_rgb_from_tensor(x):
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# mask post-processing
# ---------------------------------------------------------------------------

def postproc_mask(batch_masks: jnp.ndarray) -> jnp.ndarray:
    """[B, T, N, H, W, 1] soft masks -> [B, T, H, W] int ids.

    Background-aware argmax (vp_utils.py:20-41): the slot whose max
    activation is smallest is 'background'; pixels where no slot exceeds
    FG_THRE are forced to that slot.
    """
    B, T, N, H, W, _ = batch_masks.shape
    m = batch_masks.reshape(B * T, N, H * W)
    slots_max = m.max(-1)  # [BT, N]
    bg_idx = slots_max.argmin(-1)  # [BT]
    spatial_max = m.max(1)  # [BT, HW]
    bg_pixels = spatial_max < FG_THRE  # [BT, HW]
    is_bg_slot = jax.nn.one_hot(bg_idx, N, dtype=bool)  # [BT, N]
    boost = is_bg_slot[:, :, None] & bg_pixels[:, None, :]
    m = jnp.where(boost, 1.0, m)
    return m.argmax(1).reshape(B, T, H, W).astype(jnp.int32)


def masks_to_boxes(masks: jnp.ndarray, num_boxes: int = 7) -> jnp.ndarray:
    """[B, T, H, W] int masks -> [B, T, num_boxes, 4] xyxy; empty -> -1
    (vp_utils.py:44-69)."""
    B, T, H, W = masks.shape
    oh = jax.nn.one_hot(masks, num_boxes, dtype=jnp.float32)  # [B,T,H,W,N]
    ys = jnp.arange(H, dtype=jnp.float32)[None, None, :, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, None, :, None]
    big = 1e9
    x1 = jnp.min(jnp.where(oh > 0, xs, big), axis=(2, 3))
    y1 = jnp.min(jnp.where(oh > 0, ys, big), axis=(2, 3))
    x2 = jnp.max(jnp.where(oh > 0, xs, -big), axis=(2, 3))
    y2 = jnp.max(jnp.where(oh > 0, ys, -big), axis=(2, 3))
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)  # [B, T, N, 4]
    empty = oh.sum(axis=(2, 3)) == 0  # [B, T, N]
    return jnp.where(empty[..., None], -1.0, boxes)


# ---------------------------------------------------------------------------
# pixel metrics
# ---------------------------------------------------------------------------

def mse_metric(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] in [0, 1]; video-prediction convention: SUM over spatial
    dims, mean over batch+channels (vp_utils.py:72-76)."""
    return ((x - y) ** 2).sum(axis=(1, 2)).mean()


def psnr_metric(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] in [0, 1]; per-sample PSNR (data_range=1), mean."""
    mse = ((x - y) ** 2).mean(axis=(1, 2, 3))
    return (-10.0 * jnp.log10(jnp.maximum(mse, 1e-12))).mean()


def _gaussian_kernel1d(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _gauss_filter(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian filter, VALID padding. img [B, H, W, C]."""
    C = img.shape[-1]
    kh = jnp.asarray(kern).reshape(-1, 1, 1, 1)
    kw = jnp.asarray(kern).reshape(1, -1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(img.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        img, jnp.tile(kh, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
    )
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(kw, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
    )
    return out


def ssim_metric(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """[B, H, W, C] in [0, 1] -> mean SSIM, skimage conventions
    (gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
    data_range=255 — vp_utils.py:91-106)."""
    x = x * 255.0
    y = y * 255.0
    kern = _gaussian_kernel1d()
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    ux = _gauss_filter(x, kern)
    uy = _gauss_filter(y, kern)
    uxx = _gauss_filter(x * x, kern)
    uyy = _gauss_filter(y * y, kern)
    uxy = _gauss_filter(x * y, kern)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    A1 = 2.0 * ux * uy + C1
    A2 = 2.0 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    return S.mean()


# ---------------------------------------------------------------------------
# clustering metrics
# ---------------------------------------------------------------------------

def adjusted_rand_index(
    true_ids: jnp.ndarray,
    pred_ids: jnp.ndarray,
    num_classes: int,
    ignore_background: bool = False,
) -> jnp.ndarray:
    """ARI over [B, T, H, W] int id maps -> [B] scores
    (google slot-attention-video formula, vp_utils.py:114-163)."""
    if true_ids.ndim == 3:
        true_ids = true_ids[:, None]
    if pred_ids.ndim == 3:
        pred_ids = pred_ids[:, None]
    true_oh = jax.nn.one_hot(true_ids, num_classes, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    pred_oh = jax.nn.one_hot(pred_ids, num_classes, dtype=true_oh.dtype)
    if ignore_background:
        true_oh = true_oh[..., 1:]
    N = jnp.einsum("bthwc,bthwk->bck", true_oh, pred_oh)
    A = N.sum(-1)
    B = N.sum(-2)
    num_points = A.sum(1)
    rindex = (N * (N - 1)).sum(axis=(1, 2))
    aindex = (A * (A - 1)).sum(1)
    bindex = (B * (B - 1)).sum(1)
    expected = aindex * bindex / jnp.maximum(num_points * (num_points - 1), 1)
    max_rindex = (aindex + bindex) / 2
    denom = max_rindex - expected
    ari = (rindex - expected) / denom
    return jnp.where(denom != 0, ari, 1.0)


def ARI_metric(x, y, num_classes: int) -> float:
    assert "int" in str(np.asarray(x).dtype) and "int" in str(np.asarray(y).dtype)
    return float(adjusted_rand_index(jnp.asarray(x), jnp.asarray(y), num_classes).mean())


def fARI_metric(x, y, num_classes: int) -> float:
    assert "int" in str(np.asarray(x).dtype) and "int" in str(np.asarray(y).dtype)
    return float(
        adjusted_rand_index(
            jnp.asarray(x), jnp.asarray(y), num_classes, ignore_background=True
        ).mean()
    )


# ---------------------------------------------------------------------------
# Hungarian-matched mIoU
# ---------------------------------------------------------------------------

def pairwise_iou_tables(
    gt_mask: jnp.ndarray, pred_mask: jnp.ndarray, n_gt: int, n_pred: int
) -> jnp.ndarray:
    """[B, HW] int masks -> [B, n_gt-1, n_pred] IoU tables (gt fg classes
    only; gt id 0 = background). Device-side bulk compute; the Hungarian
    matching runs on host over these tiny tables."""
    true_oh = jax.nn.one_hot(gt_mask, n_gt, dtype=jnp.float32)[..., 1:]
    pred_oh = jax.nn.one_hot(pred_mask, n_pred, dtype=jnp.float32)
    intersect = jnp.einsum("bpn,bpm->bnm", true_oh, pred_oh)
    union = (
        true_oh.sum(1)[:, :, None] + pred_oh.sum(1)[:, None, :] - intersect
    )
    return intersect / (union + 1e-8)


def hungarian_miou_from_table(iou: np.ndarray, n_eff: int) -> float:
    """One sample: iou [n_gt_fg, n_pred]; ``n_eff`` = this sample's max gt id
    (the reference's per-sample ``F.one_hot(gt)[..., 1:]`` row count,
    vp_utils.py:227-229). Rows are gt ids 1..n_eff — an id ABSENT from the
    sample but below the max still counts as an undetected object (IoU-0
    row), exactly like the reference; the sum is always divided by n_eff
    (vp_utils.py:240-243: both branches normalize by N). Extra zero columns
    from a wider global n_pred are value-neutral (they can only absorb
    otherwise-unmatched rows at IoU 0). Golden-pinned against the executed
    reference in tests/test_metrics_golden.py."""
    iou = iou[:n_eff]
    N = iou.shape[0]
    if N == 0:
        # degenerate all-background gt: the reference nan's here (mean of an
        # empty match); score it perfect instead of poisoning the batch mean
        return 1.0
    row, col = linear_sum_assignment(iou, maximize=True)
    return float(iou[row, col].sum() / N)


def miou_metric(gt_mask: np.ndarray, pred_mask: np.ndarray, n_gt: int, n_pred: int) -> float:
    """[B, H, W] int masks -> mean Hungarian-matched IoU."""
    B = gt_mask.shape[0]
    gm = jnp.asarray(gt_mask.reshape(B, -1))
    pm = jnp.asarray(pred_mask.reshape(B, -1))
    tables = np.asarray(pairwise_iou_tables(gm, pm, n_gt, n_pred))
    gm_np = np.asarray(gm)
    ious = [
        hungarian_miou_from_table(tables[i], int(gm_np[i].max()))
        for i in range(B)
    ]
    return float(np.mean(ious))


# ---------------------------------------------------------------------------
# bbox precision / recall
# ---------------------------------------------------------------------------

def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, 4] x [M, 4] xyxy -> [N, M] IoU."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-8)


def bbox_precision_recall(gt_pres_mask, gt_bbox, pred_bbox, ovthresh=0.5):
    """Greedy best-IoU matching per gt box (vp_utils.py:180-211)."""
    gt_bbox = np.asarray(gt_bbox)[np.asarray(gt_pres_mask, bool)]
    pred_bbox = np.asarray(pred_bbox)
    pred_bbox = pred_bbox[pred_bbox[:, 0] >= 0.0]
    N, M = gt_bbox.shape[0], pred_bbox.shape[0]
    if N == 0:
        # nothing to detect: perfect recall; precision penalized by spurious preds
        return (1.0, 1.0) if M == 0 else (0.0, 1.0)
    if M == 0:
        return 0.0, 0.0
    tp = 0
    used = [False] * M
    ious = box_iou(gt_bbox, pred_bbox)
    for i in range(N):
        j = int(ious[i].argmax())
        if ious[i, j] >= ovthresh and not used[j]:
            tp += 1
            used[j] = True
    return tp / float(M), tp / float(N)


def batch_bbox_precision_recall(gt_pres_mask, gt_bbox, pred_bbox):
    aps, ars = [], []
    for i in range(gt_pres_mask.shape[0]):
        ap, ar = bbox_precision_recall(gt_pres_mask[i], gt_bbox[i], pred_bbox[i])
        aps.append(ap)
        ars.append(ar)
    return float(np.mean(aps)), float(np.mean(ars))


# ---------------------------------------------------------------------------
# per-timestep aggregator
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2,))
def _pixel_metrics_all_t(gt, pred, T):
    """gt/pred [B, T, H, W, 3] in [-1, 1] -> per-step (mse, psnr, ssim)."""
    gt = to_rgb_from_tensor(gt)
    pred = to_rgb_from_tensor(pred)

    def per_t(t):
        g, p = gt[:, t], pred[:, t]
        return mse_metric(g, p), psnr_metric(g, p), ssim_metric(g, p)

    out = [per_t(t) for t in range(T)]
    mse = jnp.stack([o[0] for o in out])
    psnr = jnp.stack([o[1] for o in out])
    ssim = jnp.stack([o[2] for o in out])
    return mse, psnr, ssim


@functools.partial(jax.jit, static_argnums=(2,))
def _traj_tables_all_t(gt_mask, pred_mask, num_classes):
    """gt/pred [B, T, H, W] int ids -> per-step ARI [T], FG-ARI [T], IoU
    tables [B, T, C-1, C] and present-gt [B, T, C-1] in ONE device program
    (the reference loops per frame with a device sync each step; per-call
    RTT on the tunneled TPU makes that T x 3 x ~60 ms of pure overhead)."""
    B, T, H, W = gt_mask.shape
    g = gt_mask.reshape(B * T, 1, H, W)
    p = pred_mask.reshape(B * T, 1, H, W)
    ari = adjusted_rand_index(g, p, num_classes).reshape(B, T).mean(0)
    fari = adjusted_rand_index(
        g, p, num_classes, ignore_background=True).reshape(B, T).mean(0)
    gm = gt_mask.reshape(B * T, H * W)
    pm = pred_mask.reshape(B * T, H * W)
    tables = pairwise_iou_tables(gm, pm, num_classes, num_classes)
    n_eff = gm.max(1)  # per-sample gt max id = reference row count
    return (
        ari,
        fari,
        tables.reshape(B, T, num_classes - 1, num_classes),
        n_eff.reshape(B, T),
    )


def pred_eval_step(
    gt,
    pred,
    lpips_fn=None,
    gt_mask=None,
    pred_mask=None,
    gt_pres_mask=None,
    gt_bbox=None,
    pred_bbox=None,
    eval_traj: bool = True,
    num_classes: Optional[int] = None,
) -> Dict[str, List[float]]:
    """Per-timestep metric dict (reference vp_utils.py:258-344).

    gt/pred: [B, T, H, W, 3] in [-1, 1] (NHWC — reference uses NCHW); gt
    may instead arrive as uint8 [0, 255] (the test_vp wire format — 4x
    smaller host->device transfer through the tunneled chip) and is
    normalized on device. masks: [B, T, H, W] int (any int dtype).
    pres_mask [B, T, N]; bboxes [B, T, N/M, 4]. Device arrays are accepted
    everywhere a host array is (pred stays device-resident in cli/test_vp —
    no host round-trip between the rollout and the metrics).
    ``lpips_fn(x, y) -> [B]`` or None (metric reported as 0 when the LPIPS
    weights are unavailable — see metrics.lpips).
    """
    gt = jnp.asarray(gt)
    if gt.dtype == jnp.uint8:
        gt = gt.astype(jnp.float32) / 127.5 - 1.0
    pred = jnp.asarray(pred)
    assert gt.ndim == pred.ndim == 5 and gt.shape == pred.shape
    assert gt.shape[-1] == 3
    T = gt.shape[1]

    mse, psnr, ssim = _pixel_metrics_all_t(gt, pred, T)
    mse, psnr, ssim = np.asarray(mse), np.asarray(psnr), np.asarray(ssim)

    if lpips_fn is None:
        all_percept = [0.0] * T
    else:
        # one batched call over all timesteps instead of T dispatches
        B = gt.shape[0]
        d = np.asarray(
            lpips_fn(
                gt.reshape((B * T,) + gt.shape[2:]),
                pred.reshape((B * T,) + pred.shape[2:]),
            )
        ).reshape(B, T)
        all_percept = d.mean(0).tolist()

    all_ari, all_fari, all_miou, all_ap, all_ar = [], [], [], [], []
    if eval_traj:
        assert gt_mask is not None and pred_mask is not None
        # only materialize the masks on host when nc must be derived from
        # them — with num_classes given (the recompile-safe path) they go
        # straight to the device table program
        nc = num_classes or int(
            max(np.asarray(gt_mask).max(), np.asarray(pred_mask).max()) + 1
        )
        B = gt_mask.shape[0]
        ari_t, fari_t, tables, n_eff = _traj_tables_all_t(
            jnp.asarray(gt_mask).astype(jnp.int32),
            jnp.asarray(pred_mask).astype(jnp.int32), nc
        )
        all_ari = np.asarray(ari_t).astype(float).tolist()
        all_fari = np.asarray(fari_t).astype(float).tolist()
        tables = np.asarray(tables)
        n_eff = np.asarray(n_eff)
        # fetch once, not per-t (pred_bbox may be a device array)
        gt_pres_mask = np.asarray(gt_pres_mask)
        gt_bbox = np.asarray(gt_bbox)
        pred_bbox = np.asarray(pred_bbox)
        for t in range(T):
            # tiny host Hungarians (<=C x C) over precomputed device tables
            all_miou.append(float(np.mean([
                hungarian_miou_from_table(tables[i, t], int(n_eff[i, t]))
                for i in range(B)
            ])))
            ap, ar = batch_bbox_precision_recall(
                gt_pres_mask[:, t], gt_bbox[:, t], pred_bbox[:, t],
            )
            all_ap.append(ap)
            all_ar.append(ar)
    else:
        all_ari = all_fari = all_miou = all_ap = all_ar = [0.0] * T

    return {
        "mse": mse.tolist(),
        "ssim": ssim.tolist(),
        "psnr": psnr.tolist(),
        "percept_dist": all_percept,
        "ari": all_ari,
        "fari": all_fari,
        "miou": all_miou,
        "ap": all_ap,
        "ar": all_ar,
    }
