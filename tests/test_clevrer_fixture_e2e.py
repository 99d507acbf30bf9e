"""CLEVRER-format end-to-end test over REAL on-disk fixtures.

Synthesizes a miniature CLEVRER tree — 128-frame mp4 videos in the split
directory layout, motion-trajectory annotation JSONs, and derender-proposal
JSONs with COCO-RLE masks — then drives the actual CLI stack over the
*CLEVRER dataset classes* (not the synthetic dataset):

    extract_slots -> rollout_slots (128 obs -> 160) -> test_vp

exercising video decode, mask/bbox RLE loading, and ``filter_enter``
annotation filtering with files on disk (reference layout:
/root/reference/slotformer/base_slots/datasets/clevrer.py:68-275, docs/clevrer.md).
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from slotformer_tpu.runtime import load_obj, save_checkpoint
from slotformer_tpu.runtime.io import save_video

VIDEO_LEN = 128
H, W = 24, 32
N_VIDEOS = 3  # val split: video_10000..10002
ENTER_VIDEO, ENTER_T = 10001, 60  # object 1 enters mid-video here


def _rle_encode(mask: np.ndarray) -> dict:
    """COCO uncompressed RLE (column-major runs, 0-run first)."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": runs}


def test_rle_encode_roundtrip():
    from slotformer_tpu.datasets.utils import rle_decode

    rng = np.random.default_rng(0)
    m = (rng.random((24, 32)) > 0.7).astype(np.uint8)
    np.testing.assert_array_equal(rle_decode(_rle_encode(m)), m)


def _make_scene(video_id: int, root: str) -> None:
    """One video + annotation + proposals: two moving squares; object 1 of
    ENTER_VIDEO is out of view (empty mask) until ENTER_T."""
    rng = np.random.default_rng(video_id)
    y0, x0 = int(rng.integers(2, H - 8)), 2
    y1, x1 = int(rng.integers(2, H - 8)), 6
    frames, objects_per_frame, inside_per_frame = [], [], []
    for t in range(VIDEO_LEN):
        img = np.zeros((H, W, 3), np.float32)
        m0 = np.zeros((H, W), np.uint8)
        m0[y0 : y0 + 5, (x0 + t // 4) % (W - 5) : (x0 + t // 4) % (W - 5) + 5] = 1
        img[m0 > 0] = (1.0, 0.1, 0.1)
        obj1_in = not (video_id == ENTER_VIDEO and t < ENTER_T)
        m1 = np.zeros((H, W), np.uint8)
        if obj1_in:
            c = (x1 + t // 3) % (W - 4)
            m1[y1 : y1 + 4, c : c + 4] = 1
            img[m1 > 0] = (0.1, 1.0, 0.1)
        frames.append(img)
        objects_per_frame.append(
            {"frame_index": t,
             "objects": [{"mask": _rle_encode(m0)}, {"mask": _rle_encode(m1)}]}
        )
        inside_per_frame.append(
            {"frame_id": t,
             "objects": [{"inside_camera_view": True},
                         {"inside_camera_view": obj1_in}]}
        )
    sub = f"video_{(video_id // 1000) * 1000:05d}-{(video_id // 1000 + 1) * 1000:05d}"
    vdir = os.path.join(root, "videos", "val", sub)
    os.makedirs(vdir, exist_ok=True)
    save_video(np.stack(frames), os.path.join(vdir, f"video_{video_id:05d}.mp4"),
               fps=8)
    adir = os.path.join(root, "annotations", "val",
                        sub.replace("video", "annotation"))
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(adir, f"annotation_{video_id:05d}.json"), "w") as f:
        json.dump({"motion_trajectory": inside_per_frame}, f)
    pdir = os.path.join(root, "derender_proposals")
    os.makedirs(pdir, exist_ok=True)
    with open(os.path.join(pdir, f"proposal_{video_id:05d}.json"), "w") as f:
        json.dump({"frames": objects_per_frame}, f)


SAVI_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'StoSAVi'
    dataset = 'clevrer'
    data_root = {root!r}
    resolution = (16, 16)
    n_sample_frames = 6
    input_frames = 6
    frame_offset = 1
    filter_enter = False
    train_batch_size = 8
    val_batch_size = 8
    num_workers = 0
    max_epochs = 1
    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    slot_dict = dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                     num_iterations=2, kernel_mlp=False)
    enc_dict = dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4), dec_ks=3)
    pred_dict = dict(pred_type='mlp', pred_rnn=False, pred_norm_first=True)
    loss_dict = dict(use_post_recon_loss=True, kld_method='none')
    post_recon_loss_w = 1.0
    kld_loss_w = 0.0
"""

SF_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'SlotFormer'
    dataset = 'clevrer_slots'
    data_root = {root!r}
    slots_root = {slots!r}
    resolution = (16, 16)
    video_len = 128
    n_sample_frames = 9
    input_frames = 3
    frame_offset = 1
    filter_enter = True
    load_img = True
    load_mask = False
    train_batch_size = 8
    val_batch_size = 8
    num_workers = 0
    max_epochs = 1
    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    slot_dict = dict(num_slots=3, slot_size=16)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4), dec_ks=3,
                    dec_ckp_path='')
    rollout_dict = dict(num_slots=3, slot_size=16, history_len=3, t_pe='sin',
                        d_model=16, num_layers=1, num_heads=2, ffn_dim=32)
    loss_dict = dict(rollout_len=6, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
"""


@pytest.fixture(scope="module")
def clevrer_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clevrer_fixture"))
    for vid in range(10000, 10000 + N_VIDEOS):
        _make_scene(vid, root)
    return root


def test_clevrer_dataset_classes_on_disk(clevrer_tree):
    """Dataset classes read the real tree: frames, masks/bboxes from RLE
    proposals, filter_enter from annotation trajectories."""
    from slotformer_tpu.datasets.clevrer import CLEVRERDataset
    from slotformer_tpu.datasets.utils import BaseTransforms

    ds = CLEVRERDataset(
        data_root=clevrer_tree,
        clevrer_transforms=BaseTransforms((16, 16)),
        split="val",
        max_n_objects=2,
        n_sample_frames=6,
        warmup_len=3,
        frame_offset=1,
        load_mask=True,
        filter_enter=False,
    )
    assert len(ds.files) == N_VIDEOS
    item = ds[0]
    assert item["img"].shape == (6, 16, 16, 3)
    assert item["mask"].shape == (6, 16, 16)
    assert item["mask"].max() >= 1  # objects present in the seg map
    assert item["bbox"].shape == (6, 3, 4)
    assert item["pres_mask"].any()
    vid = ds.get_video(0)
    assert vid["video"].shape == (VIDEO_LEN, 16, 16, 3)
    assert not vid["error_flag"]

    # filter_enter drops clips straddling the entering object
    ds_f = CLEVRERDataset(
        data_root=clevrer_tree,
        clevrer_transforms=BaseTransforms((16, 16)),
        split="val",
        max_n_objects=2,
        n_sample_frames=48,
        warmup_len=3,
        frame_offset=1,
        load_mask=False,
        filter_enter=True,
    )
    enter_video_idx = ds_f.files.index(
        os.path.join(clevrer_tree, "videos", "val", "video_10000-11000",
                     f"video_{ENTER_VIDEO:05d}.mp4")
    )
    starts = [s for v, s in ds_f.valid_idx if v == enter_video_idx]
    assert starts, "filter_enter removed every clip of the entering video"
    for s in starts:
        assert not (s <= ENTER_T - 1 <= s + 47 and s < ENTER_T <= s + 47) or \
            not (s < ENTER_T <= s + 47), f"clip at {s} straddles the entry"


def test_clevrer_pipeline_extract_rollout_testvp(clevrer_tree, tmp_path, capsys):
    """extract_slots -> rollout_slots (128->160) -> test_vp over the real
    CLEVRER classes, with random-init weights (pipeline plumbing, not
    metric quality)."""
    from slotformer_tpu.cli.extract_slots import main as extract_main
    from slotformer_tpu.cli.rollout_slots import main as rollout_main
    from slotformer_tpu.cli.test_vp import main as test_vp_main
    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    savi_cfg = str(tmp_path / "savi_clevrer_tiny.py")
    with open(savi_cfg, "w") as f:
        f.write(SAVI_CFG.format(root=clevrer_tree))
    slots_path = str(tmp_path / "slots.pkl")
    sf_cfg = str(tmp_path / "slotformer_clevrer_tiny.py")
    with open(sf_cfg, "w") as f:
        f.write(SF_CFG.format(root=clevrer_tree, slots=slots_path))

    # random-init checkpoints
    savi_params = load_params(savi_cfg)
    savi = build_model(savi_params)
    rng = jax.random.PRNGKey(0)
    savi_vars = savi.init(
        {"params": rng, "sample": rng},
        {"img": np.zeros((1, 2, 16, 16, 3), np.float32)},
    )
    savi_ckp = str(tmp_path / "savi.ckpt.pkl")
    save_checkpoint(savi_ckp, savi_vars["params"], step=0)

    sf_params = load_params(sf_cfg)
    sf = build_model(sf_params)
    sf_vars = sf.init(
        jax.random.PRNGKey(0),
        {"slots": np.zeros((1, 9, 3, 16), np.float32)},
    )
    sf_ckp = str(tmp_path / "sf.ckpt.pkl")
    save_checkpoint(sf_ckp, sf_vars["params"], step=0)

    # stage 2: extract slots over whole videos (chunked encode w/ carry)
    extract_main([
        "--params", savi_cfg, "--weight", savi_ckp,
        "--save_path", slots_path, "--batch_size", "4", "--chunk_len", "24",
        "--subset", "val",
    ])
    slots = load_obj(slots_path)
    assert set(slots) == {"val"} and len(slots["val"]) == N_VIDEOS
    for v in slots["val"].values():
        assert v.shape == (VIDEO_LEN, 3, 16) and v.dtype == np.float32

    # rollout CLI wants train/val/test keyed dict; val-only is fine
    rollout_path = str(tmp_path / "rollout_slots.pkl")
    rollout_main([
        "--task", "clevrer", "--params", sf_cfg, "--weight", sf_ckp,
        "--save_path", rollout_path, "--batch_size", "4",
    ])
    ro = load_obj(rollout_path)
    assert len(ro["val"]) == N_VIDEOS
    for name, v in ro["val"].items():
        assert v.shape == (160, 3, 16)
        np.testing.assert_array_equal(v[:128], slots["val"][name])

    # stage 4: test_vp with masks/bboxes from the RLE proposals
    test_vp_main([
        "--params", sf_cfg, "--weight", sf_ckp,
        "--batch_size", "8", "--max_batches", "1",
        "--vis_dir", str(tmp_path / "vis"),
    ])
    out = capsys.readouterr().out
    assert "eval_traj=True" in out and "gt_mask_ids_max=2" in out
    # per-metric npy dumps written
    dumped = []
    for base, _, files in os.walk(tmp_path / "vis"):
        dumped += [f for f in files if f.endswith(".npy")]
    for m in ("psnr", "ari", "miou", "ar", "percept_dist"):
        assert f"{m}.npy" in dumped
