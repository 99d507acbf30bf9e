"""Dataset tests: transforms, RLE decode, CLEVRER/OBJ3D indexing on fixture
dirs, synthetic dataset determinism."""

import json
import os

import numpy as np
import pytest

from slotformer_tpu.datasets import (
    BaseTransforms,
    SyntheticVideoDataset,
    build_clevrer_slots_dataset,
    build_dataset,
    build_obj3d_dataset,
    rle_decode,
)
from slotformer_tpu.datasets.utils import masks_to_boxes_pad
from slotformer_tpu.runtime import BaseParams, dump_obj, save_img


def _rle_encode_compressed(mask: np.ndarray) -> dict:
    """COCO compressed-RLE encoder (test-only, inverse of rle_decode)."""
    h, w = mask.shape
    flat = mask.T.flatten()  # column-major
    # runs
    cnts = []
    val = 0
    run = 0
    for px in flat:
        if px == val:
            run += 1
        else:
            cnts.append(run)
            val = 1 - val
            run = 1
    cnts.append(run)
    # varint encode with delta for i > 2
    out = bytearray()
    for i, c in enumerate(cnts):
        x = c if i <= 2 else c - cnts[i - 2]
        more = True
        while more:
            nib = x & 0x1F
            x >>= 5
            more = not (
                (x == 0 and not (nib & 0x10)) or (x == -1 and (nib & 0x10))
            )
            if more:
                nib |= 0x20
            out.append(nib + 48)
    return {"size": [h, w], "counts": bytes(out).decode("ascii")}


def test_rle_decode_uncompressed():
    # 3x4 mask: column-major counts
    mask = np.zeros((3, 4), np.uint8)
    mask[1, 0] = 1
    mask[2, 0] = 1
    mask[0, 2] = 1
    flat = mask.T.flatten()
    # runs: count zeros then ones alternating
    counts, val, run = [], 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            val, run = 1 - val, 1
    counts.append(run)
    out = rle_decode({"size": [3, 4], "counts": counts})
    np.testing.assert_array_equal(out, mask)


def test_rle_decode_compressed_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = (rng.random((17, 23)) > 0.6).astype(np.uint8)
        rle = _rle_encode_compressed(mask)
        np.testing.assert_array_equal(rle_decode(rle), mask)


def test_base_transforms_range_and_shape():
    tf = BaseTransforms((32, 32))
    img = np.random.default_rng(0).integers(0, 256, (64, 48, 3), np.uint8)
    out = tf(img)
    assert out.shape == (32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    m = np.zeros((64, 48), np.int64)
    m[:32] = 2
    pm = tf.process_mask(m)
    assert pm.shape == (32, 32)
    assert set(np.unique(pm)) <= {0, 2}


def test_masks_to_boxes_pad():
    masks = np.zeros((3, 8, 8), np.uint8)
    masks[0, 2:5, 3:7] = 1  # box (3, 2, 6, 4)
    # mask 1 empty; mask 2 single pixel
    masks[2, 7, 0] = 1
    boxes, pres = masks_to_boxes_pad(masks, 5)
    assert pres.tolist() == [True, True, False, False, False]
    np.testing.assert_array_equal(boxes[0], [3, 2, 6, 4])
    np.testing.assert_array_equal(boxes[1], [0, 7, 0, 7])


# --------------------------------------------------------------- fixtures
def _make_obj3d_fixture(root, n_videos=3, video_len=8, res=16):
    for split in ("train", "val"):
        for v in range(n_videos):
            d = os.path.join(root, split, f"{v:03d}")
            os.makedirs(d)
            for t in range(1, video_len + 2):
                img = np.full((res, res, 3), (v * 40 + t) % 255, np.uint8)
                save_img(img, os.path.join(d, f"test_{t}.png"))


def test_obj3d_dataset_indexing(tmp_path):
    _make_obj3d_fixture(str(tmp_path))

    class P(BaseParams):
        dataset = "obj3d"
        data_root = str(tmp_path)
        resolution = (16, 16)
        n_sample_frames = 4
        frame_offset = 1
        video_len = 8

    train, val = build_dataset(P())
    # train: every valid start; val: one per video
    assert len(train) == 3 * (8 - 3)
    assert len(val) == 3
    s = train[0]
    assert s["img"].shape == (4, 16, 16, 3)
    sv = val[0]
    assert "bbox" in sv and sv["bbox"].shape == (4, 5, 4)
    vid = val.get_video(0)
    assert vid["video"].shape[0] == (8 + 1) // 1


def _make_clevrer_frames_fixture(root, split="train", ids=(0, 1), video_len=8):
    for i in ids:
        d = os.path.join(
            root, "videos", split, "video_00000-01000", f"video_{i:05d}"
        )
        os.makedirs(d)
        for t in range(video_len):
            save_img(
                np.full((16, 16, 3), (i * 50 + t) % 255, np.uint8),
                os.path.join(d, f"{t:06d}.jpg"),
            )
        # empty mp4 placeholder so _get_files finds it
        open(d + ".mp4", "wb").close()


def test_clevrer_slots_dataset(tmp_path):
    _make_clevrer_frames_fixture(str(tmp_path), "train")
    _make_clevrer_frames_fixture(str(tmp_path), "val", ids=(10000,))
    rng = np.random.default_rng(0)
    slots = {
        "train": {
            f"video_{i:05d}.mp4": rng.normal(size=(8, 3, 4)).astype(np.float32)
            for i in (0, 1)
        },
        "val": {
            "video_10000.mp4": rng.normal(size=(8, 3, 4)).astype(np.float32)
        },
    }
    slots_path = str(tmp_path / "slots.pkl")
    dump_obj(slots, slots_path)

    class P(BaseParams):
        dataset = "clevrer_slots"
        data_root = str(tmp_path)
        slots_root = slots_path
        resolution = (16, 16)
        n_sample_frames = 4
        input_frames = 2
        frame_offset = 1
        load_img = True
        filter_enter = False

    # video_len must match fixture
    import slotformer_tpu.datasets.clevrer as C

    train, val = build_clevrer_slots_dataset_patched(P(), C)
    s = train[0]
    assert s["slots"].shape == (4, 3, 4)
    assert s["img"].shape == (4, 16, 16, 3)
    assert not s["error_flag"]
    # slots content joins by basename + start index
    v_idx, start = train.valid_idx[0]
    fn = os.path.basename(train.files[v_idx])
    np.testing.assert_array_equal(s["slots"][0], slots["train"][fn][start])


def build_clevrer_slots_dataset_patched(params, C):
    """Build with video_len=8 (fixture length) instead of 128."""
    from slotformer_tpu.datasets.utils import BaseTransforms as BT
    from slotformer_tpu.runtime import load_obj

    slots = load_obj(params.slots_root)
    mk = lambda split, vs: C.CLEVRERSlotsDataset(
        data_root=params.data_root,
        video_slots=vs,
        clevrer_transforms=BT(params.resolution),
        split=split,
        video_len=8,
        n_sample_frames=params.n_sample_frames,
        warmup_len=params.input_frames,
        frame_offset=params.frame_offset,
        load_img=params.load_img,
        filter_enter=False,
    )
    return mk("train", slots["train"]), mk("val", slots["val"])


def test_synthetic_dataset_determinism():
    ds1 = SyntheticVideoDataset("train", num_videos=4, video_len=10,
                                resolution=(32, 32), n_sample_frames=3)
    ds2 = SyntheticVideoDataset("train", num_videos=4, video_len=10,
                                resolution=(32, 32), n_sample_frames=3)
    a, b = ds1[5], ds2[5]
    np.testing.assert_array_equal(a["img"], b["img"])
    assert a["img"].shape == (3, 32, 32, 3)
    assert a["img"].min() >= -1.0 and a["img"].max() <= 1.0
    # masks available
    ds3 = SyntheticVideoDataset("val", num_videos=2, video_len=10,
                                resolution=(32, 32), n_sample_frames=3,
                                load_mask=True)
    s = ds3[0]
    assert s["mask"].shape == (3, 32, 32)
    assert s["mask"].max() >= 1  # at least one object


def test_native_rle_matches_numpy():
    """The C decoder must agree with the numpy path on random masks."""
    from slotformer_tpu.native import rle_decode_native
    from slotformer_tpu.datasets import rle_decode

    rng = np.random.default_rng(3)
    for shape in [(17, 23), (64, 64), (3, 4)]:
        mask = (rng.random(shape) > 0.55).astype(np.uint8)
        rle = _rle_encode_compressed(mask)
        native = rle_decode_native(rle)
        if native is None:
            pytest.skip("no C compiler available")
        np.testing.assert_array_equal(native, mask)
        np.testing.assert_array_equal(rle_decode(rle), mask)
