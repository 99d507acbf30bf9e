"""CLEVRER video / slots datasets.

Behavioral spec: /root/reference/slotformer/base_slots/datasets/clevrer.py —
clip sampling over 128-frame videos (mp4 or pre-extracted jpg dirs),
deterministic file lists (train 0-10k, val 10k-15k, test 15k-20k, broken
video 10800 skipped), val sampling covering each frame once, RLE-mask ->
seg+bbox loading, ``filter_enter`` clip filtering on annotation
trajectories, corrupted-sample ``_rand_another`` retry, whole-video
``get_video``, and the slots variant joining a precomputed
``{video_fn: [T, N, C]}`` dict.

Emits NHWC float32 clips in [-1, 1].
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..runtime.datamodule import Dataset
from ..runtime.io import VideoReader, load_obj, read_img, strip_suffix
from .utils import BaseTransforms, anno2mask, compact, masks_to_boxes_pad


class CLEVRERDataset(Dataset):

    def __init__(
        self,
        data_root: str,
        clevrer_transforms: BaseTransforms,
        split: str = "train",
        max_n_objects: int = 6,
        video_len: int = 128,
        n_sample_frames: int = 6,
        warmup_len: int = 5,
        frame_offset: Optional[int] = None,
        load_mask: bool = False,
        filter_enter: bool = False,
    ):
        assert split in ("train", "val", "test")
        self.data_root = data_root
        self.split = split
        self.video_path = os.path.join(data_root, "videos", split)
        self.anno_path = os.path.join(data_root, "annotations", split)

        self.clevrer_transforms = clevrer_transforms
        self.max_n_objects = max_n_objects
        self.video_len = video_len
        self.n_sample_frames = n_sample_frames
        self.warmup_len = warmup_len
        self.frame_offset = (
            video_len // n_sample_frames if frame_offset is None else frame_offset
        )
        self.load_mask = load_mask
        self.filter_enter = filter_enter

        self.files = self._get_files()
        self.num_videos = len(self.files)
        if self.filter_enter:
            self.valid_idx = self._get_filtered_sample_idx()
        else:
            self.valid_idx = self._get_sample_idx()
        self.load_video = False

    # ------------------------------------------------------------- file list
    def _get_files(self):
        start, end = {
            "train": (0, 10000),
            "val": (10000, 15000),
            "test": (15000, 20000),
        }[self.split]
        paths = []
        for i in range(start, end):
            if i == 10800:  # annotation for this video is broken
                continue
            level = i // 1000
            video_dir = f"video_{level * 1000:05d}-{(level + 1) * 1000:05d}"
            p = os.path.join(self.video_path, video_dir, f"video_{i:05d}.mp4")
            # keep only videos present on disk (mp4 or pre-extracted frame
            # dir) so partial checkouts / fixtures work; the full dataset is
            # unaffected (the reference assumes all 5k/split exist)
            if os.path.isfile(p) or os.path.isdir(strip_suffix(p)):
                paths.append(p)
        expected = end - start - (1 if start <= 10800 < end else 0)
        if len(paths) < expected:
            # loud, not fatal: fixture trees legitimately carry a subset (or
            # only one split), but a typo'd data_root must not silently
            # train on nothing — steps_per_epoch == 0 makes that visible too
            print(f"[clevrer] WARNING: {len(paths)}/{expected} videos of "
                  f"split {self.split!r} present under {self.video_path}; "
                  "continuing with the subset (fixture/partial checkout?) — "
                  "check data_root if this is unexpected")
        return sorted(compact(paths))

    def _get_sample_idx(self):
        """(video_idx, start_frame) pairs; val/test cover each frame once."""
        valid_idx = []
        max_start = self.video_len - (self.n_sample_frames - 1) * self.frame_offset
        for video_idx in range(len(self.files)):
            if self.split == "train":
                valid_idx += [(video_idx, i) for i in range(max_start)]
            else:
                size = self.n_sample_frames * self.frame_offset
                starts = []
                for base in range(0, self.video_len - size + 1, size):
                    starts += [base + i for i in range(self.frame_offset)]
                valid_idx += [(video_idx, i) for i in starts]
        return valid_idx

    # -------------------------------------------------- filter_enter support
    def _get_enter_time(self, video_file):
        anno_file = video_file.replace("video", "annotation").replace(
            ".mp4", ".json"
        )
        anno = load_obj(anno_file)
        trajs = anno["motion_trajectory"]
        num_objs = len(trajs[0]["objects"])
        all_t = []
        for i in range(len(trajs) - 1):
            cur, nxt = trajs[i]["objects"], trajs[i + 1]["objects"]
            for j in range(num_objs):
                if (not cur[j]["inside_camera_view"]) and nxt[j][
                    "inside_camera_view"
                ]:
                    all_t.append(i + 1)
                    break
        return all_t

    def _has_obj_enter(self, enter_t, idx):
        MIN_FRAMES = 3
        t1 = idx + (self.warmup_len - 1 - MIN_FRAMES + 1) * self.frame_offset
        t2 = idx + (self.n_sample_frames - 1) * self.frame_offset
        return any(t1 < t <= t2 for t in enter_t)

    def _get_filtered_sample_idx(self):
        """Drop clips where an object enters mid-prediction
        (reference clevrer.py:248-275)."""
        valid_idx = []
        for video_idx, video_file in enumerate(self.files):
            enter_t = self._get_enter_time(video_file)
            if self.split == "train":
                max_start = (
                    self.video_len - (self.n_sample_frames - 1) * self.frame_offset
                )
                for idx in range(max_start):
                    if not self._has_obj_enter(enter_t, idx):
                        valid_idx.append((video_idx, idx))
            else:
                size = (self.n_sample_frames - 1) * self.frame_offset
                interval = size // 2
                for idx in range(0, self.video_len - size, interval):
                    max_idx = min(idx + interval, self.video_len - size)
                    for sub in range(idx, max_idx):
                        if not self._has_obj_enter(enter_t, sub):
                            valid_idx.append((video_idx, sub))
                            break
        return valid_idx

    # ---------------------------------------------------------------- reads
    def _rand_another(self, is_video: bool = False):
        if is_video:
            return self.get_video(int(np.random.choice(self.num_videos)))
        return self[int(np.random.choice(len(self)))]

    def _get_video_start_idx(self, idx):
        return self.valid_idx[idx]

    def _read_frames(self, idx) -> np.ndarray:
        video_idx, start_idx = self._get_video_start_idx(idx)
        video_path = self.files[video_idx]
        frame_dir = strip_suffix(video_path)
        if not os.path.isdir(frame_dir):
            with VideoReader(video_path) as cap:
                frames = [
                    cap.get_frame(start_idx + n * self.frame_offset)
                    for n in range(self.n_sample_frames)
                ]
        else:
            if len(os.listdir(frame_dir)) != self.video_len:
                raise ValueError("wrong video length")
            frames = [
                read_img(
                    os.path.join(
                        frame_dir, f"{start_idx + n * self.frame_offset:06d}.jpg"
                    )
                )
                for n in range(self.n_sample_frames)
            ]
        if any(f is None for f in frames):
            raise ValueError("corrupted video")
        frames = [self.clevrer_transforms(f) for f in frames]
        return np.stack(frames, axis=0).astype(np.float32)  # [T, H, W, 3]

    def _read_masks(self, idx):
        video_idx, start_idx = self._get_video_start_idx(idx)
        video_fn = os.path.basename(strip_suffix(self.files[video_idx]))
        anno_path = os.path.join(
            self.data_root, "derender_proposals", f"proposal_{video_fn[-5:]}.json"
        )
        anno = load_obj(anno_path)
        masks = [
            anno2mask(anno["frames"][start_idx + n * self.frame_offset])
            for n in range(self.n_sample_frames)
        ]
        masks = [self.clevrer_transforms.process_mask(m) for m in masks]
        boxes = [masks_to_boxes_pad(m[1:], self.max_n_objects + 1) for m in masks]
        seg = np.stack([m.argmax(0) for m in masks], axis=0).astype(np.int64)
        pres_mask = np.stack([b[1] for b in boxes], axis=0)
        bboxes = np.stack([b[0] for b in boxes], axis=0).astype(np.float32)
        return seg, pres_mask, bboxes

    def get_video(self, video_idx):
        video_path = self.files[video_idx]
        with VideoReader(video_path) as cap:
            video = cap.read_video()
        if len(video) != self.video_len or any(f is None for f in video):
            out = self._rand_another(is_video=True)
            out["error_flag"] = True
            return out
        video = [
            self.clevrer_transforms(f) for f in video[:: self.frame_offset]
        ]
        return {
            "video": np.stack(video, axis=0).astype(np.float32),
            "error_flag": False,
            "data_idx": video_idx,
        }

    def __getitem__(self, idx):
        if self.load_video:
            return self.get_video(idx)
        try:
            frames = self._read_frames(idx)
            out = {"data_idx": idx, "img": frames, "error_flag": False}
            if self.load_mask:
                out["mask"], out["pres_mask"], out["bbox"] = self._read_masks(idx)
        except ValueError:
            out = self._rand_another()
            out["error_flag"] = True
        return out

    def __len__(self):
        if self.load_video:
            return len(self.files)
        return len(self.valid_idx)


class CLEVRERSlotsDataset(CLEVRERDataset):
    """CLEVRER videos joined with precomputed slots
    (reference clevrer.py:278-363)."""

    def __init__(
        self,
        data_root,
        video_slots,
        clevrer_transforms,
        split="train",
        max_n_objects=6,
        video_len=128,
        n_sample_frames=16,
        warmup_len=5,
        frame_offset=None,
        load_img=False,
        load_mask=False,
        filter_enter=True,
    ):
        self.load_img = load_img
        super().__init__(
            data_root=data_root,
            clevrer_transforms=clevrer_transforms,
            split=split,
            max_n_objects=max_n_objects,
            video_len=video_len,
            n_sample_frames=n_sample_frames,
            warmup_len=warmup_len,
            frame_offset=frame_offset,
            load_mask=load_mask,
            filter_enter=filter_enter,
        )
        self.video_slots = video_slots

    def _read_slots(self, idx) -> np.ndarray:
        video_idx, start_idx = self._get_video_start_idx(idx)
        video_path = self.files[video_idx]
        try:
            slots = self.video_slots[os.path.basename(video_path)]  # [T, N, C]
        except KeyError:
            raise ValueError("missing slots")
        slots = [
            slots[start_idx + n * self.frame_offset]
            for n in range(self.n_sample_frames)
        ]
        return np.stack(slots, axis=0).astype(np.float32)

    def __getitem__(self, idx):
        try:
            out = {
                "data_idx": idx,
                "slots": self._read_slots(idx),
                "error_flag": False,
            }
            if self.load_img:
                out["img"] = self._read_frames(idx)
            if self.load_mask:
                out["mask"], out["pres_mask"], out["bbox"] = self._read_masks(idx)
        except ValueError:
            out = self._rand_another()
            out["error_flag"] = True
        return out


def build_clevrer_dataset(params, val_only=False, test_set=False):
    args = dict(
        data_root=params.data_root,
        clevrer_transforms=BaseTransforms(params.resolution),
        split="val",
        max_n_objects=6,
        n_sample_frames=params.n_sample_frames,
        warmup_len=params.input_frames,
        frame_offset=params.frame_offset,
        load_mask=params.get("load_mask", False),
        filter_enter=params.filter_enter,
    )
    if test_set:
        assert not val_only
        args["split"] = "test"
        return CLEVRERDataset(**args)
    val_dataset = CLEVRERDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    return CLEVRERDataset(**args), val_dataset


def build_clevrer_slots_dataset(params, val_only=False):
    slots = load_obj(params.slots_root)
    args = dict(
        data_root=params.data_root,
        video_slots=slots["val"],
        clevrer_transforms=BaseTransforms(params.resolution),
        split="val",
        max_n_objects=6,
        n_sample_frames=params.n_sample_frames,
        warmup_len=params.input_frames,
        frame_offset=params.frame_offset,
        load_img=params.load_img,
        load_mask=params.get("load_mask", False),
        filter_enter=params.filter_enter,
    )
    val_dataset = CLEVRERSlotsDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["video_slots"] = slots["train"]
    return CLEVRERSlotsDataset(**args), val_dataset
