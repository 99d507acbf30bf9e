"""OBJ3D (G-SWM) video / slots datasets.

Behavioral spec: /root/reference/slotformer/base_slots/datasets/obj3d.py —
PNG-frame video folders (``test_{i}.png``, 1-indexed), train clips sampled
at every valid start, val one clip per video, empty bbox stubs for metric-API
compatibility, slots variant joining a precomputed dict keyed by folder name.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np

from ..runtime.datamodule import Dataset
from ..runtime.io import glob_all, load_obj, read_img
from .utils import BaseTransforms


class Obj3DDataset(Dataset):

    def __init__(
        self,
        data_root: str,
        split: str,
        obj3d_transform: BaseTransforms,
        n_sample_frames: int = 6,
        frame_offset: Optional[int] = None,
        video_len: int = 50,
    ):
        assert split in ("train", "val", "test")
        self.data_root = os.path.join(data_root, split)
        self.split = split
        self.obj3d_transform = obj3d_transform
        self.n_sample_frames = n_sample_frames
        self.frame_offset = frame_offset or 1
        self.video_len = video_len
        self.valid_idx = self._get_sample_idx()
        self.load_video = False

    def _get_sample_idx(self):
        valid_idx = []
        files = glob_all(self.data_root, only_dir=True)
        self.files = [s.rstrip("/") for s in files]
        self.num_videos = len(self.files)
        for folder in self.files:
            if self.split == "train":
                max_start = (
                    self.video_len - (self.n_sample_frames - 1) * self.frame_offset
                )
                valid_idx += [(folder, i) for i in range(max_start)]
            else:
                valid_idx += [(folder, 0)]
        return valid_idx

    def _get_video_start_idx(self, idx):
        return self.valid_idx[idx]

    def _read_frames(self, idx) -> np.ndarray:
        folder, start_idx = self.valid_idx[idx]
        start_idx += 1  # frames are 1-indexed: test_1.png
        frames = [
            read_img(osp.join(folder, f"test_{start_idx + n * self.frame_offset}.png"))
            for n in range(self.n_sample_frames)
        ]
        frames = [self.obj3d_transform(f) for f in frames]
        return np.stack(frames, axis=0).astype(np.float32)

    def _read_bboxes(self, idx):
        """Empty bbox/pres stubs for metric-API compatibility."""
        bboxes = np.zeros((self.n_sample_frames, 5, 4), np.float32)
        pres_mask = np.zeros((self.n_sample_frames, 5), bool)
        return bboxes, pres_mask

    def get_video(self, video_idx):
        folder = self.files[video_idx]
        num_frames = (self.video_len + 1) // self.frame_offset
        frames = [
            read_img(osp.join(folder, f"test_{1 + n * self.frame_offset}.png"))
            for n in range(num_frames)
        ]
        frames = [self.obj3d_transform(f) for f in frames]
        return {
            "video": np.stack(frames, axis=0).astype(np.float32),
            "data_idx": video_idx,
        }

    def __getitem__(self, idx):
        if self.load_video:
            return self.get_video(idx)
        out = {"data_idx": idx, "img": self._read_frames(idx)}
        if self.split != "train":
            out["bbox"], out["pres_mask"] = self._read_bboxes(idx)
        return out

    def __len__(self):
        if self.load_video:
            return len(self.files)
        return len(self.valid_idx)


class Obj3DSlotsDataset(Obj3DDataset):

    def __init__(
        self,
        data_root,
        video_slots,
        split,
        obj3d_transform,
        n_sample_frames=16,
        frame_offset=None,
        video_len=50,
    ):
        super().__init__(
            data_root=data_root,
            split=split,
            obj3d_transform=obj3d_transform,
            n_sample_frames=n_sample_frames,
            frame_offset=frame_offset,
            video_len=video_len,
        )
        self.video_slots = video_slots

    def _read_slots(self, idx) -> np.ndarray:
        folder, start_idx = self.valid_idx[idx]
        slots = self.video_slots[os.path.basename(folder)]  # [T, N, C]
        slots = [
            slots[start_idx + n * self.frame_offset]
            for n in range(self.n_sample_frames)
        ]
        return np.stack(slots, axis=0).astype(np.float32)

    def __getitem__(self, idx):
        out = {
            "data_idx": idx,
            "slots": self._read_slots(idx),
            "img": self._read_frames(idx),
        }
        if self.split != "train":
            out["bbox"], out["pres_mask"] = self._read_bboxes(idx)
        return out


def build_obj3d_dataset(params, val_only=False):
    args = dict(
        data_root=params.data_root,
        split="val",
        obj3d_transform=BaseTransforms(params.resolution),
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.frame_offset,
        video_len=params.video_len,
    )
    val_dataset = Obj3DDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    return Obj3DDataset(**args), val_dataset


def build_obj3d_slots_dataset(params, val_only=False):
    slots = load_obj(params.slots_root)
    args = dict(
        data_root=params.data_root,
        video_slots=slots["val"],
        split="val",
        obj3d_transform=BaseTransforms(params.resolution),
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.frame_offset,
        video_len=params.video_len,
    )
    val_dataset = Obj3DSlotsDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["video_slots"] = slots["train"]
    return Obj3DSlotsDataset(**args), val_dataset
