"""Physion video / slots / label datasets.

Behavioral spec: /root/reference/slotformer/base_slots/datasets/physion.py —
8 scenarios x {training, readout, test} subsets via JSON split fixtures
shipped in-repo (splits/Physion/*.json), pre-extracted jpg frame folders,
precomputed dVAE token ``.npy`` loading with the TrainMP4s->TrainNpys-$dvae
path rewrite (physion.py:81-93), label CSVs with bad-stimuli filtering
(physion.py:256-310), one (video, label) pair per item in the label dataset.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import List, Optional

import numpy as np

from ..runtime.datamodule import Dataset
from ..runtime.io import load_obj, read_all_lines, read_img
from .utils import BaseTransforms

_SPLIT_DIR = osp.join(osp.dirname(osp.realpath(__file__)), "splits", "Physion")


class PhysionDataset(Dataset):

    def __init__(
        self,
        data_root: str,
        split: str,
        tasks: List[str],
        physion_transform: BaseTransforms,
        n_sample_frames: int = 6,
        frame_offset: Optional[int] = None,
        video_len: int = 150,
        subset: str = "training",
    ):
        if subset in ("training", "readout"):
            assert split in ("train", "val")
        elif subset == "test":
            assert split == "test"
        else:
            raise NotImplementedError(f"Unknown subset: {subset}")
        self.data_root = data_root
        self.split = split
        self.tasks = list(tasks)
        self.physion_transform = physion_transform
        self.n_sample_frames = n_sample_frames
        self.frame_offset = frame_offset or 1
        self.video_len = video_len
        self.subset = subset
        self.dvae_path = "dvae-none"  # set by builders for token loading
        self.valid_idx = self._get_sample_idx()
        self.load_video = False

    def _get_sample_idx(self):
        json_fn = osp.join(_SPLIT_DIR, f"{self.subset}_{self.split}.json")
        json_file = load_obj(json_fn)
        self.all_tasks = sorted(json_file.keys())
        self.task2num = {t: len(json_file[t]) for t in self.all_tasks}
        self.video_idx2task_idx = {}
        self.files = []
        if self.tasks[0].lower() == "all":
            self.tasks = list(json_file.keys())
        for task in self.tasks:
            i1 = len(self.files)
            self.files.extend(
                osp.join(self.data_root, f[:-4]) for f in json_file[task]
            )
            i2 = len(self.files)
            self.video_idx2task_idx.update(
                {i: self.all_tasks.index(task) for i in range(i1, i2)}
            )
        self.num_videos = len(self.files)
        valid_idx = []
        for folder in self.files:
            if self.split == "train":
                max_start = (
                    self.video_len - (self.n_sample_frames - 1) * self.frame_offset
                )
                valid_idx += [(folder, i) for i in range(max_start)]
            else:
                size = self.n_sample_frames * self.frame_offset
                starts = []
                for base in range(0, self.video_len - size + 1, size):
                    starts += [base + i for i in range(self.frame_offset)]
                valid_idx += [(folder, i) for i in starts]
        return valid_idx

    def _rand_another(self, is_video: bool = False):
        if is_video:
            return self.get_video(int(np.random.choice(self.num_videos)))
        return self[int(np.random.choice(len(self)))]

    def _get_video_start_idx(self, idx):
        return self.valid_idx[idx]

    def _read_frames(self, idx) -> np.ndarray:
        folder, start = self._get_video_start_idx(idx)
        assert osp.exists(folder), "Please extract frames from videos first."
        frames = [
            read_img(osp.join(folder, f"{start + n * self.frame_offset:06d}.jpg"))
            for n in range(self.n_sample_frames)
        ]
        if any(f is None for f in frames):
            raise ValueError
        return np.stack(
            [self.physion_transform(f) for f in frames], axis=0
        ).astype(np.float32)

    def _read_tokens(self, idx):
        """Precomputed dVAE tokens via the Npys path rewrite."""
        folder, start = self._get_video_start_idx(idx)
        npy_file = (
            folder.replace("TrainMP4s/", f"TrainNpys-{self.dvae_path}/").replace(
                "TestMP4s/", f"TestNpys-{self.dvae_path}/"
            )
            + ".npy"
        )
        if not osp.exists(npy_file):
            return None
        tokens = np.load(npy_file)  # [T, h*w]
        return np.stack(
            [tokens[start + n * self.frame_offset] for n in range(self.n_sample_frames)]
        ).astype(np.int32)

    def get_video(self, video_idx):
        folder = self.files[video_idx]
        assert osp.exists(folder), "Please extract frames from videos first."
        num_frames = self.video_len // self.frame_offset
        frames = [
            read_img(osp.join(folder, f"{n * self.frame_offset:06d}.jpg"))
            for n in range(num_frames)
        ]
        if any(f is None for f in frames):
            return self._rand_another(is_video=True)
        return {
            "video": np.stack(
                [self.physion_transform(f) for f in frames], axis=0
            ).astype(np.float32),
            "data_idx": video_idx,
        }

    def __getitem__(self, idx):
        if self.load_video:
            return self.get_video(idx)
        try:
            frames = self._read_frames(idx)
            tokens = self._read_tokens(idx)
        except ValueError:
            return self._rand_another()
        out = {"data_idx": idx, "img": frames}
        if tokens is not None:
            out["token_id"] = tokens
        return out

    def __len__(self):
        if self.load_video:
            return len(self.files)
        return len(self.valid_idx)


class PhysionSlotsDataset(PhysionDataset):

    def __init__(self, data_root, video_slots, split, tasks, physion_transform,
                 n_sample_frames=25, frame_offset=None, video_len=150,
                 subset="training", load_img=False):
        super().__init__(
            data_root=data_root, split=split, tasks=tasks,
            physion_transform=physion_transform,
            n_sample_frames=n_sample_frames, frame_offset=frame_offset,
            video_len=video_len, subset=subset,
        )
        self.video_slots = video_slots
        self.load_img = load_img

    def _read_slots(self, idx):
        folder, start = self._get_video_start_idx(idx)
        slots = self.video_slots[os.path.basename(folder)]
        return np.stack(
            [slots[start + n * self.frame_offset] for n in range(self.n_sample_frames)]
        ).astype(np.float32)

    def __getitem__(self, idx):
        try:
            out = {"slots": self._read_slots(idx)}
            if self.load_img:
                out["img"] = self._read_frames(idx)
                tokens = self._read_tokens(idx)
                if tokens is not None:
                    out["token_id"] = tokens
        except (ValueError, KeyError):
            return self._rand_another()
        out["data_idx"] = idx
        return out


class PhysionSlotsLabelDataset(PhysionSlotsDataset):
    """(whole-video slots, VQA label) pairs for readout training/eval."""

    def __init__(self, data_root, video_slots, split, tasks, physion_transform,
                 n_sample_frames=15, frame_offset=None, video_len=150,
                 subset="training", load_img=False):
        if subset == "readout":
            label_fn = "PhysionTrainMP4s/readout_labels.csv"
        elif subset == "test":
            label_fn = "PhysionTestMP4s/labels.csv"
        else:
            raise NotImplementedError
        self.labels = _read_label_csv(os.path.join(data_root, label_fn))

        super().__init__(
            data_root=data_root, video_slots=video_slots, split=split,
            tasks=tasks, physion_transform=physion_transform,
            n_sample_frames=n_sample_frames, frame_offset=frame_offset,
            video_len=video_len, subset=subset, load_img=load_img,
        )
        assert self.frame_offset == 1
        self.sample_idx = list(range(video_len))

        if subset != "readout":
            bad = read_all_lines(osp.join(_SPLIT_DIR, "bad_stimuli.txt"))
            keep, keep_tasks = [], {}
            for i, f in enumerate(self.files):
                check = f.replace("-redyellow", "")
                if not any(s in check for s in bad):
                    # re-key the task map to the POST-filter index (the
                    # reference keeps the stale pre-filter map, silently
                    # mislabeling per-task accuracy — physion.py:298-310)
                    keep_tasks[len(keep)] = self.video_idx2task_idx[i]
                    keep.append(f)
            removed = len(self.files) - len(keep)
            self.files = keep
            self.video_idx2task_idx = keep_tasks
            print(f"remove {removed} files, now have {len(self.files)}")

    def _read_frames(self, file_idx):
        folder = self.files[file_idx]
        frames = [
            read_img(osp.join(folder, f"{i:06d}.jpg")) for i in self.sample_idx
        ]
        if any(f is None for f in frames):
            raise ValueError
        return np.stack(
            [self.physion_transform(f) for f in frames], axis=0
        ).astype(np.float32)

    def _read_slots(self, file_idx):
        folder = self.files[file_idx]
        slots = self.video_slots[os.path.basename(folder)]
        return np.stack([slots[i] for i in self.sample_idx]).astype(np.float32)

    def _read_label(self, file_idx):
        key = os.path.basename(self.files[file_idx])
        if key.endswith(".mp4"):
            key = key[:-4]
        if self.subset == "readout" and key.endswith("_img"):
            key = key[:-4]
        if self.subset == "test" and "-redyellow" in key:
            key = key.replace("-redyellow", "")
        return 1 if self.labels[key] else 0

    def __getitem__(self, idx):
        try:
            out = {"slots": self._read_slots(idx), "label": self._read_label(idx)}
            if self.load_img:
                out["img"] = self._read_frames(idx)
        except (ValueError, KeyError):
            return self._rand_another()
        out["data_idx"] = idx
        out["task_idx"] = self.video_idx2task_idx[idx]
        return out

    def __len__(self):
        return len(self.files)


def _read_label_csv(path: str) -> dict:
    """CSV with columns (name, 'ground truth outcome') -> {name: bool}."""
    import csv

    out = {}
    with open(path, "r") as f:
        reader = csv.DictReader(f)
        name_col = reader.fieldnames[0]
        for row in reader:
            v = row["ground truth outcome"]
            out[row[name_col]] = str(v).strip().lower() in ("true", "1", "yes")
    return out


def _dvae_path_from(params) -> str:
    if params.has("dvae_dict"):
        p = params.dvae_dict["dvae_ckp_path"].split("/")
        dvae = p[1] if len(p) > 1 else "dvae-none"
    else:
        dvae = "dvae-none"
    assert "dvae" in dvae
    return dvae


def build_physion_dataset(params, val_only=False):
    subset = params.dataset.split("_")[-1]
    tf = BaseTransforms(params.resolution)
    args = dict(
        data_root=params.data_root, split="val", tasks=params.tasks,
        physion_transform=tf, n_sample_frames=params.n_sample_frames,
        frame_offset=params.frame_offset, video_len=params.video_len,
        subset=subset,
    )
    if subset == "test":
        args["split"] = "test"
        val_only = True
    val_dataset = PhysionDataset(**args)
    val_dataset.dvae_path = _dvae_path_from(params)
    if val_only:
        return val_dataset
    args["split"] = "train"
    train_dataset = PhysionDataset(**args)
    train_dataset.dvae_path = val_dataset.dvae_path
    return train_dataset, val_dataset


def build_physion_slots_dataset(params, val_only=False):
    subset = params.dataset.split("_")[-1]
    tf = BaseTransforms(params.resolution)
    slots = load_obj(params.slots_root)
    args = dict(
        data_root=params.data_root, video_slots=None, split="val",
        tasks=params.tasks, physion_transform=tf,
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.frame_offset, video_len=params.video_len,
        subset=subset, load_img=params.loss_dict["use_img_recon_loss"],
    )
    if subset == "test":
        args["split"] = "test"
        args["video_slots"] = slots["test"]
        val_only = True
    else:
        args["video_slots"] = slots["val"]
    val_dataset = PhysionSlotsDataset(**args)
    val_dataset.dvae_path = _dvae_path_from(params)
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["video_slots"] = slots["train"]
    train_dataset = PhysionSlotsDataset(**args)
    train_dataset.dvae_path = val_dataset.dvae_path
    return train_dataset, val_dataset


def build_physion_slots_label_dataset(params, val_only=False):
    subset = params.dataset.split("_")[-1]
    tf = BaseTransforms(params.resolution)
    slots = load_obj(params.slots_root)
    args = dict(
        data_root=params.data_root, video_slots=None, split="val",
        tasks=params.tasks, physion_transform=tf,
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.frame_offset, video_len=params.video_len,
        subset=subset,
    )
    if subset == "test":
        args["split"] = "test"
        args["video_slots"] = slots["test"]
        val_only = True
    else:
        args["video_slots"] = slots["val"]
    val_dataset = PhysionSlotsLabelDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["video_slots"] = slots["train"]
    return PhysionSlotsLabelDataset(**args), val_dataset


# register with the dispatcher
from . import register_dataset  # noqa: E402

register_dataset("physion", build_physion_dataset)
register_dataset("physion_slots", build_physion_slots_dataset)
register_dataset("physion_slots_label", build_physion_slots_label_dataset)
