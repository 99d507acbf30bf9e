"""PHYRE simulator-backed datasets.

Behavioral spec: /root/reference/slotformer/base_slots/datasets/phyre.py —
each item simulates an action video ON THE FLY via the ``phyre`` C++
simulator (host-side pip dependency; data generation, not model compute —
SURVEY.md §2 note (c)), WAD color palette -> RGB with optional black
background reversal, static-tail trimming, pad/crop to fixed length,
balanced action sampling cached to ``.npy`` split fixtures in-repo
(splits/PHYRE/), slots variant reading per-action ``.npy`` files, and
``start_idx/end_idx`` sub-ranges for sharded extraction.

The ``phyre`` package is optional: split fixtures load without it; anything
needing simulation raises a clear ImportError.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np

from ..runtime.datamodule import Dataset
from .utils import BaseTransforms

_SPLIT_DIR = osp.join(osp.dirname(osp.realpath(__file__)), "splits", "PHYRE")


def _require_phyre():
    try:
        import phyre  # noqa: F401

        return phyre
    except ImportError as e:  # pragma: no cover - env without phyre
        raise ImportError(
            "the `phyre` pip package is required for PHYRE simulation "
            "(pip install phyre==0.2.2 on a compatible host)"
        ) from e


def _hex_to_ints(hex_string):
    h = hex_string.strip("#")
    return int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)


WAD_COLORS = np.array(
    [
        [255, 255, 255],  # White
        _hex_to_ints("f34f46"),  # Red
        _hex_to_ints("6bcebb"),  # Green
        _hex_to_ints("1877f2"),  # Blue
        _hex_to_ints("4b4aa4"),  # Purple
        _hex_to_ints("b9cad2"),  # Gray
        [0, 0, 0],  # Black
        _hex_to_ints("fcdfe3"),  # Light red
    ],
    dtype=np.uint8,
)

WAD_REVERSE_COLORS = WAD_COLORS.copy()
WAD_REVERSE_COLORS[0] = [0, 0, 0]
WAD_REVERSE_COLORS[6] = [255, 255, 255]


def observations_to_uint8_rgb(scene: np.ndarray, reverse: bool = False):
    """Palette-map a simulator observation and flip vertically."""
    base = (WAD_REVERSE_COLORS if reverse else WAD_COLORS)[scene]
    return base[::-1]


def get_last_moving_idx(images) -> int:
    """Index of the last frame where objects still move (phyre.py:60-68)."""
    idx = int(
        np.argmax(
            [(images[i] == images[i + 1]).all() for i in range(len(images) - 1)]
        )
    )
    if idx == 0:
        return len(images) - 1
    return idx


def fix_video_len(video: np.ndarray, n: int) -> np.ndarray:
    """Duplicate the last frame or crop to exactly n frames."""
    if len(video) < n:
        video = np.concatenate([video] + [video[-1:]] * (n - len(video)))
    elif len(video) > n:
        video = video[:n]
    return video


class PHYREDataset(Dataset):

    def __init__(
        self,
        data_root: str,
        split: str,
        phyre_transform: BaseTransforms,
        seq_size: int = 6,
        frame_offset: int = 1,
        fps: int = 1,
        protocal: str = "within",
        fold: int = 0,
        vid_len: int = 15,
        ratio: float = 1.0,
        pos_ratio: float = 0.2,
        reverse_color: bool = False,
    ):
        assert frame_offset == 1, "should modify fps instead"
        self.data_root = data_root
        self.split = split
        self.phyre_transform = phyre_transform
        self.resolution = phyre_transform.resolution
        self.seq_size = seq_size
        self.fps = fps
        self.frame_offset = frame_offset
        self.protocal = protocal
        self.fold = fold
        self.vid_len = vid_len
        self.ratio = ratio
        self.pos_ratio = pos_ratio
        self.reverse_color = reverse_color

        self._filter_actions()
        self.files = self.video_info  # API compat
        self.load_video = False
        self.start_idx = None
        self.end_idx = None

    # --------------------------------------------------------------- actions
    def _filter_actions(self):
        """Load the balanced action split (cached fixture) and lazily build
        the simulator (phyre.py:225-307)."""
        info_path = osp.join(
            _SPLIT_DIR,
            f"{self.protocal}-fold_{self.fold}-{self.split}-"
            f"data_{self.ratio}-pos_{self.pos_ratio}.npy",
        )
        label_path = info_path.replace(".npy", "-label.npy")
        if osp.exists(info_path) and osp.exists(label_path):
            self.video_info = np.load(info_path)
            self.act_labels = np.load(label_path)
            self._simulator = None  # built lazily on first simulation
            return
        # regenerate from the phyre 100k cache (needs the phyre package)
        phyre = _require_phyre()
        eval_setup = f"ball_{self.protocal}_template"
        train_tasks, dev_tasks, test_tasks = phyre.get_fold(eval_setup, self.fold)
        tasks = train_tasks + dev_tasks if self.split == "train" else test_tasks
        tasks = [t for t in tasks if t.split(":")[0] in
                 [f"{i:05d}" for i in range(25)]]
        cache = phyre.get_default_100k_cache("ball")
        data = cache.get_sample(tasks, None)
        actions = data["actions"]
        sim_statuses = data["simulation_statuses"]
        base = 2000 if self.split == "train" else 500
        num_pos = int(self.ratio * base * self.pos_ratio)
        num_neg = int(self.ratio * base * (1 - self.pos_ratio))
        np.random.seed(self.fold)
        info, labels = [], []
        for t_id in range(len(tasks)):
            st = sim_statuses[t_id]
            pos = actions[st == 1].copy()
            neg = actions[st == -1].copy()
            np.random.shuffle(pos)
            np.random.shuffle(neg)
            pos, neg = pos[:num_pos], neg[:num_neg]
            acts = np.concatenate([pos, neg])
            vi = np.zeros((len(acts), 4))
            vi[:, 0] = t_id
            vi[:, 1:] = acts
            info.append(vi)
            labels.append(
                np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
            )
        self.video_info = np.concatenate(info)
        self.act_labels = np.concatenate(labels).astype(np.int32)
        os.makedirs(osp.dirname(info_path), exist_ok=True)
        np.save(info_path, self.video_info)
        np.save(label_path, self.act_labels)
        self._simulator = None

    @property
    def simulator(self):
        if self._simulator is None:
            phyre = _require_phyre()
            eval_setup = f"ball_{self.protocal}_template"
            train_tasks, dev_tasks, test_tasks = phyre.get_fold(
                eval_setup, self.fold
            )
            tasks = (
                train_tasks + dev_tasks if self.split == "train" else test_tasks
            )
            tasks = [t for t in tasks if t.split(":")[0] in
                     [f"{i:05d}" for i in range(25)]]
            self._simulator = phyre.initialize_simulator(
                tasks, phyre.eval_setup_to_action_tier(eval_setup)
            )
        return self._simulator

    # ----------------------------------------------------------------- reads
    def _preproc_img(self, img):
        return np.ascontiguousarray(
            observations_to_uint8_rgb(img, reverse=self.reverse_color)
        )

    def _simulate(self, idx):
        task_id, acts = self.video_info[idx, 0], self.video_info[idx, 1:]
        return self.simulator.simulate_action(
            int(task_id),
            acts,
            stride=60 // self.fps,
            need_images=True,
            need_featurized_objects=False,
        )

    def get_video(self, idx, video_len: Optional[int] = None):
        video_len = self.vid_len if video_len is None else video_len
        sim = self._simulate(idx)
        images = sim.images[:: self.frame_offset]
        vid_len = min(len(images), video_len)
        images = fix_video_len(np.asarray(images), video_len)
        frames = [self.phyre_transform(self._preproc_img(im)) for im in images]
        label = int(sim.status == 1)
        assert label == self.act_labels[idx], (
            "simulated label does not match pre-generated label"
        )
        return {
            "video": np.stack(frames, axis=0).astype(np.float32),
            "data_idx": idx,
            "label": label,
            "vid_len": vid_len,
        }

    def _read_frames(self, idx, video_len: Optional[int] = None):
        pad_img = video_len is not None
        video_len = self.seq_size if video_len is None else video_len
        sim = self._simulate(idx)
        images = np.asarray(sim.images[:: self.frame_offset])
        vid_len = min(len(images), video_len)
        last = get_last_moving_idx(images)
        images = images[: last + 1]
        if len(images) < video_len:
            if not pad_img:
                raise ValueError
            images = fix_video_len(images, video_len)
        images = images[:video_len]
        frames = [self.phyre_transform(self._preproc_img(im)) for im in images]
        label = int(sim.status == 1)
        assert label == self.act_labels[idx], (
            "simulated label does not match pre-generated label"
        )
        return {
            "img": np.stack(frames, axis=0).astype(np.float32),
            "label": label,
            "vid_len": vid_len,
        }

    def _rand_another(self, idx, is_video: bool = False):
        if is_video:
            return self.get_video((idx + 10) % len(self))
        return self[int(np.random.choice(len(self)))]

    def __getitem__(self, idx):
        if self.load_video:
            if self.start_idx is not None:
                idx = self.start_idx + idx
            return self.get_video(idx)
        try:
            out = self._read_frames(idx)
        except ValueError:
            return self._rand_another(idx)
        out["data_idx"] = idx
        return out

    def __len__(self):
        if self.load_video and self.start_idx is not None:
            return self.end_idx - self.start_idx
        return self.video_info.shape[0]


class PHYRESlotsDataset(PHYREDataset):
    """PHYRE actions joined with per-action slot ``.npy`` files
    (phyre.py:310-388)."""

    def __init__(self, data_root, slot_root, split, phyre_transform,
                 seq_size=6, frame_offset=1, fps=1, protocal="within", fold=0,
                 vid_len=15, ratio=1.0, pos_ratio=0.2, reverse_color=False,
                 load_img=False):
        super().__init__(
            data_root=data_root, split=split, phyre_transform=phyre_transform,
            seq_size=seq_size, frame_offset=frame_offset, fps=fps,
            protocal=protocal, fold=fold, vid_len=vid_len, ratio=ratio,
            pos_ratio=pos_ratio, reverse_color=reverse_color,
        )
        self.slot_root = slot_root
        self.load_img = load_img

    def _read_slots(self, idx, video_len: Optional[int] = None):
        video_len = self.seq_size if video_len is None else video_len
        slots = np.load(osp.join(self.slot_root, f"{idx:06d}.npy"))
        slots = np.ascontiguousarray(
            slots.astype(np.float32)[:: self.frame_offset]
        )
        vid_len = min(len(slots), video_len)
        slots = fix_video_len(slots, video_len)
        return {
            "slots": slots,
            "vid_len": vid_len,
            "label": int(self.act_labels[idx]),
        }

    def __getitem__(self, idx):
        try:
            out = self._read_slots(idx)
            if self.load_img:
                img_dict = self._read_frames(idx, video_len=self.seq_size)
                assert len(out["slots"]) == len(img_dict["img"])
                out["img"] = img_dict["img"]
                out["vid_len"] = min(out["vid_len"], img_dict["vid_len"])
        except (ValueError, FileNotFoundError):
            return self._rand_another(idx)
        out["data_idx"] = idx
        return out


def build_phyre_dataset(params, val_only=False):
    args = dict(
        data_root=params.data_root,
        split="val",
        phyre_transform=BaseTransforms(params.resolution),
        seq_size=params.n_sample_frames,
        frame_offset=params.frame_offset,
        fps=params.fps,
        protocal=params.phyre_protocal,
        fold=params.phyre_fold,
        vid_len=params.video_len,
        ratio=params.data_ratio,
        pos_ratio=params.pos_ratio,
        reverse_color=params.reverse_color,
    )
    val_dataset = PHYREDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    return PHYREDataset(**args), val_dataset


def build_phyre_slots_dataset(params, val_only=False):
    args = dict(
        data_root=params.data_root,
        slot_root=params.slots_root.format("val"),
        split="val",
        phyre_transform=BaseTransforms(params.resolution),
        seq_size=params.n_sample_frames,
        frame_offset=params.frame_offset,
        fps=params.fps,
        protocal=params.phyre_protocal,
        fold=params.phyre_fold,
        vid_len=params.video_len,
        ratio=params.data_ratio,
        pos_ratio=params.pos_ratio,
        reverse_color=params.reverse_color,
        load_img=params.loss_dict["use_img_recon_loss"],
    )
    val_dataset = PHYRESlotsDataset(**args)
    val_dataset.load_img = True  # eval img_recon loss
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["slot_root"] = params.slots_root.format("train")
    return PHYRESlotsDataset(**args), val_dataset


def build_phyre_rollout_slots_dataset(params, val_only=False):
    args = dict(
        data_root=params.data_root,
        slot_root=params.slot_root.format("val"),
        split="val",
        phyre_transform=BaseTransforms(params.resolution),
        seq_size=params.n_sample_frames,
        frame_offset=params.frame_offset,
        fps=params.fps,
        protocal=params.phyre_protocal,
        fold=params.phyre_fold,
        vid_len=params.video_len,
        ratio=params.data_ratio,
        pos_ratio=params.pos_ratio,
        reverse_color=params.reverse_color,
        load_img=False,
    )
    val_dataset = PHYRESlotsDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["slot_root"] = params.slot_root.format("train")
    return PHYRESlotsDataset(**args), val_dataset


from . import register_dataset  # noqa: E402

register_dataset("phyre", build_phyre_dataset)
register_dataset("phyre_slots", build_phyre_slots_dataset)
register_dataset("phyre_rollout_slots", build_phyre_rollout_slots_dataset)
