"""Host-side IO utilities.

Replaces the ``nerv.utils`` IO surface used by the reference
(load_obj/dump_obj/mkdir_or_exist/glob_all/strip_suffix/read_img/
VideoReader/save_video — usage cited in SURVEY.md §2.1 R6).

The on-disk slot-artifact contract is kept bit-identical to the reference:
pickle dicts ``{split: {video_fn: float32 [T, N, C]}}`` for whole-dataset
slots, and per-action ``.npy`` files for PHYRE
(/root/reference/slotformer/base_slots/extract_slots.py:58-76).
"""

from __future__ import annotations

import glob
import json
import os
import pickle
from typing import Any, Iterable, List, Optional

import numpy as np


# ---------------------------------------------------------------------------
# object (de)serialization
# ---------------------------------------------------------------------------

def load_obj(path: str) -> Any:
    """Load a pickle / json / npy object, dispatching on file suffix."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pkl", ".pickle", ".pth"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if ext == ".json":
        with open(path, "r") as f:
            return json.load(f)
    if ext == ".npy":
        return np.load(path, allow_pickle=True)
    # default: pickle
    with open(path, "rb") as f:
        return pickle.load(f)


def dump_obj(obj: Any, path: str) -> None:
    """Save an object as pickle / json / npy, dispatching on file suffix."""
    mkdir_or_exist(os.path.dirname(path))
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path, "w") as f:
            json.dump(obj, f)
        return
    if ext == ".npy":
        np.save(path, obj)
        return
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def atomic_write_npy(arr: np.ndarray, path: str) -> None:
    """Idempotent-restart friendly .npy writer (tmp file + rename).

    Offline extraction jobs skip already-written files
    (reference behavior: extract_phyre_slots.py:45-53); atomic rename makes
    a killed job never leave a truncated artifact behind.
    """
    mkdir_or_exist(os.path.dirname(path))
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# filesystem helpers
# ---------------------------------------------------------------------------

def mkdir_or_exist(dirname: str) -> None:
    if dirname:
        os.makedirs(dirname, exist_ok=True)


def glob_all(pattern_or_dir: str, only_dir: bool = False) -> List[str]:
    """Sorted glob; pass a directory to list its entries."""
    if os.path.isdir(pattern_or_dir):
        pattern_or_dir = os.path.join(pattern_or_dir, "*")
    results = sorted(glob.glob(pattern_or_dir))
    if only_dir:
        results = [r for r in results if os.path.isdir(r)]
    return results


def strip_suffix(path: str) -> str:
    """Remove the file extension from a path."""
    return os.path.splitext(path)[0]


def symlink_force(target: str, link: str) -> None:
    """Point ``link`` at ``target``, replacing whatever is there.

    No-op when link == target (would clobber the artifact with a
    self-symlink); swallows OS errors — artifact symlinks are a convenience,
    never load-bearing.
    """
    target = os.path.abspath(target)
    link = os.path.abspath(link)
    if link == target:
        return
    try:
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(target, link)
    except OSError:
        pass


def read_all_lines(path: str) -> List[str]:
    with open(path, "r") as f:
        return [ln.rstrip("\n") for ln in f]


# ---------------------------------------------------------------------------
# image / video IO (host-side; feeds the device pipeline)
# ---------------------------------------------------------------------------

def read_img(path: str, to_float: bool = False) -> np.ndarray:
    """Read an image as RGB uint8 [H, W, 3] (float32 [0,1] if to_float)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"))
    if to_float:
        arr = arr.astype(np.float32) / 255.0
    return arr


def save_img(arr: np.ndarray, path: str) -> None:
    from PIL import Image

    mkdir_or_exist(os.path.dirname(path))
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class VideoReader:
    """Sequential/random-access video frame reader (cv2-backed).

    Mirrors the reference's ``nerv.utils.VideoReader`` API surface used by
    datasets: ``get_frame(idx)``, ``read_video()``, ``cvt2frames(dir)``,
    ``len()`` (usage: /root/reference/slotformer/base_slots/datasets/clevrer.py:76-99).
    """

    def __init__(self, path: str, to_rgb: bool = True):
        import cv2

        self._cv2 = cv2
        self.path = path
        self.to_rgb = to_rgb
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        self.num_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    def __len__(self) -> int:
        return self.num_frames

    def _cvt(self, frame: np.ndarray) -> np.ndarray:
        if self.to_rgb:
            frame = self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2RGB)
        return frame

    def get_frame(self, idx: int) -> Optional[np.ndarray]:
        self.cap.set(self._cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = self.cap.read()
        if not ok:
            return None
        return self._cvt(frame)

    def read_video(self) -> List[np.ndarray]:
        self.cap.set(self._cv2.CAP_PROP_POS_FRAMES, 0)
        frames = []
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            frames.append(self._cvt(frame))
        return frames

    def cvt2frames(
        self,
        frame_dir: str,
        target_shape: Optional[tuple] = None,
        filename_tmpl: str = "{:06d}.jpg",
    ) -> int:
        """Dump all frames to a directory of images; returns #frames."""
        mkdir_or_exist(frame_dir)
        frames = self.read_video()
        for i, fr in enumerate(frames):
            if target_shape is not None:
                fr = self._cv2.resize(
                    fr, target_shape, interpolation=self._cv2.INTER_AREA
                )
            save_img(fr, os.path.join(frame_dir, filename_tmpl.format(i)))
        return len(frames)

    def close(self) -> None:
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def save_video(frames: Iterable[np.ndarray], path: str, fps: int = 8) -> None:
    """Save an iterable of RGB uint8 [H, W, 3] frames to an mp4."""
    import cv2

    frames = list(frames)
    if not frames:
        return
    mkdir_or_exist(os.path.dirname(path))
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for fr in frames:
        if fr.dtype != np.uint8:
            fr = np.clip(fr * 255.0, 0, 255).astype(np.uint8)
        writer.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
    writer.release()
