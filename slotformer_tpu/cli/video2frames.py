"""Extract video frames to jpg directories (data preprocessing).

Reference behavior (/root/reference/scripts/data_preproc/*_video2frames.py):
convert every mp4 under a root into a sibling directory of
``{:06d}.jpg`` frames (128x128 for Physion), threaded.

Usage:
    python -m slotformer_tpu.cli.video2frames --data_root ./data/CLEVRER/videos
    python -m slotformer_tpu.cli.video2frames --data_root ./data/Physion \
        --resize 128
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor


def convert_one(video_path: str, resize: int = -1) -> int:
    from ..runtime.io import VideoReader, strip_suffix

    frame_dir = strip_suffix(video_path)
    if os.path.isdir(frame_dir) and os.listdir(frame_dir):
        return 0  # already converted (idempotent restart)
    with VideoReader(video_path) as cap:
        shape = (resize, resize) if resize > 0 else None
        return cap.cvt2frames(frame_dir, target_shape=shape)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="videos -> frame dirs")
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--resize", type=int, default=-1)
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args(argv)

    videos = []
    for root, _, files in os.walk(args.data_root):
        videos += [os.path.join(root, f) for f in files if f.endswith(".mp4")]
    print(f"[video2frames] {len(videos)} videos under {args.data_root}")
    done = 0
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for n in pool.map(lambda v: convert_one(v, args.resize), videos):
            done += 1
            if done % 100 == 0:
                print(f"  {done}/{len(videos)}", flush=True)
    print("[video2frames] done")


if __name__ == "__main__":
    main()
