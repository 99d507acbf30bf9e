"""PHYRE slot extraction: frozen SAVi over simulated action videos.

Reference behavior (/root/reference/slotformer/base_slots/extract_phyre_slots.py):
one ``.npy`` per (task, action) trial, trimmed to the real video length;
resumable (skips already-written files) and shardable across jobs via
``--split/--total_split``; output dir keyed by protocol/fold/split/ratios,
symlinked next to the weight.

Usage:
    python -m slotformer_tpu.cli.extract_phyre_slots --params <cfg.py> \
        --weight <ckpt.pkl> --save_path ./data/PHYRE [--split K --total_split N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def extract_phyre_video_slots(model, params_tree, params, dataset, args) -> None:
    import jax

    from ..runtime.io import atomic_write_npy, symlink_force

    save_root = os.path.join(
        args.save_path,
        "slots",
        os.path.splitext(os.path.basename(args.params))[0],
        f"{dataset.protocal}-fold_{dataset.fold}-{dataset.split}-"
        f"data_{dataset.ratio}-pos_{dataset.pos_ratio}",
    )
    os.makedirs(save_root, exist_ok=True)
    if args.split in (-1, 0):
        symlink_force(save_root, os.path.join(
            os.path.dirname(os.path.abspath(args.weight)),
            f"{dataset.split}_slots",
        ))

    dataset.vid_len = args.vid_len * dataset.fps
    total = dataset.video_info.shape[0]
    if args.split == -1:
        start_idx, end_idx = 0, total
    else:
        per = total // args.total_split
        start_idx = per * args.split
        end_idx = per * (args.split + 1) if args.split < args.total_split - 1 else total
        # resume: skip already-written files (last one may be corrupted)
        idx = start_idx
        while idx < end_idx and os.path.exists(
            os.path.join(save_root, f"{idx:06d}.npy")
        ):
            idx += 1
        start_idx = max(idx - 1, start_idx)

    def encode(p, imgs, rng):
        _, slots, _, _, _ = model.apply(
            {"params": p}, imgs, method="encode", rngs={"sample": rng}
        )
        return slots

    from ..parallel import get_mesh, pad_rows, replicate, shard_or_replicate

    mesh = get_mesh()
    params_tree = replicate(mesh, params_tree)
    _encode = jax.jit(encode)

    def encode_fn(p, imgs, rng):
        return _encode(p, shard_or_replicate(mesh, imgs), rng)

    rng = jax.random.PRNGKey(0)
    bs = args.bs
    for i0 in range(start_idx, end_idx, bs):
        idxs = list(range(i0, min(i0 + bs, end_idx)))
        batch = [dataset.get_video(i) for i in idxs]
        vids = np.stack([b["video"] for b in batch]).astype(np.float32)
        vids = pad_rows(vids, bs)
        rng, sub = jax.random.split(rng)
        slots = np.asarray(encode_fn(params_tree, vids, sub))
        for k, i in enumerate(idxs):
            vid_len = batch[k]["vid_len"]
            atomic_write_npy(
                slots[k, :vid_len].astype(np.float32),
                os.path.join(save_root, f"{i:06d}.npy"),
            )
        print(f"  {min(i0 + bs, end_idx)}/{end_idx}", flush=True)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="extract PHYRE slots")
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--vid_len", type=int, default=11)
    parser.add_argument("--split", type=int, default=-1)
    parser.add_argument("--total_split", type=int, default=10)
    parser.add_argument("--bs", type=int, default=32)
    args = parser.parse_args(argv)

    from ..datasets import build_dataset
    from ..models import build_model
    from ..runtime import load_params, load_state_dict

    params = load_params(args.params)
    model = build_model(params)
    params_tree = load_state_dict(args.weight)

    train_set, val_set = build_dataset(params)
    for name, ds in (("val", val_set), ("train", train_set)):
        print(f"[extract_phyre] split={name} actions={len(ds.video_info)}",
              flush=True)
        extract_phyre_video_slots(model, params_tree, params, ds, args)


if __name__ == "__main__":
    main()
