"""Dump dVAE tokens for all Physion videos to a mirrored .npy tree.

Reference behavior (/root/reference/slotformer/base_slots/tokenize_images.py):
for every video frame-folder, tokenize all frames with the frozen dVAE and
save ``[T, h*w]`` int tokens to a path with ``TrainMP4s -> TrainNpys-$dvae``
(/ ``TestMP4s -> TestNpys-$dvae``) rewritten, where ``$dvae`` is the dVAE
run name — the exact contract the Physion dataset reads back
(datasets/physion.py token loading). Skips already-written files.

Usage:
    python -m slotformer_tpu.cli.tokenize_images --params <dvae_cfg.py> \
        --weight <dvae_ckpt.pkl>
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="dump dVAE tokens")
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    args = parser.parse_args(argv)

    import jax

    from ..datasets import build_dataset
    from ..models import build_model
    from ..runtime import load_params, load_state_dict
    from ..runtime.io import atomic_write_npy

    params = load_params(args.params)
    model = build_model(params)
    params_tree = load_state_dict(args.weight)
    dvae_name = os.path.splitext(os.path.basename(args.params))[0]

    @jax.jit
    def tokenize(p, imgs):
        ids = model.apply({"params": p}, imgs, False, method="tokenize")
        return ids.reshape(ids.shape[0], -1)  # [B, h*w]

    train_set, val_set = build_dataset(params)
    for name, ds in (("val", val_set), ("train", train_set)):
        ds.load_video = True
        n = len(ds.files)
        print(f"[tokenize] split={name} videos={n}", flush=True)
        for vi in range(n):
            folder = ds.files[vi]
            out_path = (
                folder.replace("TrainMP4s/", f"TrainNpys-{dvae_name}/").replace(
                    "TestMP4s/", f"TestNpys-{dvae_name}/"
                )
                + ".npy"
            )
            if os.path.exists(out_path):
                continue  # idempotent restart
            video = ds.get_video(vi)["video"]  # [T, H, W, 3]
            toks = []
            for b0 in range(0, video.shape[0], args.batch_size):
                chunk = video[b0 : b0 + args.batch_size]
                pad = 0
                if chunk.shape[0] < args.batch_size:
                    pad = args.batch_size - chunk.shape[0]
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, axis=0)]
                    )
                t = np.asarray(tokenize(params_tree, chunk))
                toks.append(t[: t.shape[0] - pad] if pad else t)
            atomic_write_npy(
                np.concatenate(toks).astype(np.int32), out_path
            )
            if (vi + 1) % 20 == 0:
                print(f"  {vi + 1}/{n}", flush=True)
        ds.load_video = False


if __name__ == "__main__":
    main()
