"""Offline slot extraction: frozen SAVi encoder over whole datasets.

Reference behavior (/root/reference/slotformer/base_slots/extract_slots.py):
iterate every video of train/val(/test), encode to slots, dump ONE pickle
``{split: {video_basename: float32 [T, N, C]}}`` and symlink it next to the
weight file. That artifact is the contract between stage 1 and everything
downstream (SURVEY.md §3.3).

TPU-native rewrite:
  * videos are batched (``--batch_size``) and encoded in chunks of a STATIC
    ``--chunk_len`` frames with slot + predictor-state carry-over — replacing
    the reference's exception-driven OOM-adaptive chunking (savi.py:421-463),
    which cannot exist under XLA. Two jit variants compile (first chunk /
    continuation); every batch reuses them.
  * host video decode overlaps device compute via the threaded DataLoader.

Usage:
    python -m slotformer_tpu.cli.extract_slots --params <cfg.py> \
        --weight <ckpt.pkl> [--save_path slots.pkl] [--chunk_len 24]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


def extract_video_slots(model, params_tree, dataset, batch_size: int,
                        chunk_len: int, seed: int = 0) -> Dict[str, np.ndarray]:
    """Encode every video of ``dataset`` (a *_Dataset with get_video/files).

    Returns {video_basename: [T, N, C] float32}.
    """
    import jax

    dataset.load_video = True

    first_fn = None
    cont_fn = None

    # StoSAVi.encode -> a 5-tuple (kernel_dist, post_slots, masks,
    # encoder_out, carry); STEVE.encode -> a 4-tuple (slots, masks, feats,
    # carry). Dispatch on arity (same role as the reference's slot_key,
    # extract_slots.py:22) so SAVi-family subclasses keep working.
    def _unpack(out):
        assert len(out) in (4, 5), f"unexpected encode arity {len(out)}"
        return (out[1] if len(out) == 5 else out[0]), out[-1]

    def encode_first(p, imgs, rng):
        return _unpack(model.apply(
            {"params": p}, imgs, method="encode", rngs={"sample": rng}
        ))

    def encode_cont(p, imgs, prev_slots, pred_state, rng):
        return _unpack(model.apply(
            {"params": p}, imgs, prev_slots, pred_state,
            method="encode", rngs={"sample": rng},
        ))

    first_fn = jax.jit(encode_first)
    cont_fn = jax.jit(encode_cont)

    from ..parallel import get_mesh, pad_rows, replicate, shard_or_replicate

    mesh = get_mesh()
    params_tree = replicate(mesh, params_tree)

    out: Dict[str, np.ndarray] = {}
    n_videos = len(dataset.files)
    names = [os.path.basename(f) for f in dataset.files]
    rng = jax.random.PRNGKey(seed)

    i = 0
    while i < n_videos:
        idxs = list(range(i, min(i + batch_size, n_videos)))
        vids = [dataset.get_video(j)["video"] for j in idxs]
        # bucket by length: all reference datasets have uniform T per split;
        # guard anyway by trimming to the batch min
        T = min(v.shape[0] for v in vids)
        batch = np.stack([v[:T] for v in vids]).astype(np.float32)
        # pad batch dim to batch_size for stable jit shapes
        batch = pad_rows(batch, batch_size)

        all_slots = []
        carry = None
        for c0 in range(0, T, chunk_len):
            chunk = batch[:, c0 : c0 + chunk_len]
            if chunk.shape[1] < chunk_len and c0 > 0:
                # pad the tail chunk to the static length; extra frames trimmed
                pad = chunk_len - chunk.shape[1]
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:, -1:], pad, axis=1)], axis=1
                )
            else:
                pad = 0
            rng, sub = jax.random.split(rng)
            chunk = shard_or_replicate(mesh, chunk)
            if carry is None:
                slots, carry = first_fn(params_tree, chunk, sub)
            else:
                slots, carry = cont_fn(params_tree, chunk, carry[0], carry[1], sub)
            slots = np.asarray(slots)
            if pad:
                slots = slots[:, :-pad]
            all_slots.append(slots)
        slots = np.concatenate(all_slots, axis=1)  # [B, T, N, C]
        for k, j in enumerate(idxs):
            out[names[j]] = slots[k].astype(np.float32)
        i += batch_size
        if (i // batch_size) % 10 == 0:
            print(f"  {min(i, n_videos)}/{n_videos} videos", flush=True)

    dataset.load_video = False
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="extract slots from videos")
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--save_path", default="", help="output .pkl path")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--chunk_len", type=int, default=24)
    parser.add_argument(
        "--subset", default="",
        help="physion: training|readout|test (dataset subset, reference "
             "extract_slots.py:154-156); otherwise a split name to restrict "
             "extraction to (train|val|test)")
    args = parser.parse_args(argv)

    from ..datasets import build_dataset
    from ..models import build_model
    from ..runtime import dump_obj, load_params, load_state_dict, symlink_force

    params = load_params(args.params)
    params.load_mask = False

    physion = "physion" in params.dataset
    if physion:
        # reference parity: --subset switches the Physion dataset subset
        # (training videos / readout videos / held-out test videos), not a
        # train/val split (/root/reference/slotformer/base_slots/
        # extract_slots.py:138,154-156)
        subset = args.subset or "training"
        assert subset in ("training", "readout", "test"), (
            f"physion --subset must be training|readout|test, got {subset!r}")
        params.dataset = f"physion_{subset}"

    model = build_model(params)
    params_tree = load_state_dict(args.weight)

    save_path = args.save_path
    if not save_path:
        cfg = os.path.splitext(os.path.basename(args.params))[0]
        stem = cfg.replace("_params", "")
        if physion:
            # bake the subset into the default so plain --params/--weight
            # invocations produce distinct files per subset
            stem = f"{stem}_{subset}"
        save_path = os.path.join("data", f"{stem}_slots.pkl")
    elif physion:
        # user-supplied path: check the FULL path like the reference does
        # (extract_slots.py:156), so e.g. data/physion_training/slots.pkl
        # passes
        assert subset in save_path, (
            "include the physion subset in save_path to differentiate slot "
            "files (reference extract_slots.py:156)")

    if physion and subset == "test":
        # test subset has a single split (build_physion_dataset val_only)
        splits = {"test": build_dataset(params)}
    else:
        train_set, val_set = build_dataset(params)
        splits = {"train": train_set, "val": val_set}
    if "clevrer" in params.dataset:
        from ..datasets.clevrer import build_clevrer_dataset

        splits["test"] = build_clevrer_dataset(params, test_set=True)
    if args.subset and not physion:
        splits = {args.subset: splits[args.subset]}

    out = {}
    for split, ds in splits.items():
        print(f"[extract] split={split} videos={len(ds.files)}", flush=True)
        out[split] = extract_video_slots(
            model, params_tree, ds, args.batch_size, args.chunk_len
        )

    dump_obj(out, save_path)
    print(f"[extract] saved -> {save_path}", flush=True)
    # symlink next to the weight for downstream discovery (reference
    # extract_slots.py:86-93); physion uses the subset-keyed name the
    # rollout CLI looks up (reference :87-89)
    link_name = f"{subset}_slots.pkl" if physion else os.path.basename(save_path)
    link = os.path.join(os.path.dirname(os.path.abspath(args.weight)), link_name)
    symlink_force(save_path, link)


if __name__ == "__main__":
    main()
