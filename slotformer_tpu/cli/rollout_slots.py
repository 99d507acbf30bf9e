"""Rollout slots with a trained SlotFormer: CLEVRER + Physion.

Reference behavior:
  * rollout_clevrer_slots.py — extend every video's slots 128 obs -> 160
    total with FRAME-OFFSET INTERLEAVING: for offset k, rollout the phase
    sequences [off::k] separately then re-interleave (:43-57); output
    pickle {'train'/'val'/'test': {fn: [160, N, C]}}, symlinked as
    rollout_slots.pkl next to the weight.
  * rollout_physion_slots.py — same for Physion: 45 obs (1.5 s @ 30fps) ->
    150 total, readout/test subsets.

TPU-native: one jitted ``rollout`` program per (phase length) — the
reference's ``model.module.rollout_len`` mutation becomes a static scan
length; all offset phases share the same compiled program since the phase
lengths are equal when frame_offset divides (target_len - obs_frames).

Usage:
    python -m slotformer_tpu.cli.rollout_slots --task clevrer \
        --params <cfg.py> --weight <ckpt.pkl> --save_path rollout_slots.pkl
    python -m slotformer_tpu.cli.rollout_slots --task physion \
        --subset readout --params <cfg.py> --weight <ckpt.pkl> --save_path ...
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


def interleaved_rollout(
    rollout_fn,
    params_tree,
    slots_dict: Dict[str, np.ndarray],
    obs_frames: int,
    target_len: int,
    history_len: int,
    frame_offset: int,
    batch_size: int = 8,
) -> Dict[str, np.ndarray]:
    """Extend every [obs, N, C] slot sequence to [target_len, N, C]."""
    assert (target_len - obs_frames) % frame_offset == 0, (
        "frame_offset must divide the rollout span for uniform phase lengths"
    )
    names = list(slots_dict.keys())
    out = {}
    for i0 in range(0, len(names), batch_size):
        batch_names = names[i0 : i0 + batch_size]
        obs = np.stack(
            [slots_dict[n][:obs_frames] for n in batch_names]
        ).astype(np.float32)  # [B, obs, N, C]
        true_b = obs.shape[0]
        from ..parallel import pad_rows

        obs = pad_rows(obs, batch_size)  # stable jit shapes
        B = obs.shape[0]
        pad = np.zeros(
            (B, target_len - obs_frames) + obs.shape[2:], np.float32
        )
        ori = np.concatenate([obs, pad], axis=1)  # [B, target, N, C]

        phase_preds = []
        for off in range(frame_offset):
            start = obs_frames - history_len * frame_offset + off
            in_slots = ori[:, start::frame_offset]  # [B, hist+ro, N, C]
            past = in_slots[:, :history_len]
            pred_len = in_slots.shape[1] - history_len
            phase_preds.append(
                np.asarray(rollout_fn(params_tree, past, pred_len))
            )
        # re-interleave: global step i -> phase i%offset, step i//offset
        pred = np.stack(
            [
                phase_preds[i % frame_offset][:, i // frame_offset]
                for i in range(target_len - obs_frames)
            ],
            axis=1,
        )
        full = np.concatenate([obs, pred], axis=1)
        assert full.shape[1] == target_len
        for k, n in enumerate(batch_names):
            out[n] = full[k].astype(np.float32)
        print(f"  {min(i0 + batch_size, len(names))}/{len(names)} videos",
              flush=True)
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="rollout slots via SlotFormer")
    parser.add_argument("--task", choices=["clevrer", "physion", "synthetic"],
                        required=True)
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--subset", default="readout",
                        help="physion only: readout | test")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--obs_frames", type=int, default=-1)
    parser.add_argument("--target_len", type=int, default=-1)
    args = parser.parse_args(argv)

    import functools

    import jax

    from ..models import build_model
    from ..runtime import (dump_obj, load_obj, load_params, load_state_dict,
                           mkdir_or_exist, symlink_force)

    params = load_params(args.params)
    params.loss_dict["use_img_recon_loss"] = False
    model = build_model(params)
    params_tree = load_state_dict(args.weight)
    history_len = params.input_frames
    frame_offset = params.frame_offset

    from ..parallel import get_mesh, replicate, shard_or_replicate

    mesh = get_mesh()
    params_tree = replicate(mesh, params_tree)

    @functools.partial(jax.jit, static_argnums=2)
    def _rollout(p, past, pred_len):
        return model.apply({"params": p}, past, pred_len, method="rollout")

    def rollout_fn(p, past, pred_len):
        return _rollout(p, shard_or_replicate(mesh, past), pred_len)

    if args.task == "clevrer":
        obs_frames = 128 if args.obs_frames < 0 else args.obs_frames
        target_len = 160 if args.target_len < 0 else args.target_len
        all_slots = load_obj(params.slots_root)
        splits = ["val", "train", "test"]
        link_name = "rollout_slots.pkl"
    elif args.task == "physion":
        assert args.subset in ("readout", "test")
        assert args.subset in args.save_path, (
            "include the subset in save_path to differentiate slot files"
        )
        obs_frames = 45 if args.obs_frames < 0 else args.obs_frames  # 1.5s@30fps
        target_len = params.get("video_len", 150) if args.target_len < 0 \
            else args.target_len
        slot_name = f"{args.subset}_slots.pkl"
        slots_root = os.path.join(os.path.dirname(params.slots_root), slot_name)
        all_slots = load_obj(slots_root)
        splits = ["test"] if args.subset == "test" else ["train", "val"]
        # the readout config + test_physion_vqa discover rolled-out slots as
        # {subset}_slots.pkl next to the SlotFormer weight (reference
        # rollout_physion_slots.py:95,121) — distinct from the same-named
        # extract symlinks, which live next to the STEVE weight
        link_name = f"{args.subset}_slots.pkl"
    else:  # synthetic (for e2e testing)
        obs_frames = args.obs_frames
        target_len = args.target_len
        assert obs_frames > 0 and target_len > 0
        all_slots = load_obj(params.slots_root)
        splits = [s for s in ("train", "val", "test") if s in all_slots]
        link_name = "rollout_slots.pkl"

    out = {}
    for split in splits:
        if split not in all_slots:
            continue
        print(f"[rollout] split={split} videos={len(all_slots[split])}",
              flush=True)
        out[split] = interleaved_rollout(
            rollout_fn, params_tree, all_slots[split], obs_frames, target_len,
            history_len, frame_offset, args.batch_size,
        )

    mkdir_or_exist(os.path.dirname(args.save_path))
    dump_obj(out, args.save_path)
    print(f"[rollout] saved -> {args.save_path}", flush=True)
    link = os.path.join(os.path.dirname(os.path.abspath(args.weight)), link_name)
    symlink_force(args.save_path, link)


if __name__ == "__main__":
    main()
