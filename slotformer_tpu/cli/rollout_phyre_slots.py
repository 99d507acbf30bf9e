"""PHYRE slot rollout: SingleStepSlotFormer conditioned on the first slot.

Reference behavior (/root/reference/slotformer/video_prediction/rollout_phyre_slots.py):
per-action ``.npy`` slot files -> take the whole fixed-length sequence, feed
to SingleStepSlotFormer (history 1, rollout vid_len-1), save
[obs_slot_0, pred_slots...] per action; resumable (skips existing npys) and
shardable via ``--split/--total_split``. No simulator needed — the action
split fixtures ship in-repo.

Usage:
    python -m slotformer_tpu.cli.rollout_phyre_slots --params <cfg.py> \
        --weight <ckpt.pkl> --save_path ./data/PHYRE
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

from ..datasets.phyre import _SPLIT_DIR, fix_video_len


class _SlotOnlyPHYREDataset:
    """Slim per-action slot reader (reference rollout_phyre_slots.py:28-117)."""

    def __init__(self, slot_root, split, protocal="within", fold=0,
                 vid_len=15, ratio=1.0, pos_ratio=0.2):
        self.slot_root = slot_root
        self.split = split
        self.protocal = protocal
        self.fold = fold
        self.vid_len = vid_len
        info_path = osp.join(
            _SPLIT_DIR,
            f"{protocal}-fold_{fold}-{split}-data_{ratio}-pos_{pos_ratio}.npy",
        )
        self.video_info = np.load(info_path)
        self.act_labels = np.load(info_path.replace(".npy", "-label.npy"))

    def __len__(self):
        return self.video_info.shape[0]

    def read_slots(self, idx):
        slots = np.load(osp.join(self.slot_root, f"{idx:06d}.npy"))
        return fix_video_len(slots, self.vid_len).astype(np.float32)


def rollout_split(model, params_tree, dataset, save_root, args) -> None:
    import jax

    from ..runtime.io import atomic_write_npy, symlink_force

    os.makedirs(save_root, exist_ok=True)
    if args.split in (-1, 0):
        symlink_force(save_root, os.path.join(
            os.path.dirname(os.path.abspath(args.weight)),
            f"{dataset.split}_slots",
        ))

    total = len(dataset)
    if args.split == -1:
        start_idx, end_idx = 0, total
    else:
        per = total // args.total_split
        start_idx = per * args.split
        end_idx = per * (args.split + 1) if args.split < args.total_split - 1 else total

    from ..parallel import get_mesh, pad_rows, replicate, shard_or_replicate

    mesh = get_mesh()
    params_tree = replicate(mesh, params_tree)

    @jax.jit
    def _forward(p, slots):
        out = model.apply({"params": p}, {"slots": slots})
        return out["pred_slots"]

    def forward(p, slots):
        return _forward(p, shard_or_replicate(mesh, slots))

    bs = args.bs
    for i0 in range(start_idx, end_idx, bs):
        idxs = list(range(i0, min(i0 + bs, end_idx)))
        if all(
            os.path.exists(os.path.join(save_root, f"{i:06d}.npy")) for i in idxs
        ):
            continue  # idempotent restart
        slots_in, ok = [], []
        for i in idxs:
            try:
                slots_in.append(dataset.read_slots(i))
                ok.append(True)
            except FileNotFoundError:
                slots_in.append(np.zeros_like(slots_in[0]) if slots_in else None)
                ok.append(False)
        if slots_in[0] is None:
            continue
        slots_in = [
            s if s is not None else np.zeros_like(slots_in[0]) for s in slots_in
        ]
        batch = np.stack(slots_in)
        batch = pad_rows(batch, bs)
        preds = np.asarray(forward(params_tree, batch))  # [B, T-1, N, C]
        full = np.concatenate([batch[:, :1], preds], axis=1)
        assert full.shape[1] == batch.shape[1]
        for k, i in enumerate(idxs):
            if ok[k]:
                atomic_write_npy(
                    full[k].astype(np.float32),
                    os.path.join(save_root, f"{i:06d}.npy"),
                )
        print(f"  {min(i0 + bs, end_idx)}/{end_idx}", flush=True)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="rollout PHYRE slots")
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--split", type=int, default=-1)
    parser.add_argument("--total_split", type=int, default=10)
    parser.add_argument("--bs", type=int, default=32)
    args = parser.parse_args(argv)

    from ..models import build_model
    from ..runtime import load_params, load_state_dict

    params = load_params(args.params)
    params.loss_dict["use_img_recon_loss"] = False
    # rollout covers the full video from frame 0
    params.loss_dict["rollout_len"] = params.video_len - 1
    model = build_model(params)
    params_tree = load_state_dict(args.weight)

    for split in ("val", "train"):
        ds = _SlotOnlyPHYREDataset(
            slot_root=params.slots_root.format(split),
            split=split,
            protocal=params.phyre_protocal,
            fold=params.phyre_fold,
            vid_len=params.video_len,
            ratio=params.data_ratio,
            pos_ratio=params.pos_ratio,
        )
        save_root = os.path.join(
            args.save_path,
            "rollout_slots",
            os.path.splitext(os.path.basename(args.params))[0],
            f"{ds.protocal}-fold_{ds.fold}-{split}",
        )
        print(f"[rollout_phyre] split={split} actions={len(ds)}", flush=True)
        rollout_split(model, params_tree, ds, save_root, args)


if __name__ == "__main__":
    main()
