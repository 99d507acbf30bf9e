"""Physion VQA readout evaluation.

Reference behavior (/root/reference/slotformer/physion_vqa/test_physion_vqa.py):
sweep (checkpoint dir x thresholds), report the best overall accuracy and
per-task accuracy on the test subset (rolled-out test slots).

Usage:
    python -m slotformer_tpu.cli.test_physion_vqa --params <readout_cfg.py> \
        --weight <ckpt.pkl or dir> [--threshs 0.4 0.45 ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="test Physion VQA readout")
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument(
        "--threshs", nargs="+", type=float,
        default=[0.4, 0.45, 0.5, 0.55, 0.6, 0.65],
    )
    parser.add_argument("--batch_size", type=int, default=64)
    args = parser.parse_args(argv)

    import jax

    from ..datasets import build_dataset
    from ..models import build_model
    from ..runtime import DataLoader, load_params, load_state_dict

    params = load_params(args.params)
    params.dataset = "physion_slots_label_test"
    params.slots_root = os.path.join(
        os.path.dirname(params.slots_root), "test_slots.pkl"
    )
    test_set = build_dataset(params)
    model = build_model(params)

    if os.path.isfile(args.weight):
        all_weights = [args.weight]
    else:
        all_weights = [
            os.path.join(args.weight, w)
            for w in sorted(os.listdir(args.weight))
            if w.endswith(".pkl") and not w.startswith("latest")
        ]

    @jax.jit
    def forward(p, batch):
        return model.apply({"params": p}, batch)["logits"]

    loader = DataLoader(
        test_set, batch_size=args.batch_size, shuffle=False, drop_last=False,
        num_workers=4,
    )

    def eval_weight(w):
        p = load_state_dict(w)
        probs, labels, tasks = [], [], []
        for batch in loader:
            db = {k: v for k, v in batch.items() if hasattr(v, "shape")}
            from ..parallel import pad_rows

            true_b = db["slots"].shape[0]
            db = {k: pad_rows(v, args.batch_size) for k, v in db.items()}
            logits = np.asarray(forward(p, db))[:true_b]
            probs.append(1.0 / (1.0 + np.exp(-logits)))
            labels.append(np.asarray(batch["label"])[:true_b])
            tasks.append(np.asarray(batch["task_idx"])[:true_b])
        return (np.concatenate(probs), np.concatenate(labels),
                np.concatenate(tasks))

    sweep = []
    best = (-1.0, None, None, None)  # acc, weight, thresh, task_acc
    for w in all_weights:
        probs, labels, tasks = eval_weight(w)
        for thresh in args.threshs:
            pred = (probs > thresh).astype(labels.dtype)
            acc = float((pred == labels).mean())
            task_acc = {
                test_set.all_tasks[t]: float((pred[tasks == t] == labels[tasks == t]).mean())
                for t in np.unique(tasks)
            }
            print(f"{os.path.basename(w)} @ {thresh:.2f}: acc={acc:.4f}")
            sweep.append({"weight": os.path.basename(w), "thresh": thresh,
                          "acc": acc, "task_acc": task_acc})
            if acc > best[0]:
                best = (acc, w, thresh, task_acc)

    acc, w, thresh, task_acc = best
    print(f"\nThreshold {thresh}, {w} achieves the best accuracy")
    print(f"All accuracy: {acc:.3f}")
    for task, a in task_acc.items():
        print(f"{task}: {a:.3f}")
    return {"sweep": sweep,
            "best": {"weight": os.path.basename(w), "thresh": thresh,
                     "acc": acc, "task_acc": task_acc}}


if __name__ == "__main__":
    main()
