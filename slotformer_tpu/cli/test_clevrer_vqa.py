"""CLEVRER VQA evaluation / submission CLI.

Reference behavior (/root/reference/slotformer/clevrer_vqa/test_clevrer_vqa.py):
produce the eval.ai submission ``CLEVRER.json`` for the 5000 test scenes —
descriptive questions get an answer string, MC questions a per-choice
correct/wrong verdict; saved next to the weight.

With ``--split val`` it instead scores question-level accuracy locally
(all-choices-correct MC scoring + per-subtype accuracy — the reference
computes this inside aloe.py:33-92 during training eval; here rows are
regrouped by (scene_index, question_id) host-side).

Usage:
    python -m slotformer_tpu.cli.test_clevrer_vqa --params <cfg.py> \
        --weight <ckpt.pkl> [--split test|val]
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


def _forward_rows(model, params_tree, dataset, batch_size, max_batches=-1):
    """Yield (row_meta, cls_answer, mc_correct_prob) over the dataset."""
    import jax

    from ..runtime import DataLoader

    @jax.jit
    def forward(p, batch):
        out = model.apply({"params": p}, batch)
        return out["cls_answer_logits"].argmax(-1), out["mc_answer_logits"]

    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=False, drop_last=False,
        num_workers=4,
    )
    for bi, batch in enumerate(loader):
        if 0 < max_batches <= bi:
            break
        db = {k: v for k, v in batch.items() if hasattr(v, "shape")}
        from ..parallel import pad_rows

        true_b = db["q_tokens"].shape[0]
        db = {k: pad_rows(v, batch_size) for k, v in db.items()}
        cls_ans, mc_logits = forward(params_tree, db)
        cls_ans = np.asarray(cls_ans)[:true_b]
        mc_pred = np.asarray(mc_logits)[:true_b] > 0
        for i in range(true_b):
            yield (
                {k: np.asarray(batch[k])[i] for k in
                 ("scene_index", "question_id", "choice_id", "q_subtype",
                  "is_cls", "raw_label")},
                int(cls_ans[i]),
                bool(mc_pred[i]),
            )


def main(argv=None):
    """Returns the submission list (--split test) or the question-level
    metrics dict (--split val); also printed/saved as the reference does."""
    parser = argparse.ArgumentParser(description="Aloe CLEVRER VQA eval")
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--split", default="test", choices=["test", "val"])
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--max_batches", type=int, default=-1)
    parser.add_argument("--save_path", default="")
    args = parser.parse_args(argv)

    from ..datasets.clevrer_vqa import build_clevrer_vqa_dataset
    from ..models import build_model
    from ..runtime import dump_obj, load_params, load_state_dict

    params = load_params(args.params)
    model = build_model(params)
    params_tree = load_state_dict(args.weight)

    if args.split == "test":
        dataset = build_clevrer_vqa_dataset(params, test_set=True)
        label2answer = dataset.label2answer
        results = [
            {"scene_index": i + 15000, "questions": []} for i in range(5000)
        ]
        q_entries = {}
        for meta, cls_ans, mc_corr in _forward_rows(
            model, params_tree, dataset, args.batch_size, args.max_batches
        ):
            res_idx = int(meta["scene_index"]) - 15000
            q_id = int(meta["question_id"])
            if meta["is_cls"]:
                results[res_idx]["questions"].append(
                    {"question_id": q_id, "answer": str(label2answer[cls_ans])}
                )
            else:
                key = (res_idx, q_id)
                if key not in q_entries:
                    q_entries[key] = {"question_id": q_id, "choices": []}
                    results[res_idx]["questions"].append(q_entries[key])
                q_entries[key]["choices"].append(
                    {
                        "choice_id": int(meta["choice_id"]),
                        "answer": "correct" if mc_corr else "wrong",
                    }
                )
        save_path = args.save_path or os.path.join(
            os.path.dirname(os.path.abspath(args.weight)), "CLEVRER.json"
        )
        dump_obj(results, save_path)
        print(f"[test_clevrer_vqa] submission saved -> {save_path}")
        return results

    # ---- local val scoring: question-level accuracy incl. per-subtype
    dataset = build_clevrer_vqa_dataset(params, val_only=True)
    cls_correct, cls_total = 0, 0
    mc_rows = defaultdict(list)  # (scene, qid) -> [(pred, label, subtype)]
    for meta, cls_ans, mc_corr in _forward_rows(
        model, params_tree, dataset, args.batch_size, args.max_batches
    ):
        if meta["is_cls"]:
            cls_total += 1
            cls_correct += int(cls_ans == int(meta["raw_label"]))
        else:
            mc_rows[(int(meta["scene_index"]), int(meta["question_id"]))].append(
                (mc_corr, bool(meta["raw_label"]), int(meta["q_subtype"]))
            )
    per_subtype = defaultdict(list)
    q_correct = []
    for rows in mc_rows.values():
        all_corr = all(pred == label for pred, label, _ in rows)
        q_correct.append(all_corr)
        per_subtype[rows[0][2]].append(all_corr)
    metrics = {
        "descriptive_acc": cls_correct / max(cls_total, 1),
        "descriptive_n": cls_total,
        "multiple-choice_acc": float(np.mean(q_correct)) if q_correct else 0.0,
        "multiple-choice_n": len(q_correct),
    }
    for name, sid in (("explanatory", 1), ("predictive", 2),
                      ("counterfactual", 3)):
        vals = per_subtype.get(sid, [])
        metrics[f"{name}_acc"] = float(np.mean(vals)) if vals else 0.0
        metrics[f"{name}_n"] = len(vals)
    for q in ("descriptive", "multiple-choice", "explanatory", "predictive",
              "counterfactual"):
        print(f"{q}_acc: {metrics[f'{q}_acc']:.4f} "
              f"({metrics[f'{q}_n']} questions)")
    return metrics


if __name__ == "__main__":
    main()
