"""On-hardware Aloe VQA training on synthetic ROLLED-OUT slots.

VERDICT r2 next-round #5a: drive the CLEVRERAloe VQA branch on the TPU end
to end — questions generated from the synthetic renderer's ground truth
(object counts, read off the seeded masks), slots produced by rolling out
the round-2 SlotFormer (experiments/out_synth64/sf) from 6 observed frames
to the full 20, then the full trainer (VQAMethod: row-based batching,
question-level MC scoring) on those rolled-out slots.

Stages (resumable — each skipped when its artifact exists):
  1. counts.json       object count per video (SyntheticVideoDataset masks)
  2. rollout_slots.pkl SlotFormer rollout 6 -> 20 frames for every video
  3. questions/ vocab  2 descriptive + 1 three-choice MC question per video
  4. Aloe training     logs steps/s; final val accuracies

Run:  python experiments/synth_vqa_aloe.py [max_epochs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.environ.get("VQA_OUT", "experiments/out_vqa")
SF_PARAMS = "experiments/synth64_sf_params.py"
SF_CKPT = "experiments/out_synth64/sf/latest.ckpt.pkl"
SLOTS_IN = "experiments/out_synth64/synth_slots.pkl"

COUNT_WORD = {2: "two", 3: "three", 4: "four"}


def stage_counts():
    """Object count per video from the seeded renderer's masks at t=0."""
    path = os.path.join(OUT, "counts.json")
    if os.path.exists(path):
        return json.load(open(path))
    from slotformer_tpu.datasets import build_dataset
    from slotformer_tpu.runtime import load_params

    params = load_params("experiments/synth64_savi_params.py")
    params.load_mask = True
    counts = {}
    for split, n in (("train", params.num_videos_train),
                     ("val", params.num_videos_val)):
        p2 = load_params("experiments/synth64_savi_params.py")
        p2.load_mask = True
        if split == "val":
            ds = build_dataset(p2, val_only=True)
        else:
            ds, _ = build_dataset(p2)
        base = ds
        for v in range(base.num_videos):
            _, masks = base._video(v)
            # max over all frames: an object can be briefly occluded at t=0
            counts[base.files[v]] = int(masks.max())
        print(f"[counts] {split}: {base.num_videos} videos", flush=True)
    json.dump(counts, open(path, "w"))
    return counts


def stage_rollout():
    """Roll out every video's slots 6 -> 20 with the round-2 SlotFormer."""
    path = os.path.join(OUT, "rollout_slots.pkl")
    if os.path.exists(path):
        return path
    import jax

    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import (dump_obj, load_obj, load_params,
                                        load_state_dict)

    params = load_params(SF_PARAMS)
    model = build_model(params)
    tree = load_state_dict(SF_CKPT)
    slots_in = load_obj(SLOTS_IN)
    hist = params.rollout_dict["history_len"]

    @jax.jit
    def roll(p, s6):
        return model.apply({"params": p}, s6, 20 - hist, False, False,
                           method="rollout")

    out = {}
    t0 = time.perf_counter()
    for split, vids in slots_in.items():
        keys = sorted(vids)
        out[split] = {}
        BS = 100
        for i in range(0, len(keys), BS):
            chunk = keys[i:i + BS]
            s6 = np.stack([vids[k][:hist] for k in chunk])
            pred = np.asarray(roll(tree, s6))  # [B, 14, N, D]
            for j, k in enumerate(chunk):
                out[split][k] = np.concatenate(
                    [vids[k][:hist], pred[j]], 0).astype(np.float32)
        print(f"[rollout] {split}: {len(keys)} videos", flush=True)
    dt = time.perf_counter() - t0
    n_frames = sum(len(v) for v in out.values()) * (20 - hist)
    print(f"[rollout] {n_frames} rolled frames in {dt:.1f}s "
          f"({n_frames / dt:.0f} f/s incl. host io)", flush=True)
    dump_obj(out, path)
    return path


def stage_standardize():
    """Per-channel standardization of the rolled-out slots (train stats).

    Round-3 finding (PHYRE readout, experiments/phyre_fake_pipeline.py):
    readout transformers over raw SAVi-family slot features can sit at
    chance for thousands of steps when a few channels carry large static
    offsets — Adam's per-parameter scaling makes the effective
    function-space LR huge along the big channels and tiny along the
    discriminative ones. Standardization is experiment-side preprocessing;
    the CLEVRERAloe model itself stays reference-parity (no input norm,
    reference transformer.py:164-279).
    """
    path = os.path.join(OUT, "rollout_slots_std.pkl")
    if os.path.exists(path):
        return path
    import pickle

    src = pickle.load(open(os.path.join(OUT, "rollout_slots.pkl"), "rb"))
    tr = np.stack(list(src["train"].values()))
    mu = tr.mean((0, 1, 2))
    sd = tr.std((0, 1, 2)) + 1e-6
    out = {
        split: {k: ((v - mu) / sd).astype(np.float32)
                for k, v in vids.items()}
        for split, vids in src.items()
    }
    pickle.dump(out, open(path, "wb"))
    np.savez(path + "_stats.npz", mu=mu, sd=sd)
    print(f"[std] rollout slots standardized -> {path}", flush=True)
    return path


def stage_questions(counts):
    """2 descriptive + 1 three-choice MC question per video + vocab."""
    qdir = os.path.join(OUT, "questions")
    vocab_path = os.path.join(OUT, "vocab.json")
    if os.path.exists(vocab_path):
        return vocab_path
    os.makedirs(qdir, exist_ok=True)
    words = set(["PAD"])
    a_vocab = {}

    def w(text):
        words.update(text.lower().replace("?", "").split(" "))
        return text

    def ans(a):
        if a not in a_vocab:
            a_vocab[a] = len(a_vocab)
        return a

    for split in ("train", "val"):
        scenes = []
        keys = sorted(k for k in counts if f"_{split}_" in k)
        for si, fn in enumerate(keys):
            n = counts[fn]
            qs = [
                {"question_id": 0, "question_type": "descriptive",
                 "question": w("how many objects are in the video"),
                 "answer": ans(COUNT_WORD[n])},
                {"question_id": 1, "question_type": "descriptive",
                 "question": w("are there more than two objects"),
                 "answer": ans("yes" if n > 2 else "no")},
                {"question_id": 2, "question_type": "explanatory",
                 "question": w("which statement about the video is correct"),
                 "choices": [
                     {"choice_id": c,
                      "choice": w(f"there are {COUNT_WORD[k]} objects"),
                      "answer": "correct" if k == n else "wrong"}
                     for c, k in enumerate((2, 3, 4))
                 ]},
            ]
            scenes.append({"scene_index": si, "video_filename": fn,
                           "questions": qs})
        json.dump(scenes, open(os.path.join(qdir, f"{split}.json"), "w"))
        print(f"[questions] {split}: {len(scenes)} scenes", flush=True)
    q_vocab = {w_: i for i, w_ in enumerate(sorted(words))}
    json.dump({"q_vocab": q_vocab, "a_vocab": a_vocab},
              open(vocab_path, "w"))
    return vocab_path


def stage_train(max_epochs):
    from slotformer_tpu.datasets import build_dataset
    from slotformer_tpu.methods import build_method
    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import BaseDataModule, BaseParams

    N_FRAMES = 5  # frame_offset = 20 // 5 = 4

    class P(BaseParams):
        project = "SlotFormer-TPU"
        model = "CLEVRERAloe"
        dataset = "clevrer_vqa"
        data_root = OUT
        slots_root = os.path.join(OUT, "rollout_slots_std.pkl")
        vocab_file = os.path.join(OUT, "vocab.json")
        video_len = 20
        n_sample_frames = N_FRAMES
        max_n_objects = 6  # 7 slots
        max_question_len = 8
        max_choice_len = 6
        shuffle_obj = False
        num_workers = 8
        train_batch_size = 64
        val_batch_size = 128
        slot_size = 128
        transformer_dict = dict(
            input_len=7 * N_FRAMES + 8 + 6, input_dim=16,
            pos_enc="learnable", num_layers=4, num_heads=8, ffn_dim=512,
            norm_first=True, cls_mlp_size=128,
        )
        vision_dict = dict(vision_dim=128)
        loss_dict = dict(use_mask_obj_loss=False)
        cls_answer_loss_w = 1.0
        mc_answer_loss_w = 1.0
        optimizer = "Adam"
        lr = 1e-3
        warmup_steps_pct = 0.1
        eval_interval = 5
        print_iter = 20
        n_samples = 0
        max_rss_gb = 110

    params = P()
    params.max_epochs = max_epochs
    train_set, val_set = build_dataset(params)
    print(f"[train] rows: train={len(train_set)} val={len(val_set)}",
          flush=True)
    dm = BaseDataModule(params, train_set, val_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=os.path.join(OUT, "aloe"))
    method.setup_state()
    t0 = time.perf_counter()
    method.fit(san_check_val_step=2)
    dt = time.perf_counter() - t0
    print(f"[train] {method.it} steps in {dt:.1f}s "
          f"({method.it / dt:.2f} steps/s, "
          f"{method.it * params.train_batch_size / dt:.0f} rows/s)",
          flush=True)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    counts = stage_counts()
    stage_rollout()
    stage_standardize()
    stage_questions(counts)
    stage_train(epochs)
