"""CLEVRER VQA dataset (questions + precomputed slots).

Behavioral spec: /root/reference/slotformer/clevrer_vqa/datasets/clevrer.py —
question tokenization against the in-repo vocab cache, descriptive (cls) vs
multiple-choice (mc) questions, cls questions padded to
max_question_len+max_choice_len so both types share one token length,
predictive questions reading the ROLLOUT TAIL when stored slots are longer
than 150 frames (clevrer.py:365-374), optional object-order shuffling, and
the subtype ids {descriptive:0, explanatory:1, predictive:2, counterfactual:3}.

TPU-native divergence — ROW-BASED BATCHING (see models/aloe.py): instead of
the reference's ragged ``mc_flag`` collate, every item is ONE
(question [, choice]) row with static shapes:
  - cls question  -> 1 row, label = answer class id
  - mc question   -> one row per choice, label = 0/1
Rows carry (scene_index, question_id, choice_id, q_subtype, is_cls) so the
eval CLI regroups choices per question for all-correct MC scoring. At eval
the frame start index is seeded per question so all rows of one question
see the same frames.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np

from ..runtime.datamodule import Dataset
from ..runtime.io import load_obj

_VOCAB_CACHE = osp.join(
    osp.dirname(osp.realpath(__file__)), "cache", "CLEVRER_vocab.json"
)

Q_SUBTYPE2ID = {
    "descriptive": 0,
    "explanatory": 1,
    "predictive": 2,
    "counterfactual": 3,
}


def _vocab_tokenize(text: str):
    """The vocab-defining normalization (reference _tokenize_text,
    clevrer_vqa/datasets/clevrer.py:203-212): lowercase, strip '?', split
    on single spaces, drop empties."""
    return [w for w in text.lower().replace("?", "").split(" ") if w]


def build_vocab(data_root: str, splits=("train", "val"),
                save_path: Optional[str] = None) -> dict:
    """Build the CLEVRER vocab cache from the question corpus.

    BEYOND the reference: the reference only ships the pre-computed
    ``cache/CLEVRER_vocab.json`` and can never regenerate it (its dataset
    class just loads it, clevrer_vqa/datasets/clevrer.py:238-241) — a user
    with a regenerated dataset is stuck. The cache's construction rule is
    recovered from the artifact itself: ``q_vocab`` = PAD at 0 then every
    unique question/choice token lexicographically sorted; ``a_vocab`` =
    PAD at 0 then every unique descriptive answer sorted. Applied to the
    full CLEVRER corpus this reproduces the shipped cache byte-for-byte
    (tests/test_task_datasets.py::test_build_vocab_reproduces_shipped_rule).
    """
    from ..runtime.io import dump_obj

    words, answers = set(), set()
    n_read = 0
    for split in splits:
        qfile = os.path.join(data_root, "questions", f"{split}.json")
        if not os.path.isfile(qfile):
            continue
        n_read += 1
        for scene in load_obj(qfile):
            for q in scene["questions"]:
                words.update(_vocab_tokenize(q["question"]))
                if q["question_type"] == "descriptive":
                    if "answer" in q:
                        answers.add(str(q["answer"]))
                else:
                    for c in q.get("choices", []):
                        words.update(_vocab_tokenize(c["choice"]))
    if n_read == 0 or not words:
        # never persist an empty PAD-only cache: it would poison every
        # later run via the isfile(vocab_file) fast path until manually
        # deleted — fail loudly with the paths that were probed instead
        probed = [os.path.join(data_root, "questions", f"{s}.json")
                  for s in splits]
        raise FileNotFoundError(
            f"build_vocab: no question corpus found (probed {probed}); "
            "refusing to write an empty vocab cache. Point data_root at a "
            "CLEVRER root containing questions/train.json (+ val.json).")
    vocab = {
        "q_vocab": {"PAD": 0, **{w: i + 1 for i, w in enumerate(sorted(words))}},
        "a_vocab": {"PAD": 0,
                    **{a: i + 1 for i, a in enumerate(sorted(answers))}},
    }
    if save_path:
        dump_obj(vocab, save_path)
    return vocab


class CLEVRERVQASlotsDataset(Dataset):
    """Row-based (question[, choice]) dataset over precomputed slots."""

    def __init__(
        self,
        data_root: str,
        video_slots: dict,
        vocab_file: str = _VOCAB_CACHE,
        split: str = "train",
        max_n_objects: int = 6,
        video_len: int = 128,
        n_sample_frames: int = 25,
        max_question_len: int = 20,
        max_choice_len: int = 12,
        shuffle_obj: bool = False,
    ):
        assert split in ("train", "val", "test")
        self.data_root = data_root
        self.video_slots = video_slots
        self.split = split
        self.video_len = video_len
        self.n_sample_frames = n_sample_frames
        self.frame_offset = video_len // n_sample_frames
        self.max_question_len = max_question_len
        self.max_choice_len = max_choice_len
        self.shuffle_obj = shuffle_obj

        if not osp.isfile(vocab_file):
            # build-if-missing: regenerate the cache from the question
            # corpus (capability the reference lacks — see build_vocab)
            print(f"[clevrer_vqa] vocab cache {vocab_file!r} missing — "
                  f"building it from the question corpus under {data_root!r}")
            build_vocab(data_root, save_path=vocab_file)
        vocabs = load_obj(vocab_file)
        self.q_vocab = vocabs["q_vocab"]
        self.answer2label = vocabs["a_vocab"]
        self.label2answer = {v: k for k, v in self.answer2label.items()}

        self.rows = self._build_rows()
        self.max_start = (
            self.video_len - (self.n_sample_frames - 1) * self.frame_offset
        )

    # -------------------------------------------------------------- indexing
    def _tokenize(self, text: str, pad_num: int):
        # _vocab_tokenize IS the vocab-defining normalization — using it
        # here keeps construction and lookup from ever diverging
        toks = [self.q_vocab[w] for w in _vocab_tokenize(text)]
        pad_mask = np.ones(pad_num, bool)
        pad_mask[: len(toks)] = False
        toks = toks + [self.q_vocab["PAD"]] * (pad_num - len(toks))
        return np.asarray(toks, np.int32), pad_mask

    def _build_rows(self):
        qfile = os.path.join(self.data_root, "questions", f"{self.split}.json")
        scenes = load_obj(qfile)
        L = self.max_question_len + self.max_choice_len
        rows = []
        for scene in scenes:
            fn = scene["video_filename"]
            sidx = scene["scene_index"]
            for q in scene["questions"]:
                subtype = Q_SUBTYPE2ID[q["question_type"]]
                if q["question_type"] == "descriptive":
                    toks, pad = self._tokenize(q["question"], L)
                    label = (
                        int(self.answer2label[q["answer"]])
                        if "answer" in q
                        else -1
                    )
                    rows.append(
                        dict(
                            video_fn=fn, scene_index=sidx,
                            question_id=q["question_id"], choice_id=-1,
                            q_subtype=subtype, is_cls=True, label=label,
                            q_tokens=toks, q_pad_mask=pad,
                        )
                    )
                else:
                    q_toks, q_pad = self._tokenize(
                        q["question"], self.max_question_len
                    )
                    for choice in q["choices"]:
                        c_toks, c_pad = self._tokenize(
                            choice["choice"], self.max_choice_len
                        )
                        label = (
                            int(choice["answer"] == "correct")
                            if "answer" in choice
                            else 1
                        )
                        rows.append(
                            dict(
                                video_fn=fn, scene_index=sidx,
                                question_id=q["question_id"],
                                choice_id=choice["choice_id"],
                                q_subtype=subtype, is_cls=False, label=label,
                                q_tokens=np.concatenate([q_toks, c_toks]),
                                q_pad_mask=np.concatenate([q_pad, c_pad]),
                            )
                        )
        return rows

    def __len__(self):
        return len(self.rows)

    # ----------------------------------------------------------------- reads
    def _start_idx(self, row) -> int:
        if self.split == "train":
            return int(np.random.randint(0, self.max_start))
        # eval: deterministic (stable across processes — python hash() is
        # salted), shared by all rows of one question
        split_seed = {"train": 0, "val": 1, "test": 2}[self.split]
        rng = np.random.default_rng(
            (split_seed, row["scene_index"], row["question_id"])
        )
        return int(rng.integers(0, self.max_start))

    def _get_slots(self, row, start_idx: int) -> np.ndarray:
        embs = self.video_slots[row["video_fn"]]  # [T, N, C]
        # predictive questions read the unrolled tail when present
        if row["q_subtype"] == 2 and embs.shape[0] > 150:
            start_idx += embs.shape[0] - self.video_len
        sel = start_idx + self.frame_offset * np.arange(self.n_sample_frames)
        embs = embs[sel]
        if self.shuffle_obj:
            perm = np.random.permutation(embs.shape[1])
            embs = embs[:, perm]
        return np.ascontiguousarray(embs.astype(np.float32))

    def _rand_another(self, row_is_cls: bool):
        same_type = [
            i for i, r in enumerate(self.rows) if r["is_cls"] == row_is_cls
        ]
        return self[int(np.random.choice(same_type))]

    def __getitem__(self, idx):
        row = self.rows[idx]
        start_idx = self._start_idx(row)
        try:
            video_emb = self._get_slots(row, start_idx)
        except KeyError:
            if self.split != "test":
                return self._rand_another(row["is_cls"])
            # test: keep question identity, borrow another video's slots
            other = self._rand_another(row["is_cls"])
            video_emb = other["video_emb"]
        return {
            "video_emb": video_emb,
            "q_tokens": row["q_tokens"],
            "q_pad_mask": row["q_pad_mask"],
            "is_cls": row["is_cls"],
            "label": np.int32(max(row["label"], 0)),
            "raw_label": np.int32(row["label"]),
            "q_subtype": np.int32(row["q_subtype"]),
            "scene_index": np.int32(row["scene_index"]),
            "question_id": np.int32(row["question_id"]),
            "choice_id": np.int32(row["choice_id"]),
            "data_idx": idx,
        }

    def get_answer_from_label(self, answer_labels: np.ndarray) -> np.ndarray:
        shape = answer_labels.shape
        flat = answer_labels.flatten()
        return np.array([self.label2answer[int(l)] for l in flat]).reshape(shape)


def build_clevrer_vqa_dataset(params, val_only=False, test_set=False):
    """Builder matching the reference surface
    (clevrer_vqa/datasets/__init__.py); returns (train, val) or test set.
    No custom collate needed — rows are already dense."""
    video_slots = load_obj(params.slots_root)
    args = dict(
        data_root=params.data_root,
        video_slots=None,
        vocab_file=params.get("vocab_file", _VOCAB_CACHE),
        split="val",
        max_n_objects=params.max_n_objects,
        video_len=params.get("video_len", 128),
        n_sample_frames=params.n_sample_frames,
        max_question_len=params.max_question_len,
        max_choice_len=params.max_choice_len,
        shuffle_obj=params.get("shuffle_obj", False),
    )
    if test_set:
        args["split"] = "test"
        args["video_slots"] = video_slots["test"]
        args["shuffle_obj"] = False
        return CLEVRERVQASlotsDataset(**args)
    args["video_slots"] = video_slots["val"]
    val_dataset = CLEVRERVQASlotsDataset(**args)
    if val_only:
        return val_dataset
    args["split"] = "train"
    args["video_slots"] = video_slots["train"]
    return CLEVRERVQASlotsDataset(**args), val_dataset


from . import register_dataset  # noqa: E402

register_dataset("clevrer_vqa", build_clevrer_vqa_dataset)
