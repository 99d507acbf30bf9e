#!/usr/bin/env python
"""Generate the end-to-end CLEVRER VQA pipeline parity golden.

Runs the REFERENCE's own VQA evaluation flow in torch on a committed
fixture (question JSONs + slots + vocab):

  * dataset + collate: CLEVRERSlotsVQADataset + clevrer_collate_fn
    (/root/reference/slotformer/clevrer_vqa/datasets/clevrer.py:318-477) —
    tokenization, cls-vs-mc packing, the predictive-question rollout-tail
    shift (clevrer.py:365-374), and the ragged ``mc_flag`` batching;
  * model: seeded CLEVRERTransformerModel (models/transformer.py:46-260);
  * test split: the eval.ai submission grouping from test_clevrer_vqa.py
    (test():31-91) -> the 5000-scene CLEVRER.json structure;
  * val split: question-level accuracies — all-choices-correct MC scoring
    and per-subtype accs (models/aloe.py:46-92) accumulated with the
    per-batch MeanMetric weighting of method.py:63-112.

Records the torch state_dict (with the real checkpoints' CLEVRERAloe
``transformer_model.`` key prefix), the submission JSON, and the val
accuracies into ``vqa_golden.npz``. ``tests/test_vqa_e2e_parity.py`` then
drives cli.convert_reference_ckpt + cli.test_clevrer_vqa on the same
config and asserts submission- and metric-level equality — covering the
VQA pipeline's untested seams (question tokenization via the vocab cache,
row-based vs ragged batching, host-side question regrouping, converted
full Aloe checkpoint).

Run from the repo root:  python tests/golden/gen_vqa_golden.py
(needs /root/reference checked out; the committed fixture/.npz do not)
"""

import json
import os
import pickle
import sys
import types

import numpy as np
import torch
from torch import nn
from torch.utils.data import DataLoader

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

import gen_model_goldens as gg  # noqa: E402  (nerv stub + _load)

FIXTURE = os.path.join(HERE, "vqa_fixture")
SLOTS = os.path.join(HERE, "vqa_slots.pkl")

# ---------------------------------------------------------------- fixture
# question texts fit max_question_len=6 / max_choice_len=4 tokens
_DESC = [
    ("what color is the sphere?", ["red", "blue", "green"]),
    ("how many cubes are there?", ["two", "three", "two"]),
]
_MC = [
    # (question, subtype, [(choice, correct per scene)...])
    ("which event is responsible?", "explanatory", [
        ("the red sphere", [True, False, True]),
        ("the gray cube", [False, True, False]),
        ("the cylinder stops", [False, False, True]),
    ]),
    ("what will happen next?", "predictive", [
        ("the sphere collides", [True, False, False]),
        ("the cube exits", [False, True, False]),
        ("the cylinder stops", [False, False, True]),
        ("nothing happens", [False, True, False]),
    ]),
    ("what if the sphere is removed?", "counterfactual", [
        ("the cube exits", [True, True, False]),
        ("nothing happens", [False, True, True]),
    ]),
]
N_SCENES = 3
VAL_BASE, TEST_BASE = 7000, 15000


def _scenes(base, with_answers):
    scenes = []
    for s in range(N_SCENES):
        qs = []
        qid = 0
        for qtext, answers in _DESC:
            q = {"question_id": qid, "question": qtext,
                 "question_type": "descriptive"}
            if with_answers:
                q["answer"] = answers[s]
            qs.append(q)
            qid += 1
        for qtext, subtype, choices in _MC:
            ch = []
            for ci, (ctext, correct) in enumerate(choices):
                c = {"choice_id": ci, "choice": ctext}
                if with_answers:
                    c["answer"] = "correct" if correct[s] else "wrong"
                ch.append(c)
            qs.append({"question_id": qid, "question": qtext,
                       "question_type": subtype, "choices": ch})
            qid += 1
        scenes.append({
            "scene_index": base + s,
            "video_filename": f"video_{base + s:05d}.mp4",
            "questions": qs,
        })
    return scenes


def write_fixture():
    os.makedirs(os.path.join(FIXTURE, "questions"), exist_ok=True)
    val = _scenes(VAL_BASE, True)
    test = _scenes(TEST_BASE, False)
    for split, scenes in (("train", val), ("val", val), ("test", test)):
        with open(os.path.join(FIXTURE, "questions", f"{split}.json"),
                  "w") as f:
            json.dump(scenes, f, indent=1, sort_keys=True)

    # vocab: built by OUR builder (the reference can only consume the file;
    # running it through the reference dataset also cross-checks build_vocab)
    from slotformer_tpu.datasets.clevrer_vqa import build_vocab
    build_vocab(FIXTURE, save_path=os.path.join(FIXTURE, "vocab.json"))

    # slots: scene 0 of each split stored unrolled (T=160 > 150) so the
    # predictive rollout-tail branch runs; others T = video_len = 4
    rs = np.random.RandomState(123)
    slots = {}
    for split, base in (("train", VAL_BASE), ("val", VAL_BASE),
                        ("test", TEST_BASE)):
        slots[split] = {
            f"video_{base + s:05d}.mp4":
                rs.randn(160 if s == 0 else 4, 3, 16).astype(np.float32)
            for s in range(N_SCENES)
        }
    with open(SLOTS, "wb") as f:
        pickle.dump(slots, f)
    return slots


# ------------------------------------------------- reference-side plumbing
def _install_vqa_stubs():
    gg._install_nerv_stub()
    # numpy>=1.24 removed np.bool; the reference pins an old numpy
    # (clevrer.py:207 `astype(np.bool)`)
    if not hasattr(np, "bool"):
        np.bool = bool
    u = sys.modules["nerv.utils"]
    from slotformer_tpu.runtime.io import load_obj
    u.load_obj = load_obj
    u.strip_suffix = lambda s: os.path.splitext(s)[0]
    u.VideoReader = None  # load_frames=False: never touched
    u.read_img = None
    # datasets/utils.py imports torchvision.transforms at module level;
    # CLEVRTransforms is never instantiated here (slots dataset)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    # vp slotformer.py does `from slotformer.base_slots.models import
    # StoSAVi` for its decoder graft — unused here (we only need its
    # build_pos_enc), shim the import chain
    for name in ("slotformer", "slotformer.base_slots",
                 "slotformer.base_slots.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["slotformer.base_slots.models"].StoSAVi = object


def _make_build_transformer_encoder(sf_mod):
    """nerv's build_transformer_encoder surface (same construction as
    gen_model_goldens' g_aloe golden): learnable/sin PE added to the input,
    then a torch TransformerEncoder (batch_first, pre-LN, norm_last off)."""

    def build_transformer_encoder(input_len, pos_enc, d_model, num_heads,
                                  ffn_dim, num_layers, norm_first=True,
                                  norm_last=True):
        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_enc = sf_mod.build_pos_enc(pos_enc, input_len,
                                                    d_model)
                layer = nn.TransformerEncoderLayer(
                    d_model, num_heads, dim_feedforward=ffn_dim, dropout=0.1,
                    norm_first=norm_first, batch_first=True,
                )
                self.transformer_encoder = nn.TransformerEncoder(
                    layer, num_layers,
                    norm=nn.LayerNorm(d_model) if norm_last else None,
                )

            def forward(self, x, src_key_padding_mask=None):
                if self.pos_enc is not None:
                    x = x + self.pos_enc
                return self.transformer_encoder(
                    x, src_key_padding_mask=src_key_padding_mask)

        return _Enc()

    return build_transformer_encoder


class _Meter:
    """nerv MeanMetric/AverageMeter arithmetic (update(val, n))."""

    def __init__(self):
        self.sum, self.count = 0.0, 0

    def update(self, val, n):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def _ref_eval_accs(out, batch):
    """models/aloe.py:46-92 calc_eval_loss — question-level accuracies."""
    res = {}
    cls_logits = out["cls_answer_logits"]
    if cls_logits is None or len(cls_logits) == 0:
        res["descriptive"] = (0.0, 0)
    else:
        labels = batch["cls_label"].long()
        acc = (cls_logits.argmax(-1) == labels).float().mean().item()
        res["descriptive"] = (acc, labels.shape[0])
    mc_logits = out["mc_answer_logits"]
    if mc_logits is None or len(mc_logits) == 0:
        for k in ("multiple-choice", "explanatory", "predictive",
                  "counterfactual"):
            res[k] = (0.0, 0)
        return res
    mc_labels = batch["mc_label"]
    mc_preds = (mc_logits > 0.).type_as(mc_labels)
    correct = (mc_preds == mc_labels).float()
    mc_flag = batch["mc_flag"]
    n_q = int(mc_flag.max().item()) + 1
    corr_q = torch.tensor(
        [correct[mc_flag == i].all().item() for i in range(n_q)]).float()
    res["multiple-choice"] = (corr_q.mean().item(), n_q)
    subtypes = batch["mc_subtype"]
    for name, sid in (("explanatory", 1), ("predictive", 2),
                      ("counterfactual", 3)):
        m = subtypes == sid
        if m.any():
            res[name] = (corr_q[m].mean().item(), int(m.sum().item()))
        else:
            res[name] = (0.0, 0)
    return res


def main():
    slots = write_fixture()
    _install_vqa_stubs()

    sf_mod = gg._load(
        "refvqagold.sf", "slotformer/video_prediction/models/slotformer.py",
        os.path.join(gg.REF, "slotformer/video_prediction/models"))
    trans_stub = types.ModuleType("nerv.models.transformer")
    trans_stub.build_pos_enc = sf_mod.build_pos_enc
    trans_stub.build_transformer_encoder = \
        _make_build_transformer_encoder(sf_mod)
    sys.modules["nerv.models.transformer"] = trans_stub
    sys.modules["nerv.models"].transformer = trans_stub

    vqa_mod = gg._load(
        "refvqagold.transformer",
        "slotformer/clevrer_vqa/models/transformer.py",
        os.path.join(gg.REF, "slotformer/clevrer_vqa/models"))
    ds_mod = gg._load(
        "refvqagold.datasets.clevrer",
        "slotformer/clevrer_vqa/datasets/clevrer.py",
        os.path.join(gg.REF, "slotformer/clevrer_vqa/datasets"))

    class FixtureDataset(ds_mod.CLEVRERSlotsVQADataset):
        _fns = None  # set per split before instantiation

        def get_files(self):
            return {fn: os.path.join("/fixture", fn) for fn in self._fns}

    def make_set(split):
        FixtureDataset._fns = sorted(slots[split].keys())
        return FixtureDataset(
            data_root=FIXTURE,
            video_slots=slots[split],
            vocab_file=os.path.join(FIXTURE, "vocab.json"),
            clevrer_transforms=None,
            split=split,
            max_n_objects=2,
            video_len=4,
            n_sample_frames=4,
            max_question_len=6,
            max_choice_len=4,
            shuffle_obj=False,
        )

    torch.manual_seed(31)
    model = vqa_mod.CLEVRERTransformerModel(
        transformer_dict=dict(
            input_len=4 * 3 + 10, input_dim=16, pos_enc="learnable",
            num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
            cls_mlp_size=16,
        ),
        lang_dict=dict(
            question_len=6,
            question_vocab_size=len(make_set("val").q_vocab),
            answer_vocab_size=len(make_set("val").answer2label),
        ),
        vision_dict=dict(vision_dim=16),
        loss_dict=dict(use_mask_obj_loss=False),
    ).eval()
    with torch.no_grad():
        # CLS and the learnable PE are zero-init; randomize so the golden
        # exercises their conversion paths
        model.CLS.normal_(std=0.5)
        model.transformer_encoder.pos_enc.normal_(std=0.5)

    margins = []

    def run_split(split):
        ds = make_set(split)
        loader = DataLoader(ds, batch_size=5, shuffle=False, num_workers=0,
                            collate_fn=ds_mod.clevrer_collate_fn)
        outs = []
        for batch in loader:
            with torch.no_grad():
                out = model(batch)
            if out["cls_answer_logits"] is not None and \
                    len(out["cls_answer_logits"]):
                top2 = out["cls_answer_logits"].topk(2, -1).values
                margins.append(float((top2[:, 0] - top2[:, 1]).min()))
            if out["mc_answer_logits"] is not None and \
                    len(out["mc_answer_logits"]):
                margins.append(float(out["mc_answer_logits"].abs().min()))
            outs.append((batch, out))
        return ds, outs

    # ---- test split: the test_clevrer_vqa.py submission grouping (:31-91)
    test_set, test_outs = run_split("test")
    label2answer = test_set.label2answer
    results = [{"scene_index": i + 15000, "questions": []}
               for i in range(5000)]
    for batch, out in test_outs:
        scene_index = batch["scene_index"].numpy().astype(np.int32)
        question_id = batch["question_id"].numpy().astype(np.int32)
        mc_choice_id = batch["mc_choice_id"].numpy().astype(np.int32)
        mc_flag = batch["mc_flag"].numpy().astype(np.int32)
        cls_logits = out["cls_answer_logits"]
        num_cls = 0 if cls_logits is None else len(cls_logits)
        if num_cls:
            cls_answer = cls_logits.argmax(-1).numpy()
        mc_logits = out["mc_answer_logits"]
        num_mc = 0
        if mc_logits is not None and len(mc_logits):
            mc_answer = (mc_logits > 0.).numpy()
            num_mc = int(mc_flag.max()) + 1
        for i in range(num_cls):
            res_idx = scene_index[i] - 15000
            results[res_idx]["questions"].append({
                "question_id": int(question_id[i]),
                "answer": str(label2answer[int(cls_answer[i])]),
            })
        for i in range(num_mc):
            idx = i + num_cls
            res_idx = scene_index[idx] - 15000
            q_id = question_id[idx]
            ans = mc_answer[mc_flag == i]
            choice_id = mc_choice_id[mc_flag == i]
            choice_lst = [{
                "choice_id": int(choice_id[j]),
                "answer": "correct" if ans[j] else "wrong",
            } for j in range(len(choice_id))]
            q_list = results[res_idx]["questions"]
            flag = None
            for j, lst in enumerate(q_list):
                if lst["question_id"] == q_id:
                    flag = j
                    break
            if flag is None:
                q_list.append({"question_id": int(q_id),
                               "choices": choice_lst})
            else:
                q_list[flag]["choices"] += choice_lst

    # ---- val split: per-batch MeanMetric weighting (method.py:98-112)
    _, val_outs = run_split("val")
    meters = {k: _Meter() for k in (
        "descriptive", "multiple-choice", "explanatory", "predictive",
        "counterfactual")}
    for batch, out in val_outs:
        for k, (acc, bs) in _ref_eval_accs(out, batch).items():
            if bs > 0:
                meters[k].update(acc, bs)

    min_margin = min(margins)
    assert min_margin > 2e-3, (
        f"decision margin {min_margin} too small for a stable cross-"
        "framework prediction golden — reseed the model/fixture")

    store = {"clevrer_json": np.str_(json.dumps(results, sort_keys=True)),
             "min_margin": np.float64(min_margin)}
    for k, m in meters.items():
        store[f"metric/{k}_acc"] = np.float64(m.avg)
        store[f"metric/{k}_n"] = np.int64(m.count)
    for k, v in model.state_dict().items():
        # real reference ckpts are CLEVRERAloe (wrapper) state dicts
        store[f"sd/transformer_model.{k}"] = v.detach().numpy().copy()

    out_path = os.path.join(HERE, "vqa_golden.npz")
    np.savez_compressed(out_path, **store)
    print(f"wrote {out_path} (min decision margin {min_margin:.4f})")
    for k in meters:
        print(f"  {k}_acc: {store[f'metric/{k}_acc']:.6f} "
              f"(n={store[f'metric/{k}_n']})")


if __name__ == "__main__":
    main()
