"""End-to-end converted-checkpoint CLEVRER VQA pipeline parity.

``tests/golden/gen_vqa_golden.py`` ran the REFERENCE's VQA evaluation flow
(CLEVRERSlotsVQADataset + clevrer_collate_fn + seeded torch
CLEVRERTransformerModel + the test_clevrer_vqa.py submission grouping and
the aloe.py question-level val accuracies) on the committed fixture and
recorded the torch state_dict + outputs. This test drives OUR full CLI
stack on the same config:

    reference .pth (CLEVRERAloe `transformer_model.` keys)
      -> cli.convert_reference_ckpt -> cli.test_clevrer_vqa

and asserts (a) the eval.ai CLEVRER.json submission is answer-for-answer
identical and (b) every question-level val accuracy (descriptive, MC
all-choices-correct, per-subtype) matches — covering the VQA seams the
module goldens do not: vocab-cache tokenization, row-based vs ragged
``mc_flag`` batching, the predictive rollout-tail shift, host-side
question regrouping, and the converted full Aloe checkpoint."""

import json
import os

import numpy as np
import pytest
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "vqa_golden.npz")
CFG = os.path.join(HERE, "golden", "vqa_cfg.py")

ACCS = ["descriptive", "multiple-choice", "explanatory", "predictive",
        "counterfactual"]


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


@pytest.fixture(scope="module")
def converted_ckpt(gold, tmp_path_factory):
    from slotformer_tpu.cli import convert_reference_ckpt

    tmp = tmp_path_factory.mktemp("vqa_ckpt")
    sd = {k[3:]: torch.from_numpy(gold[k])
          for k in gold.files if k.startswith("sd/")}
    assert all(k.startswith("transformer_model.") for k in sd), (
        "golden must exercise the real CLEVRERAloe wrapper key prefix")
    ref_pth = str(tmp / "ref_aloe.pth")
    torch.save({"state_dict": sd}, ref_pth)
    ckpt = str(tmp / "converted.ckpt.pkl")
    convert_reference_ckpt.main(
        ["--params", CFG, "--ref_ckpt", ref_pth, "--save_path", ckpt])
    return ckpt


def _normalize(results):
    """Order-insensitive submission form: scenes keyed by scene_index,
    questions sorted by question_id, choices by choice_id."""
    norm = {}
    for scene in results:
        qs = []
        for q in sorted(scene["questions"], key=lambda q: q["question_id"]):
            q = dict(q)
            if "choices" in q:
                q["choices"] = sorted(
                    q["choices"], key=lambda c: c["choice_id"])
            qs.append(q)
        norm[scene["scene_index"]] = qs
    return norm


def test_converted_ckpt_embedding_matches_reference_weights(
        gold, converted_ckpt):
    from slotformer_tpu.runtime import load_state_dict

    tree = load_state_dict(converted_ckpt)
    np.testing.assert_allclose(
        np.asarray(tree["transformer_model"]["q_embedding"]["embedding"]),
        gold["sd/transformer_model.q_embedding.weight"], atol=1e-7)


def test_submission_matches_reference_flow(gold, converted_ckpt, tmp_path):
    from slotformer_tpu.cli import test_clevrer_vqa

    save = str(tmp_path / "CLEVRER.json")
    ours = test_clevrer_vqa.main([
        "--params", CFG, "--weight", converted_ckpt, "--split", "test",
        "--batch_size", "8", "--save_path", save])
    assert os.path.isfile(save)
    ref = json.loads(str(gold["clevrer_json"]))
    assert len(ours) == len(ref) == 5000
    ours_n, ref_n = _normalize(ours), _normalize(ref)
    # the three fixture scenes answer-for-answer; all others empty
    n_filled = 0
    for scene_index, ref_qs in ref_n.items():
        assert ours_n[scene_index] == ref_qs, f"scene {scene_index}"
        n_filled += bool(ref_qs)
    assert n_filled == 3


def test_val_question_metrics_match_reference_flow(gold, converted_ckpt):
    from slotformer_tpu.cli import test_clevrer_vqa

    metrics = test_clevrer_vqa.main([
        "--params", CFG, "--weight", converted_ckpt, "--split", "val",
        "--batch_size", "8"])
    for q in ACCS:
        assert metrics[f"{q}_n"] == int(gold[f"metric/{q}_n"]), q
        np.testing.assert_allclose(
            metrics[f"{q}_acc"], float(gold[f"metric/{q}_acc"]),
            rtol=1e-6, atol=1e-9, err_msg=q)
