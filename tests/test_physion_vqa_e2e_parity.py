"""End-to-end converted-checkpoint Physion VQA readout pipeline parity.

``tests/golden/gen_physion_vqa_golden.py`` ran the REFERENCE's Physion
readout evaluation flow (PhysionSlotsLabelDataset with bad-stimuli
filtering and the ``-redyellow`` label-key rewrite + seeded PhysionReadout
+ the test_physion_vqa.py checkpoint x threshold sweep) on the committed
fixture and recorded two torch state_dicts + the full sweep. This test
drives OUR full CLI stack on the same fixture:

    reference .pth x2 -> cli.convert_reference_ckpt
      -> cli.test_physion_vqa --weight <dir>

and asserts every (checkpoint, threshold) cell — overall accuracy AND
per-task accuracy — matches, plus the best accuracy. The selected best
(weight, thresh) PAIR is not compared: accuracies quantize to k/11 on
the fixture so ties are the norm, and the reference argmaxes thresh-major
(test_physion_vqa.py:105-121) while our CLI sweeps weight-major."""

import os

import numpy as np
import pytest
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "physion_vqa_golden.npz")
CFG = os.path.join(HERE, "golden", "physion_vqa_cfg.py")
THRESHS = [0.4, 0.45, 0.5, 0.55, 0.6, 0.65]


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


def test_sweep_matches_reference_flow(gold, tmp_path, monkeypatch):
    import slotformer_tpu.datasets.physion as phys
    from slotformer_tpu.cli import convert_reference_ckpt, test_physion_vqa

    # our loader resolves split JSON + bad_stimuli from the in-repo split
    # dir; point it at the fixture's
    monkeypatch.setattr(
        phys, "_SPLIT_DIR",
        os.path.join(HERE, "golden", "physion_fixture", "splits"))

    wdir = tmp_path / "weights"
    wdir.mkdir()
    for name in ("a", "b"):
        sd = {k[len(f"sd_{name}/"):]: torch.from_numpy(gold[k])
              for k in gold.files if k.startswith(f"sd_{name}/")}
        assert "comb_idx" in sd  # the slot-pair buffer ships in real ckpts
        ref_pth = str(tmp_path / f"ref_{name}.pth")
        torch.save({"state_dict": sd}, ref_pth)
        convert_reference_ckpt.main([
            "--params", CFG, "--ref_ckpt", ref_pth,
            "--save_path", str(wdir / f"{name}.ckpt.pkl")])

    out = test_physion_vqa.main([
        "--params", CFG, "--weight", str(wdir), "--batch_size", "4"])

    all_tasks = [str(t) for t in gold["all_tasks"]]
    sweep = {(c["weight"].split(".")[0], c["thresh"]): c
             for c in out["sweep"]}
    assert len(sweep) == 2 * len(THRESHS)
    for wname in ("a", "b"):
        for thresh in THRESHS:
            cell = sweep[(wname, thresh)]
            np.testing.assert_allclose(
                cell["acc"], float(gold[f"sweep/{wname}/{thresh}/acc"]),
                rtol=1e-6, err_msg=f"{wname}@{thresh}")
            for task in all_tasks:
                np.testing.assert_allclose(
                    cell["task_acc"][task],
                    float(gold[f"sweep/{wname}/{thresh}/task/{task}"]),
                    rtol=1e-6, err_msg=f"{wname}@{thresh}/{task}")

    np.testing.assert_allclose(
        out["best"]["acc"], float(gold["best/acc"]), rtol=1e-6)
