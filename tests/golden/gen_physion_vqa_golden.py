#!/usr/bin/env python
"""Generate the end-to-end Physion VQA readout pipeline parity golden.

Runs the REFERENCE's own Physion readout evaluation flow in torch on a
committed fixture:

  * dataset: PhysionSlotsLabelDataset
    (/root/reference/slotformer/base_slots/datasets/physion.py:256-378) —
    task-keyed split JSON indexing, pandas label-CSV lookup incl. the
    ``-redyellow`` key rewrite, bad-stimuli filtering, whole-video slots;
  * model: seeded PhysionReadout relation network
    (physion_vqa/models/readout.py:11-109);
  * sweep: the test_physion_vqa.py flow (:17-91) — sigmoid > threshold
    accuracy + per-task accuracy for every (checkpoint, threshold) pair,
    best pair by accuracy (thresh-major argmax as in :105-121).

Records two seeded torch state_dicts and the full sweep into
``physion_vqa_golden.npz``. ``tests/test_physion_vqa_e2e_parity.py`` then
drives cli.convert_reference_ckpt + cli.test_physion_vqa on the same
fixture and asserts the whole sweep matches cell-for-cell.

The fixture deliberately places the one bad-stimuli video LAST in
iteration order: the reference keeps its stale pre-filter
``video_idx2task_idx`` map after filtering (physion.py:298-310) while we
re-key it (datasets/physion.py:222-236, an intentional bugfix) — with the
removed file last, both maps coincide and the parity stays exact while
the filter itself is still exercised.

nerv.utils.load_obj / read_all_lines are stubbed to serve the fixture's
split JSON + bad_stimuli.txt when the reference asks for its in-package
``splits/Physion`` paths (read-only tree); all dataset/model logic is the
reference's own. ``.cuda()`` calls are elided (CPU-only env).

Run from the repo root:  python tests/golden/gen_physion_vqa_golden.py
(needs /root/reference checked out; the committed fixture/.npz do not)
"""

import csv
import json
import os
import pickle
import sys
import types

import numpy as np
import torch
from torch.utils.data import DataLoader

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

import gen_metrics_golden as gm  # noqa: E402  (torchvision/pycocotools stubs)
import gen_model_goldens as gg  # noqa: E402  (nerv stub + _load)

FIXTURE = os.path.join(HERE, "physion_fixture")
THRESHS = [0.4, 0.45, 0.5, 0.55, 0.6, 0.65]
VIDEO_LEN, N_SLOTS, SLOT_SIZE = 6, 6, 16
TASKS = ["Collide", "Drop", "Support"]


def write_fixture():
    os.makedirs(os.path.join(FIXTURE, "splits"), exist_ok=True)
    os.makedirs(os.path.join(FIXTURE, "PhysionTestMP4s"), exist_ok=True)

    split = {}
    for task in TASKS:
        split[task] = [
            f"PhysionTestMP4s/{task}/pilot_{task.lower()}_{i:04d}.mp4"
            for i in range(4)
        ]
    # one -redyellow stimulus (CSV key strips the suffix, slots key keeps it)
    split["Collide"][2] = (
        "PhysionTestMP4s/Collide/pilot_collide_0002-redyellow.mp4")
    # the bad stimulus is the LAST file of the LAST task (see module doc)
    split["Support"][3] = (
        "PhysionTestMP4s/Support/pilot_support_badphys_0003.mp4")
    with open(os.path.join(FIXTURE, "splits", "test_test.json"), "w") as f:
        json.dump(split, f, indent=1)
    with open(os.path.join(FIXTURE, "splits", "bad_stimuli.txt"), "w") as f:
        f.write("pilot_support_badphys\n")

    rs = np.random.RandomState(77)
    labels_rows, slots = [], {}
    for task in TASKS:
        for fn in split[task]:
            base = os.path.basename(fn)[:-4]
            slots[base] = rs.randn(
                VIDEO_LEN, N_SLOTS, SLOT_SIZE).astype(np.float32)
            labels_rows.append(
                (base.replace("-redyellow", ""), bool(rs.randint(2))))
    with open(os.path.join(FIXTURE, "PhysionTestMP4s", "labels.csv"),
              "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "ground truth outcome"])
        for k, v in labels_rows:
            w.writerow([k, v])
    with open(os.path.join(FIXTURE, "test_slots.pkl"), "wb") as f:
        pickle.dump({"test": slots}, f)
    return slots


def _install_physion_stubs():
    gm._install_stubs()       # torchvision(+ops) for base_slots datasets
    gg._install_nerv_stub()   # nerv.training/models/utils

    # base_slots/datasets/utils.py also imports transforms + functional +
    # pycocotools at module level; BaseTransforms is never instantiated here
    tv = sys.modules["torchvision"]
    tr = types.ModuleType("torchvision.transforms")
    trf = types.ModuleType("torchvision.transforms.functional")
    tr.functional = trf
    tv.transforms = tr
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = trf
    pc = types.ModuleType("pycocotools")
    pcm = types.ModuleType("pycocotools.mask")
    pc.mask = pcm
    sys.modules["pycocotools"] = pc
    sys.modules["pycocotools.mask"] = pcm

    # physion.py resolves its split files inside its own (read-only)
    # package dir — serve the fixture copies through the nerv IO stubs
    u = sys.modules["nerv.utils"]
    from slotformer_tpu.runtime.io import load_obj, read_all_lines

    def load_obj_redirect(path):
        if "splits/Physion" in str(path).replace(os.sep, "/"):
            return load_obj(
                os.path.join(FIXTURE, "splits", os.path.basename(path)))
        return load_obj(path)

    def read_all_lines_redirect(path):
        if "splits/Physion" in str(path).replace(os.sep, "/"):
            path = os.path.join(FIXTURE, "splits", os.path.basename(path))
        return read_all_lines(path)

    u.load_obj = load_obj_redirect
    u.read_all_lines = read_all_lines_redirect


def _calc_acc(pred, gt, acc_thresh):
    """test_physion_vqa.py:17-19."""
    return ((pred > acc_thresh).astype(np.float32) == gt).\
        astype(np.float32).mean()


def main():
    slots = write_fixture()
    _install_physion_stubs()

    ds_mod = gg._load(
        "refphys.datasets.physion",
        "slotformer/base_slots/datasets/physion.py",
        os.path.join(gg.REF, "slotformer/base_slots/datasets"))
    ro_mod = gg._load(
        "refphys.models.readout",
        "slotformer/physion_vqa/models/readout.py",
        os.path.join(gg.REF, "slotformer/physion_vqa/models"))

    test_set = ds_mod.PhysionSlotsLabelDataset(
        data_root=FIXTURE,
        video_slots=slots,
        split="test",
        tasks=["all"],
        physion_transform=None,
        n_sample_frames=VIDEO_LEN,
        frame_offset=1,
        video_len=VIDEO_LEN,
        subset="test",
    )
    assert len(test_set) == 11, len(test_set)  # 12 videos - 1 bad stimulus

    loader = DataLoader(test_set, batch_size=4, shuffle=False,
                        num_workers=0, drop_last=False)

    readout_dict = dict(num_slots=N_SLOTS, slot_size=SLOT_SIZE,
                        agg_func="max", feats_dim=SLOT_SIZE)
    model = ro_mod.PhysionReadout(readout_dict=readout_dict).eval()

    def ref_test(weight_sd, acc_thresh):
        """test_physion_vqa.py test() (:22-50), minus .cuda()."""
        model.load_state_dict(weight_sd)
        all_pred, all_gt, all_task_idx = [], [], []
        for batch in loader:
            batch = {k: v.float() for k, v in batch.items()}
            with torch.no_grad():
                out = model(batch)
            task_idx = batch["task_idx"].flatten()
            pred = torch.sigmoid(out["logits"].flatten())
            gt = batch["label"].flatten().type_as(pred)
            all_pred.append(pred.numpy())
            all_gt.append(gt.numpy())
            all_task_idx.append(task_idx.numpy())
        all_pred = np.concatenate(all_pred)
        all_gt = np.concatenate(all_gt)
        all_task_idx = np.concatenate(all_task_idx)
        all_acc = _calc_acc(all_pred, all_gt, acc_thresh)
        task_acc = {}
        for i, task in enumerate(test_set.all_tasks):
            task_acc[task] = _calc_acc(all_pred[all_task_idx == i],
                                       all_gt[all_task_idx == i], acc_thresh)
        return all_acc, task_acc, all_pred

    # seed search: every sigmoid prob must be decisively off every
    # threshold so the prediction golden is stable across frameworks
    # (deterministic: first two qualifying seeds win)
    def _margin(sd):
        _, _, probs = ref_test(sd, 0.5)
        return min(float(np.abs(probs - t).min()) for t in THRESHS)

    sds, margins = {}, []
    for seed in range(41, 400):
        torch.manual_seed(seed)
        sd = ro_mod.PhysionReadout(readout_dict=readout_dict).state_dict()
        m = _margin(sd)
        if m > 5e-3:
            sds["a" if not sds else "b"] = sd
            margins.append(m)
            print(f"seed {seed}: margin {m:.4f} -> "
                  f"weight {'ab'[len(margins) - 1]}")
        if len(sds) == 2:
            break
    assert len(sds) == 2, "no qualifying seeds in range — widen the search"
    min_margin = min(margins)

    # the reference's full sweep (:105-121): thresh-major over weights
    store = {"min_margin": np.float64(min_margin)}
    sweep_accs = []
    for thresh in THRESHS:
        for wname in sorted(sds):
            acc, task_acc, _ = ref_test(sds[wname], thresh)
            sweep_accs.append(((wname, thresh), acc))
            store[f"sweep/{wname}/{thresh}/acc"] = np.float64(acc)
            for task, a in task_acc.items():
                store[f"sweep/{wname}/{thresh}/task/{task}"] = np.float64(a)

    # the best ACC is order-free; the selected (weight, thresh) pair is
    # not when accuracies tie (the reference argmaxes thresh-major,
    # test_physion_vqa.py:105-121; our CLI weight-major) — with 11
    # samples accuracies quantize to k/11 and ties are the norm, so the
    # parity contract is the full sweep cell-for-cell + the best value
    accs = np.array([a for _, a in sweep_accs])
    best_i = int(np.argmax(accs))
    (bw, bt), ba = sweep_accs[best_i]
    store["best/acc"] = np.float64(ba)

    for name, sd in sds.items():
        for k, v in sd.items():
            store[f"sd_{name}/{k}"] = v.detach().numpy().copy()
    store["all_tasks"] = np.array(test_set.all_tasks)

    out_path = os.path.join(HERE, "physion_vqa_golden.npz")
    np.savez_compressed(out_path, **store)
    print(f"wrote {out_path} (min margin {min_margin:.4f})")
    print(f"best: weight {bw} @ thresh {bt} -> acc {ba:.4f}")


if __name__ == "__main__":
    main()
