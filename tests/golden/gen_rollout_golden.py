#!/usr/bin/env python
"""Generate the end-to-end rollout-slots CLI parity golden.

Executes the REFERENCE's own slot-rollout flow — the verbatim
``rollout_video_slots`` function from
/root/reference/slotformer/video_prediction/rollout_clevrer_slots.py:19-66
(zero-pad to target length, per-offset phase rollouts via
``model.module.rollout_len`` mutation, phase re-interleaving) — in torch
on a committed input-slots fixture, using the SlotFormer weights already
pinned in ``testvp_golden.npz``. frame_offset=3 so all three interleaved
phase streams run.

Environment shims (the reference function is executed UNMODIFIED):
  * module globals OBS_FRAMES/TARGET_LEN are set to the fixture's 12/18
    (the script hardcodes CLEVRER's 128/160);
  * the module-global ``params`` (normally created by __main__) is
    injected;
  * ``torch.Tensor.cuda`` / ``torch.cuda.empty_cache`` are no-ops and
    ``torch.cuda.device_count`` returns 2 (CPU-only env; device_count is
    only used as the batch size);
  * the DataParallel wrapper is replaced by a minimal ``.module`` shim.

Writes ``rollout_slots_in.pkl`` (input, committed) and
``rollout_golden.npz`` (rolled-out slots per split/video).
``tests/test_rollout_e2e_parity.py`` then drives
cli.convert_reference_ckpt + cli.rollout_slots on the same config and
asserts the saved pickle matches per video: observed frames bit-exact,
rolled frames to float tolerance.

Run from the repo root:  python tests/golden/gen_rollout_golden.py
(needs /root/reference checked out; the committed fixture/.npz do not)
"""

import os
import pickle
import sys
import tempfile
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

import gen_model_goldens as gg  # noqa: E402  (nerv stub + _load)

OBS, TARGET = 12, 18
HIST, OFFSET = 4, 3
SLOTS_IN = os.path.join(HERE, "rollout_slots_in.pkl")


def write_fixture():
    rs = np.random.RandomState(55)
    slots = {
        split: {
            f"rollout_{split}_{i:05d}": rs.randn(OBS, 5, 16).astype(np.float32)
            for i in range(n)
        }
        for split, n in (("train", 2), ("val", 3), ("test", 2))
    }
    with open(SLOTS_IN, "wb") as f:
        pickle.dump(slots, f)
    return slots


class _DPShim(torch.nn.Module):
    """torch.nn.DataParallel stand-in: forward delegate + .module."""

    def __init__(self, module):
        super().__init__()
        self.module = module

    def forward(self, *a, **kw):
        return self.module(*a, **kw)


def main():
    slots = write_fixture()
    gg._install_nerv_stub()
    u = sys.modules["nerv.utils"]
    from slotformer_tpu.runtime.io import dump_obj, load_obj, mkdir_or_exist
    u.load_obj, u.dump_obj, u.mkdir_or_exist = load_obj, dump_obj, \
        mkdir_or_exist
    for name in ("slotformer", "slotformer.base_slots",
                 "slotformer.base_slots.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["slotformer.base_slots.models"].StoSAVi = object
    # rollout_clevrer_slots.py does `from models import build_model` and
    # imports tqdm/pdb; build_model is unused (we inject the model)
    models_stub = types.ModuleType("models")
    models_stub.build_model = None
    sys.modules["models"] = models_stub

    # SlotFormer needs the real StoSAVi for its decoder build
    savi_mod = gg._load(
        "refroll.savi", "slotformer/base_slots/models/savi.py",
        os.path.join(gg.REF, "slotformer/base_slots/models"))
    sys.modules["slotformer.base_slots.models"].StoSAVi = savi_mod.StoSAVi
    sf_mod = gg._load(
        "refroll.slotformer",
        "slotformer/video_prediction/models/slotformer.py",
        os.path.join(gg.REF, "slotformer/video_prediction/models"))
    ro_mod = gg._load(
        "refroll.rollout",
        "slotformer/video_prediction/rollout_clevrer_slots.py",
        os.path.join(gg.REF, "slotformer/video_prediction"))

    # ---- the testvp golden's SlotFormer weights (one pinned model for
    # both pipeline goldens)
    gold = np.load(os.path.join(HERE, "testvp_golden.npz"))
    sd = {k[3:]: torch.from_numpy(gold[k])
          for k in gold.files if k.startswith("sd/")}
    with tempfile.NamedTemporaryFile(suffix=".pth") as tf:
        # _build_decoder grafts decoder.* keys from a "SAVi" ckpt — the
        # SlotFormer sd shares those key names (slotformer.py:196-210)
        torch.save({"state_dict": sd}, tf.name)
        model = sf_mod.SlotFormer(
            resolution=(16, 16), clip_len=10,
            slot_dict=dict(num_slots=5, slot_size=16),
            dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4),
                          dec_ks=3, dec_norm='', dec_ckp_path=tf.name),
            rollout_dict=dict(num_slots=5, slot_size=16, history_len=HIST,
                              t_pe='sin', slots_pe='', d_model=16,
                              num_layers=2, num_heads=2, ffn_dim=32,
                              norm_first=True),
            loss_dict=dict(rollout_len=6, use_img_recon_loss=False),
        ).eval()
    model.load_state_dict(sd)

    # ---- environment shims (see module docstring)
    ro_mod.OBS_FRAMES = OBS
    ro_mod.TARGET_LEN = TARGET
    ro_mod.params = types.SimpleNamespace(
        input_frames=HIST, frame_offset=OFFSET, dataset="synthetic")
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.cuda.empty_cache = lambda: None
    torch.cuda.device_count = lambda: 2

    store = {}
    for split in ("train", "val", "test"):
        rolled = ro_mod.rollout_video_slots(_DPShim(model), slots[split])
        for fn, arr in rolled.items():
            assert arr.shape == (TARGET, 5, 16), arr.shape
            store[f"rolled/{split}/{fn}"] = np.asarray(arr, np.float32)

    out_path = os.path.join(HERE, "rollout_golden.npz")
    np.savez_compressed(out_path, **store)
    n = len(store)
    print(f"wrote {out_path} ({n} rolled videos, "
          f"offset={OFFSET}, {OBS}->{TARGET})")


if __name__ == "__main__":
    main()
