"""PHYRE end-to-end test over a FAKE `phyre` simulator module.

The real pipeline needs the `phyre` C++ simulator (a pip package absent from
this environment) to render action videos on the fly. This test injects a
tiny deterministic stand-in into ``sys.modules`` that honors the API surface
our code touches — ``get_fold``, ``get_default_100k_cache``,
``initialize_simulator``, ``eval_setup_to_action_tier``,
``simulator.simulate_action`` — and then drives the real CLI stack:

    split regeneration (cache sampling) -> extract_phyre_slots (per-action
    npys, sharded + resumable) -> rollout_phyre_slots ->
    test_phyre_planning (sharded, merged with --collect, AUCCESS)

Reference flow: /root/reference/slotformer/base_slots/extract_phyre_slots.py,
video_prediction/rollout_phyre_slots.py,
phyre_planning/test_phyre_planning.py, docs/phyre.md.
"""

import os
import sys
import types

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from slotformer_tpu.runtime import save_checkpoint

RES = 16
S, D = 3, 16
VID_LEN = 6  # 1 burn-in + 5 rollout
SIM_FRAMES = 8
N_CACHE_ACTS = 50

TRAIN_TASKS = ["00000:000", "00001:000"]
DEV_TASKS = ["00002:000"]
TEST_TASKS = ["00003:000", "00004:000"]


def _status_of(action) -> int:
    """Deterministic status shared by the fake cache and fake simulator, so
    the dataset's simulated-label-vs-cached-label assert holds."""
    a0 = float(np.asarray(action).ravel()[0])
    return 1 if a0 >= 0.6 else (-1 if a0 >= 0.2 else 0)


class _FakeSim:
    def __init__(self, images, status):
        self.images = images
        self.status = status


class _FakeSimulator:
    def __init__(self, tasks):
        self.tasks = tasks

    def simulate_action(self, task_id, action, stride=60, need_images=True,
                        need_featurized_objects=False):
        a = np.asarray(action).ravel()
        imgs = np.zeros((SIM_FRAMES, 20, 20), np.int64)
        x0 = int(a[1] * 12) if len(a) > 1 else 4
        for t in range(SIM_FRAMES):
            x = (x0 + 2 * t) % 15
            imgs[t, 4:9, x : x + 5] = 1 + (task_id % 5)  # moving colored blob
            imgs[t, 14:17, 2:18] = 6  # static black floor
        return _FakeSim(imgs, _status_of(a))


class _FakeCache:
    def __init__(self):
        rng = np.random.default_rng(7)
        self.action_array = rng.random((N_CACHE_ACTS, 3))

    def get_sample(self, tasks, _):
        st = np.stack(
            [[_status_of(a) for a in self.action_array]] * len(tasks)
        ).astype(np.int64)
        return {"actions": self.action_array.copy(),
                "simulation_statuses": st}


def _fake_phyre_module():
    m = types.ModuleType("phyre")
    m.get_fold = lambda eval_setup, fold: (
        list(TRAIN_TASKS), list(DEV_TASKS), list(TEST_TASKS))
    m.get_default_100k_cache = lambda tier: _FakeCache()
    m.eval_setup_to_action_tier = lambda eval_setup: "ball"
    m.initialize_simulator = lambda tasks, tier: _FakeSimulator(tasks)
    return m


SAVI_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'StoSAVi'
    dataset = 'phyre'
    data_root = 'data/PHYRE'
    resolution = (16, 16)
    n_sample_frames = 6
    input_frames = 6
    fps = 1
    frame_offset = 1
    video_len = 6
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.004
    pos_ratio = 0.5
    reverse_color = True
    train_batch_size = 4
    val_batch_size = 4
    num_workers = 0
    slot_dict = dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                     num_iterations=2, kernel_mlp=False)
    enc_dict = dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4), dec_ks=3)
    pred_dict = dict(pred_type='mlp', pred_rnn=False, pred_norm_first=True)
    loss_dict = dict(use_post_recon_loss=True, kld_method='none')
    post_recon_loss_w = 1.0
    kld_loss_w = 0.0
"""

SF_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'SingleStepSlotFormer'
    dataset = 'phyre_slots'
    data_root = 'data/PHYRE'
    slots_root = {slots!r}
    resolution = (16, 16)
    fps = 1
    n_sample_frames = 6
    frame_offset = 1
    video_len = 6
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.004
    pos_ratio = 0.5
    reverse_color = True
    train_batch_size = 4
    val_batch_size = 4
    num_workers = 0
    slot_dict = dict(num_slots=3, slot_size=16)
    rollout_dict = dict(num_slots=3, slot_size=16, history_len=1, cond_len=6,
                        t_pe='sin', slots_pe='', d_model=16, num_layers=1,
                        num_heads=2, ffn_dim=32, norm_first=True)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4), dec_ks=3,
                    dec_ckp_path='')
    loss_dict = dict(rollout_len=5, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
"""

READOUT_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'PHYREReadout'
    dataset = 'phyre_rollout_slots'
    data_root = 'data/PHYRE'
    slot_root = {slots!r}
    resolution = (16, 16)
    fps = 1
    n_sample_frames = 6
    frame_offset = 1
    video_len = 6
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.004
    pos_ratio = 0.5
    reverse_color = True
    train_batch_size = 4
    val_batch_size = 4
    num_workers = 0
    readout_dict = dict(num_slots=3, slot_size=16, agg_func='max',
                        feats_dim=16, num_layers=2)
    vqa_loss_w = 1.0
"""


def test_phyre_pipeline_end_to_end(tmp_path, monkeypatch, capsys):
    import slotformer_tpu.cli.rollout_phyre_slots as RP
    import slotformer_tpu.datasets.phyre as P
    from slotformer_tpu.cli.extract_phyre_slots import main as extract_main
    from slotformer_tpu.cli.rollout_phyre_slots import main as rollout_main
    from slotformer_tpu.cli.test_phyre_planning import main as plan_main
    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    split_dir = str(tmp_path / "splits")
    os.makedirs(split_dir)
    monkeypatch.setattr(P, "_SPLIT_DIR", split_dir)
    monkeypatch.setattr(RP, "_SPLIT_DIR", split_dir)
    monkeypatch.setitem(sys.modules, "phyre", _fake_phyre_module())
    monkeypatch.chdir(tmp_path)
    rng = jax.random.PRNGKey(0)

    # ---- stage 0: split regeneration from the (fake) 100k cache
    savi_cfg = "savi_phyre_tiny.py"
    with open(savi_cfg, "w") as f:
        f.write(SAVI_CFG)
    savi_params = load_params(savi_cfg)
    from slotformer_tpu.datasets import build_dataset

    train_set, val_set = build_dataset(savi_params)
    # 3 train+dev tasks x (4 pos + 4 neg), 2 test tasks x (1 pos + 1 neg)
    assert train_set.video_info.shape == (24, 4)
    assert val_set.video_info.shape == (4, 4)
    assert set(train_set.act_labels.tolist()) == {0, 1}
    assert os.path.exists(os.path.join(
        split_dir, "within-fold_0-train-data_0.004-pos_0.5.npy"))
    # simulation-backed reads: label consistency assert inside get_video
    vid = train_set.get_video(0)
    assert vid["video"].shape == (VID_LEN, RES, RES, 3)
    item = train_set[0]
    assert item["img"].shape == (savi_params.n_sample_frames, RES, RES, 3)

    # ---- stage 1: sharded + resumable per-action slot extraction
    savi = build_model(savi_params)
    savi_vars = savi.init(
        {"params": rng, "sample": rng},
        {"img": np.zeros((1, 2, RES, RES, 3), np.float32)},
    )
    savi_ckp = "ckpts/savi_phyre_tiny/model.ckpt.pkl"
    save_checkpoint(savi_ckp, savi_vars["params"], step=0)
    for shard in (0, 1):  # two shards to exercise --split/--total_split
        extract_main([
            "--params", savi_cfg, "--weight", savi_ckp,
            "--save_path", "data/PHYRE", "--vid_len", str(VID_LEN),
            "--split", str(shard), "--total_split", "2", "--bs", "4",
        ])
    slot_dir = ("data/PHYRE/slots/savi_phyre_tiny/"
                "within-fold_0-{}-data_0.004-pos_0.5")
    assert len(os.listdir(slot_dir.format("train"))) == 24
    assert len(os.listdir(slot_dir.format("val"))) == 4
    s0 = np.load(os.path.join(slot_dir.format("train"), "000000.npy"))
    assert s0.shape == (VID_LEN, S, D) and s0.dtype == np.float32
    # shard 0 symlinked {split}_slots next to the weight
    assert os.path.islink("ckpts/savi_phyre_tiny/train_slots")

    # ---- stage 2: single-step rollout over every action file
    sf_cfg = "sf_phyre_tiny.py"
    with open(sf_cfg, "w") as f:
        f.write(SF_CFG.format(slots=slot_dir))
    sf_params = load_params(sf_cfg)
    sf = build_model(sf_params)
    sf_vars = sf.init(
        {"params": rng, "sample": rng},
        {"slots": np.zeros((1, VID_LEN, S, D), np.float32)},
    )
    sf_ckp = "ckpts/sf_phyre_tiny/model.ckpt.pkl"
    save_checkpoint(sf_ckp, sf_vars["params"], step=0)
    rollout_main([
        "--params", sf_cfg, "--weight", sf_ckp,
        "--save_path", "data/PHYRE", "--bs", "4",
    ])
    ro_dir = "data/PHYRE/rollout_slots/sf_phyre_tiny/within-fold_0-{}"
    assert len(os.listdir(ro_dir.format("train"))) == 24
    r0 = np.load(os.path.join(ro_dir.format("train"), "000000.npy"))
    assert r0.shape == (VID_LEN, S, D)
    np.testing.assert_array_equal(r0[0], s0[0])  # obs slot passes through
    assert os.path.islink("ckpts/sf_phyre_tiny/val_slots")

    # the readout dataset reads the rolled-out npys
    readout_cfg = "readout_phyre_tiny.py"
    with open(readout_cfg, "w") as f:
        f.write(READOUT_CFG.format(slots=ro_dir))
    ro_params = load_params(readout_cfg)
    ro_train, _ = build_dataset(ro_params)
    it = ro_train[0]
    assert it["slots"].shape == (VID_LEN, S, D) and it["label"] in (0, 1)

    # ---- stage 3: planning eval, sharded then merged, AUCCESS printed
    head = build_model(ro_params)
    head_vars = head.init(
        rng, {"slots": np.zeros((1, VID_LEN, S, D), np.float32)})
    head_ckp = "ckpts/readout_phyre_tiny/model.ckpt.pkl"
    save_checkpoint(head_ckp, head_vars["params"], step=0)
    common = [
        "--params", sf_cfg, "--weight", sf_ckp,
        "--task_cls_params", readout_cfg, "--task_cls_weight", head_ckp,
        "--savi_params", savi_cfg, "--savi_weight", savi_ckp,
        "--bs", "4", "--num_acts", "10",
    ]
    for shard in (0, 1):
        plan_main(common + ["--split", str(shard), "--total_split", "2"])
    test_dir = "ckpts/readout_phyre_tiny/test"
    assert os.path.exists(os.path.join(test_dir, "pred_conf-0.npy"))
    plan_main(["--collect", test_dir, "--total_split", "2"])
    out = capsys.readouterr().out
    assert "AUCCESS =" in out
    conf = np.load(os.path.join(test_dir, "all_conf.npy"))
    gt = np.load(os.path.join(test_dir, "all_gt.npy"))
    assert conf.shape == (len(TEST_TASKS), 10)
    # statuses came from the fake cache rule; invalid actions marked
    acts = _FakeCache().action_array[:10]
    np.testing.assert_array_equal(gt[0], [_status_of(a) for a in acts])
    valid = gt != 0
    assert (conf[valid] >= 0).all() and (conf[valid] <= 1).all()
    assert (conf[~valid] == -1).all()
