"""Physion-format end-to-end test over REAL on-disk fixtures.

Synthesizes a miniature Physion tree — mp4 videos under
``PhysionTrainMP4s/<task>/`` + ``PhysionTestMP4s/<task>/``, label CSVs, and
mini split JSONs — then drives the actual CLI stack over the *Physion
dataset classes*:

    video2frames -> tokenize_images -> extract_slots (training/readout/test
    subsets) -> rollout_slots --task physion (readout + test) ->
    test_physion_vqa

exercising frame extraction, the TrainMP4s->TrainNpys-$dvae token-path
rewrite, subset-keyed slot symlinks, bad-stimuli filtering, the
``-redyellow`` / ``_img`` label-key normalizations, and the threshold-sweep
readout eval — all with files on disk (reference layout:
/root/reference/slotformer/base_slots/datasets/physion.py,
extract_slots.py:138-156, rollout_physion_slots.py:86-122, docs/physion.md).
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from slotformer_tpu.runtime import load_obj, save_checkpoint
from slotformer_tpu.runtime.io import save_video

VIDEO_LEN = 16
RES = 16
S, D = 3, 16  # slots
OBS = 4  # observed frames for rollout

TRAIN_VIDEOS = {
    "Collide": ["vid_a", "vid_b"],
    "Roll": ["vid_c"],
}
READOUT_VIDEOS = {"Collide": ["ro_a"], "Roll": ["ro_b_img"]}
TEST_VIDEOS = {"Collide": ["t_a", "t_bad"], "Roll": ["t_b-redyellow"]}


def _write_video(path: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    y = int(rng.integers(2, 20))
    frames = []
    for t in range(VIDEO_LEN):
        img = np.zeros((32, 32, 3), np.uint8)
        x = (2 + 2 * t) % 24
        img[y : y + 8, x : x + 8] = (255, 40, 40)
        img[4:10, (28 - t) % 24 : (28 - t) % 24 + 6] = (40, 255, 40)
        frames.append(img)
    save_video(np.stack(frames), path, fps=8)


@pytest.fixture(scope="module")
def physion_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("physion_fixture")
    data = root / "data" / "Physion"
    seed = 0
    for sub, groups in (
        ("PhysionTrainMP4s", TRAIN_VIDEOS),
        ("PhysionTrainMP4s", READOUT_VIDEOS),
        ("PhysionTestMP4s", TEST_VIDEOS),
    ):
        for task, names in groups.items():
            for name in names:
                seed += 1
                _write_video(str(data / sub / task / f"{name}.mp4"), seed)

    def _split(groups, sub):
        return {t: [f"{sub}/{t}/{n}.mp4" for n in ns] for t, ns in groups.items()}

    splits = root / "splits"
    os.makedirs(splits)
    json.dump(
        {"Collide": ["PhysionTrainMP4s/Collide/vid_a.mp4"],
         "Roll": ["PhysionTrainMP4s/Roll/vid_c.mp4"]},
        open(splits / "training_train.json", "w"))
    json.dump({"Collide": ["PhysionTrainMP4s/Collide/vid_b.mp4"]},
              open(splits / "training_val.json", "w"))
    json.dump(_split({"Collide": ["ro_a"]}, "PhysionTrainMP4s"),
              open(splits / "readout_train.json", "w"))
    json.dump(_split({"Roll": ["ro_b_img"]}, "PhysionTrainMP4s"),
              open(splits / "readout_val.json", "w"))
    json.dump(_split(TEST_VIDEOS, "PhysionTestMP4s"),
              open(splits / "test_test.json", "w"))
    (splits / "bad_stimuli.txt").write_text("t_bad\n")

    with open(data / "PhysionTrainMP4s" / "readout_labels.csv", "w") as f:
        f.write("stimulus_name,ground truth outcome\nro_a,True\nro_b,False\n")
    with open(data / "PhysionTestMP4s" / "labels.csv", "w") as f:
        f.write("stimulus_name,ground truth outcome\n"
                "t_a,True\nt_b,False\nt_bad,True\n")
    return root


DVAE_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'dVAE'
    dataset = 'physion_training'
    data_root = 'data/Physion'
    tasks = ['all']
    resolution = (16, 16)
    n_sample_frames = 2
    input_frames = 2
    frame_offset = 1
    video_len = 16
    train_batch_size = 4
    val_batch_size = 4
    num_workers = 0
    vocab_size = 16
"""

STEVE_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'STEVE'
    dataset = 'physion_training'
    data_root = 'data/Physion'
    tasks = ['all']
    resolution = (16, 16)
    n_sample_frames = 2
    input_frames = 2
    frame_offset = 1
    video_len = 16
    train_batch_size = 4
    val_batch_size = 4
    num_workers = 0
    slot_dict = dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                     num_iterations=2)
    dvae_dict = dict(down_factor=4, vocab_size=16,
                     dvae_ckp_path='ckpts/dvae_tiny_params/model.ckpt.pkl')
    enc_dict = dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16)
    dec_dict = dict(dec_num_layers=1, dec_num_heads=2, dec_d_model=16)
    pred_dict = dict(pred_type='transformer', pred_rnn=True,
                     pred_norm_first=True, pred_num_layers=1,
                     pred_num_heads=2, pred_ffn_dim=32, pred_sg_every=None)
    loss_dict = dict(use_img_recon_loss=False)
    token_recon_loss_w = 1.0
"""

SF_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'STEVESlotFormer'
    dataset = 'physion_slots_training'
    data_root = 'data/Physion'
    slots_root = 'data/Physion/training_slots.pkl'
    tasks = ['all']
    resolution = (16, 16)
    n_sample_frames = 6
    input_frames = 4
    frame_offset = 1
    video_len = 16
    train_batch_size = 4
    val_batch_size = 4
    num_workers = 0
    slot_dict = dict(num_slots=3, slot_size=16)
    dvae_dict = dict(down_factor=4, vocab_size=16,
                     dvae_ckp_path='ckpts/dvae_tiny_params/model.ckpt.pkl')
    dec_dict = dict(dec_num_layers=1, dec_num_heads=2, dec_d_model=16)
    rollout_dict = dict(num_slots=3, slot_size=16, history_len=4, t_pe='sin',
                        d_model=16, num_layers=1, num_heads=2, ffn_dim=32)
    loss_dict = dict(rollout_len=2, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
"""

READOUT_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'PhysionReadout'
    dataset = 'physion_slots_label_readout'
    data_root = 'data/Physion'
    slots_root = {slots!r}
    tasks = ['all']
    resolution = (16, 16)
    n_sample_frames = 16
    frame_offset = 1
    video_len = 16
    train_batch_size = 2
    val_batch_size = 2
    num_workers = 0
    readout_dict = dict(num_slots=3, slot_size=16, agg_func='max',
                        feats_dim=16)
    vqa_loss_w = 1.0
"""


def test_physion_pipeline_end_to_end(physion_tree, monkeypatch, capsys):
    import slotformer_tpu.datasets.physion as P
    from slotformer_tpu.cli.extract_slots import main as extract_main
    from slotformer_tpu.cli.rollout_slots import main as rollout_main
    from slotformer_tpu.cli.test_physion_vqa import main as vqa_main
    from slotformer_tpu.cli.tokenize_images import main as tokenize_main
    from slotformer_tpu.cli.video2frames import main as v2f_main
    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    monkeypatch.setattr(P, "_SPLIT_DIR", str(physion_tree / "splits"))
    monkeypatch.chdir(physion_tree)
    data = "data/Physion"

    # ---- stage 0: mp4 -> jpg frame dirs
    v2f_main(["--data_root", data, "--resize", str(RES), "--workers", "2"])
    assert sorted(os.listdir(f"{data}/PhysionTrainMP4s/Collide/vid_a")) == [
        f"{i:06d}.jpg" for i in range(VIDEO_LEN)
    ]

    # ---- stage 1: dVAE ckpt (random init; plumbing, not quality) + tokens
    dvae_cfg = "dvae_tiny_params.py"
    with open(dvae_cfg, "w") as f:
        f.write(DVAE_CFG)
    dvae_params = load_params(dvae_cfg)
    dvae = build_model(dvae_params)
    rng = jax.random.PRNGKey(0)
    dvae_vars = dvae.init(
        {"params": rng, "sample": rng},
        {"img": np.zeros((1, RES, RES, 3), np.float32)},
    )
    dvae_ckp = "ckpts/dvae_tiny_params/model.ckpt.pkl"
    save_checkpoint(dvae_ckp, dvae_vars["params"], step=0)
    tokenize_main(["--params", dvae_cfg, "--weight", dvae_ckp,
                   "--batch_size", "8"])
    tok = np.load(
        f"{data}/PhysionTrainNpys-dvae_tiny_params/Collide/vid_a.npy"
    )
    assert tok.shape == (VIDEO_LEN, (RES // 4) ** 2)
    assert tok.dtype == np.int32 and tok.max() < 16

    # the STEVE dataset picks the tokens up through the path rewrite
    steve_cfg = "steve_tiny_params.py"
    with open(steve_cfg, "w") as f:
        f.write(STEVE_CFG)
    steve_params = load_params(steve_cfg)
    from slotformer_tpu.datasets import build_dataset

    train_set, _ = build_dataset(steve_params)
    item = train_set[0]
    assert "token_id" in item and item["token_id"].shape == (2, 16)

    # ---- stage 2: STEVE ckpt + subset-keyed slot extraction
    steve = build_model(steve_params)
    steve_vars = steve.init(
        {"params": rng, "sample": rng},
        {"img": np.zeros((1, 2, RES, RES, 3), np.float32)},
    )
    steve_ckp = "ckpts/steve_tiny_params/model.ckpt.pkl"
    save_checkpoint(steve_ckp, steve_vars["params"], step=0)
    for subset in ("training", "readout", "test"):
        extract_main([
            "--params", steve_cfg, "--weight", steve_ckp,
            "--save_path", f"{data}/{subset}_slots.pkl",
            "--batch_size", "2", "--chunk_len", "8", "--subset", subset,
        ])
        # subset-keyed symlink next to the STEVE weight (reference
        # extract_slots.py:87-89)
        assert os.path.islink(f"ckpts/steve_tiny_params/{subset}_slots.pkl")
    training = load_obj(f"{data}/training_slots.pkl")
    assert set(training) == {"train", "val"}
    assert set(training["train"]) == {"vid_a", "vid_c"}
    assert training["train"]["vid_a"].shape == (VIDEO_LEN, S, D)
    readout = load_obj(f"{data}/readout_slots.pkl")
    assert set(readout["train"]) == {"ro_a"} and set(readout["val"]) == {"ro_b_img"}
    test = load_obj(f"{data}/test_slots.pkl")
    assert set(test) == {"test"}
    assert set(test["test"]) == {"t_a", "t_bad", "t_b-redyellow"}

    # ---- stage 3: STEVESlotFormer ckpt + physion rollout (OBS -> VIDEO_LEN)
    sf_cfg = "sf_tiny_params.py"
    with open(sf_cfg, "w") as f:
        f.write(SF_CFG)
    sf_params = load_params(sf_cfg)
    sf = build_model(sf_params)
    sf_vars = sf.init(
        {"params": rng, "sample": rng},
        {"slots": np.zeros((1, 6, S, D), np.float32)},
    )
    sf_ckp = "ckpts/sf_tiny_params/model.ckpt.pkl"
    save_checkpoint(sf_ckp, sf_vars["params"], step=0)
    for subset in ("readout", "test"):
        rollout_main([
            "--task", "physion", "--subset", subset,
            "--params", sf_cfg, "--weight", sf_ckp,
            "--save_path", f"{data}/rollout_{subset}_slots.pkl",
            "--batch_size", "2", "--obs_frames", str(OBS),
        ])
        # rolled-out slots discoverable as {subset}_slots.pkl next to the
        # SlotFormer weight (reference rollout_physion_slots.py:95,121)
        link = f"ckpts/sf_tiny_params/{subset}_slots.pkl"
        assert os.path.islink(link)
    ro = load_obj(f"{data}/rollout_readout_slots.pkl")
    assert set(ro) == {"train", "val"}
    for split, names in (("train", {"ro_a"}), ("val", {"ro_b_img"})):
        assert set(ro[split]) == names
        for name, arr in ro[split].items():
            assert arr.shape == (VIDEO_LEN, S, D)
            np.testing.assert_array_equal(arr[:OBS], readout[split][name][:OBS])
    rt = load_obj(f"{data}/rollout_test_slots.pkl")
    assert set(rt) == {"test"} and len(rt["test"]) == 3

    # ---- stage 4: readout eval sweep over the rolled-out test slots
    readout_cfg = "readout_tiny_params.py"
    with open(readout_cfg, "w") as f:
        f.write(READOUT_CFG.format(
            slots=os.path.abspath("ckpts/sf_tiny_params/readout_slots.pkl")))
    ro_params = load_params(readout_cfg)
    head = build_model(ro_params)
    head_vars = head.init(
        rng, {"slots": np.zeros((1, VIDEO_LEN, S, D), np.float32)})
    head_ckp = "ckpts/readout_tiny_params/model.ckpt.pkl"
    save_checkpoint(head_ckp, head_vars["params"], step=0)
    vqa_main(["--params", readout_cfg, "--weight", head_ckp,
              "--batch_size", "2", "--threshs", "0.4", "0.5", "0.6"])
    out = capsys.readouterr().out
    # bad-stimuli filtering dropped t_bad from the 3 test videos
    assert "remove 1 files, now have 2" in out
    assert "All accuracy:" in out
    # per-task accuracies over the surviving {t_a (Collide), t_b (Roll)}
    assert "Collide:" in out and "Roll:" in out
