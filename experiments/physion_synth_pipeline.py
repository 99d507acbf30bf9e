"""On-hardware Physion pipeline over a synthetic contact-prediction dataset.

Closes the last downstream branch without on-chip evidence: round 2 ran the
STEVE family on the generic synthetic dataset (dVAE -> STEVE ->
STEVESlotFormer -> rollout), but the *Physion* branch proper — the Physion
dataset classes, the `video2frames -> tokenize_images -> extract (3
subsets) -> rollout --task physion -> PhysionReadout -> test_physion_vqa`
CLI chain (reference physion_vqa/*, docs/physion.md) — had only the on-disk
fixture test. This drives it end to end on the TPU with real training on a
learnable task.

Data: a miniature Physion-style tree (same layout the reference documents:
PhysionTrainMP4s/<task>/*.mp4 + split JSONs + label CSVs). Two scenarios
with OCP-style "will the red agent touch the green target?" labels, decided
by simple constant-velocity physics that resolve AFTER the observed prefix,
so the readout must read the ROLLED-OUT slots, mirroring the real Physion
protocol (reference rollout_physion_slots.py:18 — 45 obs of 150 frames;
here 8 of 24):

  * Drop: red ball falls from the top at column rx; green target sits on
    the floor at gx. Contact iff |rx - gx| is small; on contact the red
    ball rests ON the target, else it lands on the floor beside it.
  * Roll: red ball rolls in from the left at speed v; contact iff it
    reaches the target before the video ends (v and gx jointly decide).

Stages (resumable — each skipped when its artifact exists):
  0. mp4 tree + splits + label CSVs        (train 150, readout 60, test 40)
  1. video2frames                          (jpg frame dirs)
  2. dVAE training + tokenize_images       (vocab 256, 16x16 tokens)
  3. STEVE training (frozen dVAE, dual LR) + extract 3 subsets
  4. STEVESlotFormer training + rollout readout/test (8 obs -> 24)
  5. PhysionReadout training on rolled-out readout slots
  6. test_physion_vqa threshold sweep on rolled-out test slots

Run:  python experiments/physion_synth_pipeline.py
Artifacts + logs under experiments/out_physion_synth/.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.environ.get("PHYSION_OUT",
                     os.path.join(REPO, "experiments", "out_physion_synth"))

import json

import numpy as np

_SMOKE = os.environ.get("PHYSION_SMOKE", "") == "1"  # tiny CPU plumbing run

RES = 32 if _SMOKE else 64
VIDEO_LEN = 24
OBS = 8          # observed frames for rollout (Physion ratio 45/150 ~ 1/3)
S, D = (3, 32) if _SMOKE else (6, 128)   # slots
FPS = 8
_EPOCH_SCALE = 0.02 if _SMOKE else 1.0

N_TRAIN, N_TRAIN_VAL = (6, 2) if _SMOKE else (130, 20)
N_RO_TRAIN, N_RO_VAL = (4, 2) if _SMOKE else (40, 20)
N_TEST = 4 if _SMOKE else 40

FLOOR = 0.88     # floor line (fraction of height)
R_BALL = 0.09    # ball radius (fraction)


def _draw(frame, seg, yy, xx, cy, cx, r, color, oid, square=False):
    if square:
        m = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
    else:
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    frame[m] = color
    seg[m] = oid


def _render(seed, scenario):
    """Returns (video [T,H,W,3] uint8, label bool)."""
    rng = np.random.default_rng(seed)
    yy, xx = (np.mgrid[0:RES, 0:RES].astype(np.float32) + 0.5) / RES
    gx = rng.uniform(0.55, 0.8)
    contact = bool(rng.integers(2))
    if scenario == "Drop":
        if contact:
            rx = gx + rng.uniform(-0.06, 0.06)
        else:
            off = rng.choice([-1, 1]) * rng.uniform(0.22, 0.38)
            if not 0.12 <= gx + off <= 0.92:
                off = -off  # clipping would land inside the contact radius
            rx = gx + off
        rx = float(np.clip(rx, 0.12, 0.92))
        ry, vy = 0.12, rng.uniform(0.042, 0.052)
        vx = 0.0
    else:  # Roll
        ry, rx = FLOOR - R_BALL, rng.uniform(0.06, 0.12)
        # fast enough to reach gx before T iff contact
        need = (gx - rx - 2 * R_BALL) / (VIDEO_LEN - 2)
        vx = need * (rng.uniform(1.25, 1.6) if contact
                     else rng.uniform(0.45, 0.7))
        vy = 0.0
    # static distractor block in the upper-left area, away from the action
    dx_, dy_ = rng.uniform(0.1, 0.35), rng.uniform(0.3, 0.5)
    g_y = FLOOR - R_BALL
    frames = []
    for _ in range(VIDEO_LEN):
        frame = np.zeros((RES, RES, 3), np.float32)
        seg = np.zeros((RES, RES), np.int64)
        frame[yy > FLOOR] = (0.25, 0.2, 0.2)  # floor
        _draw(frame, seg, yy, xx, dy_, dx_, 0.055, (0.6, 0.6, 0.65), 3,
              square=True)
        _draw(frame, seg, yy, xx, g_y, gx, R_BALL, (0.1, 0.9, 0.15), 2)
        _draw(frame, seg, yy, xx, ry, rx, R_BALL, (0.95, 0.1, 0.1), 1)
        frames.append((frame * 255).astype(np.uint8))
        # integrate; stop on contact with target or floor
        nry, nrx = ry + vy, rx + vx
        if (nry - g_y) ** 2 + (nrx - gx) ** 2 < (2 * R_BALL) ** 2:
            # rest touching the target
            d = np.array([nry - g_y, nrx - gx])
            d /= max(np.linalg.norm(d), 1e-6)
            nry, nrx = g_y + 2 * R_BALL * d[0], gx + 2 * R_BALL * d[1]
            vy = vx = 0.0
        if nry > FLOOR - R_BALL:
            nry, vy = FLOOR - R_BALL, 0.0
        ry, rx = nry, nrx
    touching = (ry - g_y) ** 2 + (rx - gx) ** 2 < (2.2 * R_BALL) ** 2
    return np.stack(frames), bool(touching)


def stage_data():
    from slotformer_tpu.runtime.io import save_video

    data = "data/Physion"
    # dedicated marker written LAST (after the label CSVs): resuming from a
    # crash between test_test.json and the CSVs must not skip this stage
    marker = os.path.join("splits", ".data_done")
    if os.path.exists(marker):
        return
    os.makedirs("splits", exist_ok=True)
    seed = [0]

    def _make(sub, n, csv_rows):
        """n videos alternating scenarios; returns {task: [relpath]}."""
        split = {}
        for i in range(n):
            seed[0] += 1
            task = "Drop" if i % 2 == 0 else "Roll"
            video, label = _render(seed[0], task)
            name = f"{task.lower()}_{seed[0]:04d}"
            rel = f"{sub}/{task}/{name}.mp4"
            save_video(video, os.path.join(data, rel), fps=FPS)
            split.setdefault(task, []).append(rel)
            if csv_rows is not None:
                csv_rows.append(f"{name},{label}")
        return split

    t0 = time.perf_counter()
    json.dump(_make("PhysionTrainMP4s", N_TRAIN, None),
              open("splits/training_train.json", "w"))
    json.dump(_make("PhysionTrainMP4s", N_TRAIN_VAL, None),
              open("splits/training_val.json", "w"))
    ro_rows = ["stimulus_name,ground truth outcome"]
    json.dump(_make("PhysionTrainMP4s", N_RO_TRAIN, ro_rows),
              open("splits/readout_train.json", "w"))
    json.dump(_make("PhysionTrainMP4s", N_RO_VAL, ro_rows),
              open("splits/readout_val.json", "w"))
    te_rows = ["stimulus_name,ground truth outcome"]
    json.dump(_make("PhysionTestMP4s", N_TEST, te_rows),
              open("splits/test_test.json", "w"))
    open("splits/bad_stimuli.txt", "w").write("")
    open(f"{data}/PhysionTrainMP4s/readout_labels.csv", "w").write(
        "\n".join(ro_rows) + "\n")
    open(f"{data}/PhysionTestMP4s/labels.csv", "w").write(
        "\n".join(te_rows) + "\n")
    n_pos = sum(r.endswith("True") for r in ro_rows + te_rows)
    print(f"[data] {N_TRAIN + N_TRAIN_VAL + N_RO_TRAIN + N_RO_VAL + N_TEST} "
          f"videos in {time.perf_counter() - t0:.1f}s "
          f"({n_pos} contact-positive of {len(ro_rows) + len(te_rows) - 2} "
          "labeled)", flush=True)
    open(marker, "w").write("done\n")


DVAE_CFG = f"""
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'dVAE'
    dataset = 'physion_training'
    data_root = 'data/Physion'
    tasks = ['all']
    resolution = ({RES}, {RES})
    n_sample_frames = 1
    input_frames = 1
    frame_offset = 1
    video_len = {VIDEO_LEN}
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64
    vocab_size = 256
    down_factor = 4
    init_tau = 1.0
    final_tau = 0.1
    tau_decay_pct = 0.3
    optimizer = 'Adam'
    lr = 3e-4
    warmup_steps_pct = 0.05
    max_epochs = {max(1, int(40 * _EPOCH_SCALE))}
    save_interval = 2.0
    eval_interval = 10
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
"""

STEVE_CFG = f"""
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'STEVE'
    dataset = 'physion_training'
    data_root = 'data/Physion'
    tasks = ['all']
    resolution = ({RES}, {RES})
    n_sample_frames = 6
    input_frames = 6
    frame_offset = 1
    video_len = {VIDEO_LEN}
    num_workers = 8
    train_batch_size = 16
    val_batch_size = 16
    slot_dict = dict(num_slots={S}, slot_size={D}, slot_mlp_size={D * 2},
                     num_iterations=2)
    enc_dict = dict(enc_channels=(3, 64, 64, 64, 64), enc_ks=5,
                    enc_out_channels={D}, enc_norm='')
    dvae_dict = dict(down_factor=4, vocab_size=256,
                     dvae_ckp_path='ckpts/dvae_physion_synth/latest.ckpt.pkl')
    dec_dict = dict(dec_num_layers=4, dec_num_heads=4, dec_d_model={D})
    pred_dict = dict(pred_type='transformer', pred_rnn=True,
                     pred_norm_first=True, pred_num_layers=1,
                     pred_num_heads=4, pred_ffn_dim={D * 4},
                     pred_sg_every=None)
    loss_dict = dict(use_img_recon_loss=False)
    token_recon_loss_w = 1.0
    optimizer = 'Adam'
    lr = 1e-4
    dec_lr = 3e-4
    dec_lr_prefixes = ('trans_decoder',)
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    max_epochs = {max(1, int(110 * _EPOCH_SCALE))}
    save_interval = 2.0
    eval_interval = 20
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
"""

SSF_CFG = f"""
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'STEVESlotFormer'
    dataset = 'physion_slots_training'
    data_root = 'data/Physion'
    slots_root = 'data/Physion/training_slots.pkl'
    tasks = ['all']
    resolution = ({RES}, {RES})
    n_sample_frames = 12
    input_frames = 6
    frame_offset = 1
    video_len = {VIDEO_LEN}
    num_workers = 8
    train_batch_size = 32
    val_batch_size = 32
    slot_dict = dict(num_slots={S}, slot_size={D})
    dvae_dict = dict(down_factor=4, vocab_size=256,
                     dvae_ckp_path='ckpts/dvae_physion_synth/latest.ckpt.pkl')
    dec_dict = dict(dec_num_layers=4, dec_num_heads=4, dec_d_model={D})
    rollout_dict = dict(num_slots={S}, slot_size={D}, history_len=6,
                        t_pe='sin', slots_pe='', d_model=256, num_layers=4,
                        num_heads=8, ffn_dim=1024, norm_first=True)
    loss_dict = dict(rollout_len=6, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
    optimizer = 'Adam'
    lr = 2e-4
    warmup_steps_pct = 0.05
    max_epochs = {max(1, int(250 * _EPOCH_SCALE))}
    save_interval = 5.0
    eval_interval = 50
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
"""

READOUT_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'PhysionReadout'
    dataset = 'physion_slots_label_readout'
    data_root = 'data/Physion'
    slots_root = {slots!r}
    tasks = ['all']
    resolution = (%d, %d)
    n_sample_frames = %d
    frame_offset = 1
    video_len = %d
    num_workers = 8
    train_batch_size = 16
    val_batch_size = 16
    readout_dict = dict(num_slots=%d, slot_size=%d, agg_func='max',
                        feats_dim=%d)
    vqa_loss_w = 1.0
    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    max_epochs = %d
    save_interval = 10.0
    eval_interval = 50
    print_iter = 50
    n_samples = 0
    max_rss_gb = 110
""" % (RES, RES, VIDEO_LEN, VIDEO_LEN, S, D, D,
       max(1, int(300 * _EPOCH_SCALE)))


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def _train(cfg, ckp_dir):
    from slotformer_tpu.cli.train import main as train_main

    t0 = time.perf_counter()
    train_main(["--params", cfg, "--ckp_path", ckp_dir,
                "--san_check_val_step", "1"])
    print(f"[timing] {cfg} trained in {time.perf_counter() - t0:.1f}s",
          flush=True)


def main():
    os.makedirs(OUT, exist_ok=True)
    os.chdir(OUT)
    import slotformer_tpu.datasets.physion as P

    P._SPLIT_DIR = os.path.join(OUT, "splits")

    from slotformer_tpu.cli.extract_slots import main as extract_main
    from slotformer_tpu.cli.rollout_slots import main as rollout_main
    from slotformer_tpu.cli.test_physion_vqa import main as vqa_main
    from slotformer_tpu.cli.tokenize_images import main as tokenize_main
    from slotformer_tpu.cli.video2frames import main as v2f_main

    data = "data/Physion"
    stage_data()

    # ---- stage 1: frames
    if not os.path.isdir(f"{data}/PhysionTrainMP4s/Drop"):
        raise RuntimeError("data stage failed")
    probe = json.load(open("splits/training_train.json"))["Drop"][0]
    if not os.path.isdir(os.path.join(data, probe[:-4])):
        t0 = time.perf_counter()
        v2f_main(["--data_root", data, "--resize", str(RES), "--workers", "8"])
        print(f"[timing] video2frames {time.perf_counter() - t0:.1f}s",
              flush=True)

    # ---- stage 2: dVAE + tokens
    dvae_cfg = "dvae_physion_synth.py"
    _write(dvae_cfg, DVAE_CFG)
    dvae_ckp = "ckpts/dvae_physion_synth/latest.ckpt.pkl"
    if not os.path.exists(dvae_ckp):
        _train(dvae_cfg, "ckpts/dvae_physion_synth")
    if not os.path.isdir(f"{data}/PhysionTrainNpys-dvae_physion_synth"):
        t0 = time.perf_counter()
        tokenize_main(["--params", dvae_cfg, "--weight", dvae_ckp,
                       "--batch_size", "64"])
        print(f"[timing] tokenize {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- stage 3: STEVE + 3-subset extraction
    steve_cfg = "steve_physion_synth.py"
    _write(steve_cfg, STEVE_CFG)
    steve_ckp = "ckpts/steve_physion_synth/latest.ckpt.pkl"
    if not os.path.exists(steve_ckp):
        _train(steve_cfg, "ckpts/steve_physion_synth")
    for subset in ("training", "readout", "test"):
        if not os.path.exists(f"{data}/{subset}_slots.pkl"):
            t0 = time.perf_counter()
            extract_main([
                "--params", steve_cfg, "--weight", steve_ckp,
                "--save_path", f"{data}/{subset}_slots.pkl",
                "--batch_size", "8", "--chunk_len", str(VIDEO_LEN),
                "--subset", subset,
            ])
            print(f"[timing] extract {subset} {time.perf_counter() - t0:.1f}s",
                  flush=True)

    # ---- stage 4: STEVESlotFormer + physion rollout (OBS -> VIDEO_LEN)
    ssf_cfg = "ssf_physion_synth.py"
    _write(ssf_cfg, SSF_CFG)
    ssf_ckp = "ckpts/ssf_physion_synth/latest.ckpt.pkl"
    if not os.path.exists(ssf_ckp):
        _train(ssf_cfg, "ckpts/ssf_physion_synth")
    for subset in ("readout", "test"):
        if not os.path.exists(f"{data}/rollout_{subset}_slots.pkl"):
            t0 = time.perf_counter()
            rollout_main([
                "--task", "physion", "--subset", subset,
                "--params", ssf_cfg, "--weight", ssf_ckp,
                "--save_path", f"{data}/rollout_{subset}_slots.pkl",
                "--batch_size", "16", "--obs_frames", str(OBS),
            ])
            print(f"[timing] rollout {subset} "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)

    # ---- stage 5: readout head on rolled-out readout slots
    ro_cfg = "readout_physion_synth.py"
    _write(ro_cfg, READOUT_CFG.format(
        slots=os.path.abspath("ckpts/ssf_physion_synth/readout_slots.pkl")))
    ro_ckp = "ckpts/readout_physion_synth/latest.ckpt.pkl"
    if not os.path.exists(ro_ckp):
        _train(ro_cfg, "ckpts/readout_physion_synth")

    # ---- stage 6: threshold-sweep eval on rolled-out TEST slots
    t0 = time.perf_counter()
    vqa_main(["--params", ro_cfg, "--weight", ro_ckp,
              "--batch_size", "16",
              "--threshs", "0.3", "0.4", "0.5", "0.6", "0.7"])
    print(f"[timing] test_physion_vqa {time.perf_counter() - t0:.1f}s",
          flush=True)
    print("PIPELINE DONE", flush=True)


if __name__ == "__main__":
    main()
