"""On-hardware PHYRE planning pipeline over a fake (but LEARNABLE) simulator.

VERDICT r2 next-round #5b: drive the PHYRE branch end to end on the TPU —
split regeneration -> SAVi training -> per-action slot extraction ->
SingleStepSlotFormer training -> rollout -> PHYREReadout training ->
test_phyre_planning AUCCESS — through the real CLI/trainer stack.

The real `phyre` C++ simulator is not installable in this environment
(VERDICT r2 missing #5), so a deterministic stand-in provides the same API
surface the code touches (tests/test_phyre_fixture_e2e.py pattern). Unlike
the test fixture, this simulator makes success VISUALLY LEARNABLE: a solved
action's ball falls onto the floor and settles; a failed action's ball
drifts upward and exits — so the trained readout's AUCCESS measures real
end-to-end signal, not chance.

Run:  python experiments/phyre_fake_pipeline.py
Artifacts + logs under experiments/out_phyre_fake/.
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.environ.get("PHYRE_OUT",
                     os.path.join(REPO, "experiments", "out_phyre_fake"))

import numpy as np

RES = 64
S, D = 5, 64
VID_LEN = 8  # 1 burn-in + 7 rollout
SIM_FRAMES = 11
N_CACHE_ACTS = 1000

# the dataset's split regeneration keeps only templates 00000..00024
# (datasets/phyre.py:150-152, reference parity) — stay within them and vary
# the per-template task instance, like the real "within" protocol
TRAIN_TASKS = ([f"{i:05d}:000" for i in range(20)]
               + [f"{i:05d}:001" for i in range(20)])
DEV_TASKS = [f"{i:05d}:002" for i in range(10)]
TEST_TASKS = [f"{i:05d}:003" for i in range(10)]


def _status_of(action) -> int:
    a = np.asarray(action).ravel()
    if a[2] < 0.05:
        return 0  # a few invalid actions, like the real cache
    # sparse solutions (~20%) so ranking quality shows up in AUCCESS:
    # with 50% solve density a RANDOM ranking already scores ~72 (the
    # round-3 first run), drowning the readout's contribution
    return 1 if a[0] >= 0.8 else -1


class _FakeSim:
    def __init__(self, images, status):
        self.images = images
        self.status = status


class _FakeSimulator:
    """Ball trajectory encodes the label: solved -> falls and settles on the
    floor; failed -> drifts up and out. Static per-task scenery from the
    task id. Colors follow the real PHYRE palette ids (1..6)."""

    def __init__(self, tasks):
        self.tasks = tasks

    def simulate_action(self, task_id, action, stride=60, need_images=True,
                        need_featurized_objects=False):
        a = np.asarray(action).ravel()
        status = _status_of(a)
        imgs = np.zeros((SIM_FRAMES, 20, 20), np.int64)
        x0 = int(a[1] * 14) + 1 if len(a) > 1 else 6
        r = 2
        task_seed = int(str(task_id).split(":")[0]) if isinstance(
            task_id, str) else int(task_id)
        wall_x = 2 + (task_seed % 3) * 7
        for t in range(SIM_FRAMES):
            imgs[t, 17:19, 1:19] = 6  # floor (black)
            imgs[t, 5:17, wall_x] = 3  # static per-task wall (blue)
            if status >= 0:  # solved (or invalid): fall to the floor
                y = min(3 + 2 * t, 15)
            else:  # failed: drift up
                y = 13 - 2 * t
            if 0 <= y < 19:
                imgs[t, max(y - r, 0):y + r, max(x0 - r, 1):x0 + r] = 1  # ball
        return _FakeSim(imgs, status)


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


COMMON = f"""
    dataset = 'phyre'
    data_root = 'data/PHYRE'
    resolution = ({RES}, {RES})
    fps = 1
    frame_offset = 1
    video_len = {VID_LEN}
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.01
    pos_ratio = 0.5
    reverse_color = True
    num_workers = 8
"""

SAVI_CFG = f"""
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'StoSAVi'
{COMMON}
    n_sample_frames = 6
    input_frames = 6
    train_batch_size = 32
    val_batch_size = 32
    slot_dict = dict(num_slots={S}, slot_size={D}, slot_mlp_size=128,
                     num_iterations=2, kernel_mlp=False)
    enc_dict = dict(enc_channels=(3, 32, 32, 32), enc_ks=5,
                    enc_out_channels={D})
    dec_dict = dict(dec_channels=({D}, 32, 32, 32), dec_resolution=(8, 8),
                    dec_ks=5)
    pred_dict = dict(pred_type='mlp', pred_rnn=False, pred_norm_first=True)
    loss_dict = dict(use_post_recon_loss=True, kld_method='none')
    post_recon_loss_w = 1.0
    kld_loss_w = 0.0
    optimizer = 'Adam'
    lr = 4e-4
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    max_epochs = 4
    save_interval = 1.0
    eval_interval = 2
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
"""

SF_CFG = f"""
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'SingleStepSlotFormer'
    dataset = 'phyre_slots'
    data_root = 'data/PHYRE'
    slots_root = {{slots!r}}
    resolution = ({RES}, {RES})
    fps = 1
    n_sample_frames = {VID_LEN}
    frame_offset = 1
    video_len = {VID_LEN}
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.01
    pos_ratio = 0.5
    reverse_color = True
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64
    slot_dict = dict(num_slots={S}, slot_size={D})
    rollout_dict = dict(num_slots={S}, slot_size={D}, history_len=1,
                        cond_len={VID_LEN}, t_pe='sin', slots_pe='',
                        d_model=128, num_layers=2, num_heads=4, ffn_dim=512,
                        norm_first=True)
    dec_dict = dict(dec_channels=({D}, 32, 32, 32), dec_resolution=(8, 8),
                    dec_ks=5, dec_ckp_path='')
    loss_dict = dict(rollout_len={VID_LEN - 1}, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
    optimizer = 'Adam'
    lr = 2e-4
    warmup_steps_pct = 0.05
    max_epochs = 10
    save_interval = 1.0
    eval_interval = 5
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
"""

READOUT_CFG = f"""
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'PHYREReadout'
    dataset = 'phyre_rollout_slots'
    data_root = 'data/PHYRE'
    slot_root = {{slots!r}}
    resolution = ({RES}, {RES})
    fps = 1
    n_sample_frames = {VID_LEN}
    frame_offset = 1
    video_len = {VID_LEN}
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.01
    pos_ratio = 0.5
    reverse_color = True
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64
    readout_dict = dict(num_slots={S}, slot_size={D}, t_pe='sin',
                        d_model=128, num_layers=2, num_heads=4, ffn_dim=512,
                        norm_first=True, sel_slots=(0, 2, 4, 6))
    vqa_loss_w = 1.0
    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    max_epochs = 60
    save_interval = 2.0
    eval_interval = 5
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
"""


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
    import slotformer_tpu.datasets.phyre as P
    import slotformer_tpu.cli.rollout_phyre_slots as RP

    split_dir = os.path.join(OUT, "splits")
    os.makedirs(split_dir, exist_ok=True)
    P._SPLIT_DIR = split_dir
    RP._SPLIT_DIR = split_dir
    sys.modules["phyre"] = _fake_phyre_module()

    from slotformer_tpu.cli.extract_phyre_slots import main as extract_main
    from slotformer_tpu.cli.rollout_phyre_slots import main as rollout_main
    from slotformer_tpu.cli.test_phyre_planning import main as plan_main

    savi_cfg, sf_cfg, ro_cfg = ("savi_phyre_fake.py", "sf_phyre_fake.py",
                                "readout_phyre_fake.py")
    _write(savi_cfg, SAVI_CFG)

    # ---- stage 1: SAVi
    savi_ckp = "ckpts/savi_phyre_fake/latest.ckpt.pkl"
    if not os.path.exists(savi_ckp):
        _train(savi_cfg, "ckpts/savi_phyre_fake")

    # ---- stage 2: per-action slot extraction
    slot_dir = ("data/PHYRE/slots/savi_phyre_fake/"
                "within-fold_0-{}-data_0.01-pos_0.5")
    if not os.path.isdir(slot_dir.format("train")):
        t0 = time.perf_counter()
        extract_main(["--params", savi_cfg, "--weight", savi_ckp,
                      "--save_path", "data/PHYRE", "--vid_len", str(VID_LEN),
                      "--bs", "64"])
        print(f"[timing] extraction {time.perf_counter() - t0:.1f}s",
              flush=True)

    # ---- stage 3: SingleStepSlotFormer on extracted slots
    _write(sf_cfg, SF_CFG.format(slots=slot_dir))
    sf_ckp = "ckpts/sf_phyre_fake/latest.ckpt.pkl"
    if not os.path.exists(sf_ckp):
        _train(sf_cfg, "ckpts/sf_phyre_fake")

    # ---- stage 4: rollout every action file
    ro_dir = "data/PHYRE/rollout_slots/sf_phyre_fake/within-fold_0-{}"
    if not os.path.isdir(ro_dir.format("train")):
        t0 = time.perf_counter()
        rollout_main(["--params", sf_cfg, "--weight", sf_ckp,
                      "--save_path", "data/PHYRE", "--bs", "64"])
        print(f"[timing] rollout {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- stage 5: readout head on STANDARDIZED rolled-out slots
    # The fake sim's discretized scenes leave the label direction at ~0.5%
    # of the slots' per-channel scale; the (reference-parity) readout never
    # picks it up from raw slots at any LR (round-3 probe: acc 0.5 after
    # 3k steps raw / after per-token LN, acc 1.0 by 500 steps with
    # per-channel train-set standardization). Standardization is affine per
    # channel, so after training it is FOLDED exactly into in_proj
    # (W'=W/sigma, b'=b-(mu/sigma)@W): the planning checkpoint consumes RAW
    # slots and the model + planning CLI stay reference-parity.
    ro_std_dir = ro_dir.replace("rollout_slots", "rollout_slots_std")
    if not os.path.isdir(ro_std_dir.format("train")):
        mu, sd = _standardize_slots(ro_dir, ro_std_dir)
    else:
        st = np.load(ro_std_dir.format("train") + "_stats.npz")
        mu, sd = st["mu"], st["sd"]
    _write(ro_cfg, READOUT_CFG.format(slots=ro_std_dir))
    head_ckp = "ckpts/readout_phyre_fake/latest.ckpt.pkl"
    if not os.path.exists(head_ckp):
        _train(ro_cfg, "ckpts/readout_phyre_fake")
    folded_ckp = "ckpts/readout_phyre_fake/latest_folded.ckpt.pkl"
    verdict_file = folded_ckp + ".fold_verdict.json"
    if not os.path.exists(folded_ckp):
        fold_warned = _fold_standardization(
            head_ckp, folded_ckp, mu, sd, ro_cfg, ro_dir)
    elif os.path.exists(verdict_file):
        # resume path: the verdict was persisted alongside the folded ckpt
        # so a grey-zone fold keeps its UNVERIFIED tag across re-runs
        with open(verdict_file) as f:
            fold_warned = bool(json.load(f)["warned"])
    else:
        # folded ckpt from a run that predates verdict persistence —
        # unknown provenance, tag conservatively
        fold_warned = True

    # ---- stage 6: planning eval -> AUCCESS (folded head on raw slots)
    t0 = time.perf_counter()
    plan_main([
        "--params", sf_cfg, "--weight", sf_ckp,
        "--task_cls_params", ro_cfg, "--task_cls_weight", folded_ckp,
        "--savi_params", savi_cfg, "--savi_weight", savi_ckp,
        "--bs", "50", "--num_acts", "100",
    ])
    if fold_warned:
        print("[fold] AUCCESS above is UNVERIFIED: the in_proj fold check "
              "warned (relative error in the 1e-2..0.1 grey zone)",
              flush=True)
    print(f"[timing] planning eval {time.perf_counter() - t0:.1f}s",
          flush=True)
    _report_baselines("ckpts/readout_phyre_fake/test")


def _standardize_slots(src_tmpl, dst_tmpl):
    """Per-channel standardization of rollout slot files; train-split stats."""
    tr = src_tmpl.format("train")
    files = sorted(os.listdir(tr))
    X = np.stack([np.load(os.path.join(tr, f)) for f in files])
    mu = X.mean((0, 1, 2))
    sd = X.std((0, 1, 2)) + 1e-6
    for split in ("train", "val"):
        src, dst = src_tmpl.format(split), dst_tmpl.format(split)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            x = np.load(os.path.join(src, f))
            np.save(os.path.join(dst, f), ((x - mu) / sd).astype(np.float32))
    np.savez(dst_tmpl.format("train") + "_stats.npz", mu=mu, sd=sd)
    print(f"[std] slots standardized -> {dst_tmpl}", flush=True)
    return mu, sd


def _fold_standardization(src_ckp, dst_ckp, mu, sd, ro_cfg, ro_dir):
    """Fold (x-mu)/sd into in_proj so the head consumes raw slots; verify."""
    import jax.numpy as jnp

    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import (dump_obj, load_obj, load_params,
                                        load_state_dict)

    ckp = load_obj(src_ckp)
    tree = ckp["state_dict"]
    W = np.asarray(tree["in_proj"]["kernel"])  # [C, D]
    b = np.asarray(tree["in_proj"]["bias"])
    tree["in_proj"]["kernel"] = jnp.asarray(W / sd[:, None])
    tree["in_proj"]["bias"] = jnp.asarray(b - (mu / sd) @ W)
    dump_obj(ckp, dst_ckp)
    # numeric check: folded(raw) == trained(standardized)
    model = build_model(load_params(ro_cfg))
    raw = np.stack([
        np.load(os.path.join(ro_dir.format("val"), f"{i:06d}.npy"))
        for i in range(8)
    ]).astype(np.float32)
    lg_fold = model.apply({"params": load_state_dict(dst_ckp)},
                          {"slots": jnp.asarray(raw)})["logits"]
    lg_std = model.apply({"params": load_state_dict(src_ckp)},
                         {"slots": jnp.asarray((raw - mu) / sd)})["logits"]
    lg_fold = np.asarray(lg_fold)
    lg_std = np.asarray(lg_std)
    err = float(np.abs(lg_fold - lg_std).max())
    rel = err / max(float(np.abs(lg_std).max()), 1e-12)
    print(f"[fold] in_proj standardization folded; max|dlogit|={err:.2e} "
          f"(rel {rel:.2e})", flush=True)
    # relative check: f32 matmuls over unnormalized slot scales legitimately
    # accumulate ~1e-3 abs error (three hardware runs died on the old hard
    # 1e-3 abs assert). Grey zone (1e-2..0.1): a noisy-but-plausible fold
    # must not discard a trained pipeline — warn, continue, and tag the
    # AUCCESS as UNVERIFIED. Above 0.1 the fold is genuinely wrong: fail
    # hard rather than print an authoritative-looking AUCCESS.
    assert rel <= 0.1, (
        f"in_proj standardization fold is wrong: relative error {rel:.2e} "
        "> 0.1 — refusing to run the planning eval on a mis-folded head")
    warned = rel > 1e-2
    if warned:
        print(f"[fold] WARNING: relative fold error {rel:.2e} > 1e-2; "
              "continuing to planning eval anyway — AUCCESS will be tagged "
              "UNVERIFIED", flush=True)
    # persist the verdict so a resumed run (folded ckpt already on disk)
    # keeps tagging its AUCCESS correctly
    with open(dst_ckp + ".fold_verdict.json", "w") as f:
        json.dump({"warned": warned, "rel": rel}, f)
    return warned


def _report_baselines(test_dir):
    """Chance AUCCESS + readout classification accuracy on the eval grid."""
    from slotformer_tpu.metrics.auccess import SOLVED, auccess_from_conf

    conf = np.load(os.path.join(test_dir, "pred_conf-0.npy"))
    gt = np.load(os.path.join(test_dir, "gt_status-0.npy"))
    valid = gt != 0
    acc = (((conf > 0.5) == (gt == SOLVED))[valid]).mean()
    print(f"[report] readout accuracy on eval actions: {acc:.3f} "
          f"(solve rate {float((gt == SOLVED)[valid].mean()):.2f})",
          flush=True)
    rng = np.random.default_rng(0)
    scores = [auccess_from_conf(
        np.where(valid, rng.random(conf.shape), -1.0), gt)[0]
        for _ in range(20)]
    print(f"[report] chance AUCCESS (random ranking, 20 draws): "
          f"{np.mean(scores):.2f} +/- {np.std(scores):.2f}", flush=True)


if __name__ == "__main__":
    main()
