"""Round-3 EXTENDED stochastic StoSAVi sweep (VERDICT r2 next-round #2a).

Gives the reference's stochastic recipe (kld_method='var-0.01',
kld_loss_w=1e-4) a ~4x budget (51 epochs ~ 24k steps) at two LRs:
  sto_lr4e-4      the LR that converges for the deterministic variant here
  sto_ref_lr1e-4  the reference's exact LR (stosavi_clevrer_params.py:24)

Each variant trains through ``cli.train --auto_resume`` so the tunneled-TPU
client's host-memory leak is absorbed by the RSS watchdog's
checkpoint->execv->resume cycles (CLAUDE.md round-2 notes). Afterwards the
encoder-mask ARI/FG-ARI TRAJECTORY is computed from the saved per-epoch
checkpoints, answering "does the stochastic recipe converge given steps, or
is the round-2 ARI~0 a budget artifact?" (the 20-step noise-matched
trajectory parity test already pins the KLD/sampling math to the reference).

Run:  python experiments/savi_sweep_r3.py [--variants a,b] [--eval-only]
Logs: experiments/logs/savi_sweep_r3_<variant>.log
Ckpts: experiments/out_sweep_r3/<variant>/
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

VARIANTS = ("sto_lr4e-4", "sto_ref_lr1e-4")
OUT = os.path.join(REPO, "experiments", "out_sweep_r3")
LOGS = os.path.join(REPO, "experiments", "logs")


def train(variant: str) -> None:
    params = os.path.join(REPO, "experiments", "sweep_r3",
                          f"{variant}_params.py")
    ckp = os.path.join(OUT, variant)
    log = os.path.join(LOGS, f"savi_sweep_r3_{variant}.log")
    cmd = [sys.executable, "-m", "slotformer_tpu.cli.train",
           "--params", params, "--ckp_path", ckp, "--auto_resume"]
    print(f"[sweep-r3] training {variant} -> {ckp}", flush=True)
    with open(log, "a") as f:
        f.write(f"\n==== launch {time.strftime('%F %T')} ====\n")
        f.flush()
        # cli.train re-execs ITSELF on watchdog restarts, so one subprocess
        # call covers the whole (possibly multi-exec) run
        subprocess.run(cmd, check=False, stdout=f, stderr=subprocess.STDOUT,
                       cwd=REPO)


def ari_of_ckpt(model, params, ckpt_path, val_items):
    import jax

    from slotformer_tpu.metrics.vp_metrics import (ARI_metric, fARI_metric,
                                                   postproc_mask)
    from slotformer_tpu.runtime import load_state_dict

    img = np.stack([it["img"] for it in val_items])
    gt = np.stack([it["mask"] for it in val_items]).astype(np.int64)
    tree = load_state_dict(ckpt_path)
    out = model.apply({"params": tree}, {"img": img},
                      rngs={"sample": jax.random.PRNGKey(0)})
    pm = np.asarray(postproc_mask(out["post_masks"]))
    ns = params.slot_dict["num_slots"]
    a = ARI_metric(gt.reshape(-1, 64, 64), pm.reshape(-1, 64, 64),
                   num_classes=max(ns + 1, 8))
    f = fARI_metric(gt.reshape(-1, 64, 64), pm.reshape(-1, 64, 64),
                    num_classes=max(ns + 1, 8))
    return float(a), float(f)


def evaluate(variant: str) -> None:
    from slotformer_tpu.datasets import build_dataset
    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    params = load_params(os.path.join(REPO, "experiments", "sweep_r3",
                                      f"{variant}_params.py"))
    params.load_mask = True
    params.wire_uint8 = False  # host-side f32 imgs for the eval forward
    val_set = build_dataset(params, val_only=True)
    val_items = [val_set[i] for i in range(8)]
    model = build_model(params)
    ckp = os.path.join(OUT, variant)
    cks = sorted(
        (f for f in os.listdir(ckp)
         if f.startswith("model_") and f.endswith(".ckpt.pkl")),
        key=lambda f: int(f.split("_")[1].split(".")[0]),
    )
    # ~8 evenly spaced checkpoints + the last one
    sel = list(dict.fromkeys(
        list(cks[:: max(len(cks) // 8, 1)]) + [cks[-1]]))
    log = os.path.join(LOGS, f"savi_sweep_r3_{variant}.log")
    with open(log, "a") as f:
        for name in sel:
            step = int(name.split("_")[1].split(".")[0])
            a, fg = ari_of_ckpt(model, params, os.path.join(ckp, name),
                                val_items)
            line = (f"[sweep-r3] {variant} step={step} "
                    f"ARI={a:.4f} FG-ARI={fg:.4f}")
            print(line, flush=True)
            f.write(line + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(LOGS, exist_ok=True)
    for v in args.variants.split(","):
        if not args.eval_only:
            train(v)
        evaluate(v)
