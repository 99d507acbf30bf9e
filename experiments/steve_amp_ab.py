"""Round-5 STEVE `--fp16` convergence A/B on the synthetic-Physion data.

The AMP matrix (amp_matrix_probe_r5_steve2.log) measured STEVE AMP 1.21x
at matched batch — and f32 cannot even fit the reference batch 48 on a
16 GB v5e (30.54G of 15.75G hbm). This gives the speed win the same
convergence evidence the SAVi AMP decision has (savi_amp_ab_r4.log):
identical-budget twins, same seed and data order, f32 vs --fp16, compared
on val token CE. Reference anchor: the reference trains STEVE with --fp16
(/root/reference/scripts/train.py:72; steve_physion_params.py notes it is
"very memory-consuming").

Reuses the round-4 physion-synth corpus + dVAE ckpt under
experiments/out_physion_synth/ (physion_synth_r4.log) — only the two
bounded STEVE trainings run. Budget: 20 epochs = 3,080 steps each
(~13 min f32 / ~11 min AMP on the chip), val every 4 epochs.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "experiments", "out_physion_synth")
sys.path.insert(0, REPO)

AB_EPOCHS = "20"
AB_EVAL_INTERVAL = "4"


def main():
    os.chdir(OUT)
    import slotformer_tpu.datasets.physion as P

    P._SPLIT_DIR = os.path.join(OUT, "splits")  # synth splits, not in-repo
    from slotformer_tpu.cli.train import main as train_main

    src = open("steve_physion_synth.py").read()
    cfg = (src.replace("max_epochs = 110", f"max_epochs = {AB_EPOCHS}")
           .replace("eval_interval = 20", f"eval_interval = {AB_EVAL_INTERVAL}"))
    assert cfg != src and AB_EPOCHS in cfg
    with open("steve_ab_params.py", "w") as f:
        f.write(cfg)

    for tag, extra in (("f32", []), ("amp", ["--fp16"])):
        ckp = f"ckpts/steve_ab_{tag}"
        t0 = time.perf_counter()
        train_main(["--params", "steve_ab_params.py", "--ckp_path", ckp,
                    "--san_check_val_step", "1"] + extra)
        print(f"[ab] {tag} done in {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
