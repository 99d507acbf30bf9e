"""Unified training CLI.

Mirrors the reference's ``scripts/train.py`` surface:
    python -m slotformer_tpu.cli.train --params <config.py> [--weight ckpt]
        [--fp16] [--ddp] [--cudnn] [--local_rank N] [--seeds K]

TPU-native changes (SURVEY.md §1 L6):
  * no torch.distributed.launch — one process drives the whole ICI mesh;
    ``--ddp`` / ``--local_rank`` / ``--cudnn`` are accepted-and-ignored for
    script-level compatibility.
  * ``--seeds K`` replaces the reference's ``dup_run_sbatch.sh`` config-copy
    fanout (multi-seed robustness protocol, docs/benchmark.md:81-89): K
    sequential runs with distinct seeds and per-seed checkpoint dirs.
  * preemption resume: pass ``--auto_resume`` to continue from the newest
    checkpoint in the run dir (replaces the Slurm /checkpoint symlink dance,
    scripts/train.py:38-63).
"""

from __future__ import annotations

import argparse
import os
import sys


def _auto_watchdog() -> bool:
    """Arm the host-RSS watchdog by default on the tunneled-TPU (axon)
    client, whose IFRT proxy leaks host memory per transfer (CLAUDE.md).

    The axon PJRT client reports its *platform* as "tpu" — "axon" is only
    the JAX registry/plugin name, so ``jax.default_backend()`` can never
    identify it (round-3 review finding: that gate silently never fired and
    a no-limit sweep run OOM-died at step 2800,
    experiments/logs/savi_sweep_r3_sto_lr4e-4.log). Detect the client by
    its registration env instead; other platforms opt in via
    SLOTFORMER_RSS_WATCHDOG=1 or params.max_rss_gb.
    """
    return ("axon" in os.environ.get("JAX_PLATFORMS", "")
            or bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
            or bool(os.environ.get("SLOTFORMER_RSS_WATCHDOG")))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="train a slotformer_tpu model")
    parser.add_argument("--params", required=True, help="path to the config .py")
    parser.add_argument("--weight", default="", help="checkpoint to resume from")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--ckp_path", default="", help="checkpoint dir override")
    parser.add_argument("--seeds", type=int, default=1)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--start_seed_idx", type=int, default=0,
        help=argparse.SUPPRESS)  # internal: set by the RSS-watchdog re-exec
    parser.add_argument("--san_check_val_step", type=int, default=2)
    # accepted for reference CLI parity; no-ops on TPU
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--ddp", action="store_true")
    parser.add_argument("--cudnn", action="store_true")
    parser.add_argument("--local_rank", "--local-rank", type=int, default=0)
    args = parser.parse_args(argv)

    from ..datasets import build_dataset
    from ..methods import build_method
    from ..models import build_model
    from ..runtime import (BaseDataModule, RestartForMemory,
                           latest_checkpoint, load_params)

    for k in range(args.start_seed_idx, args.seeds):
        params = load_params(args.params)
        seed = args.seed + k
        params.seed = seed
        if not params.has("max_rss_gb") and _auto_watchdog():
            # auto limit; this CLI knows how to recover (re-exec below).
            # Healthy platforms with a legitimately large host footprint
            # (dataset caches) should not churn through checkpoint->execv
            # cycles, so they stay opt-in — see _auto_watchdog.
            params.max_rss_gb = -1.0
        exp_name = os.path.splitext(os.path.basename(args.params))[0]
        if args.seeds > 1:
            exp_name = f"{exp_name}-seed{seed}"
        ckp_path = args.ckp_path or os.path.join("checkpoints", exp_name, "models")
        if args.ckp_path and args.seeds > 1:
            # explicit dir + multi-seed: per-seed subdirs, otherwise every
            # seed shares one dir and (with --auto_resume after a watchdog
            # restart) later seeds would resume the previous seed's final
            # checkpoint and train zero steps
            ckp_path = os.path.join(args.ckp_path, f"seed{seed}")

        built = build_dataset(params)
        collate_fn = None
        if len(built) == 3:
            train_set, val_set, collate_fn = built
        else:
            train_set, val_set = built
        datamodule = BaseDataModule(
            params, train_set, val_set, use_ddp=False, collate_fn=collate_fn
        )

        model = build_model(params)
        method = build_method(
            model=model,
            datamodule=datamodule,
            params=params,
            ckp_path=ckp_path,
            use_fp16=args.fp16,
        )
        method.setup_state()

        resume = args.weight
        if args.auto_resume and not resume:
            resume = latest_checkpoint(ckp_path) or ""
        print(f"[train] exp={exp_name} seed={seed} steps/epoch="
              f"{method.steps_per_epoch} total={method.total_steps} "
              f"resume={resume or 'none'}", flush=True)
        try:
            method.fit(resume_from=resume,
                       san_check_val_step=args.san_check_val_step)
        except RestartForMemory:
            # the RSS watchdog checkpointed; re-exec this process with
            # --auto_resume so training continues with a fresh (leak-free)
            # host heap. Remaining seeds are carried through the restart.
            cmd = [
                sys.executable, "-m", "slotformer_tpu.cli.train",
                "--params", args.params,
                "--auto_resume",
                "--seed", str(args.seed),
                "--seeds", str(args.seeds),
                "--start_seed_idx", str(k),
                "--san_check_val_step", "0",
            ]
            if args.ckp_path:
                cmd += ["--ckp_path", args.ckp_path]
            if args.fp16:
                cmd.append("--fp16")
            print(f"[train] re-exec for memory: {' '.join(cmd[1:])}",
                  flush=True)
            os.execv(sys.executable, cmd)


if __name__ == "__main__":
    main()
