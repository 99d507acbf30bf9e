"""Trainer (``BaseMethod``) — the training strategy layer.

Replaces ``nerv.training.BaseMethod`` (reference surface documented in
SURVEY.md §1 L1/§2.1 R1): epoch loop, optimizer + per-step cosine schedule,
grad clipping, periodic checkpoint save (``save_interval`` fraction of an
epoch + epoch end), periodic validation (``eval_interval``), sanity-check
validation before training, resume, scalar logging.

TPU-native rewrite:
  * one python process; the train step is a single jitted function over a
    ('data','model') mesh — batch sharded on data, params/opt-state
    replicated, gradient all-reduce inserted by XLA (replaces DDP+NCCL).
  * schedules (LR, gumbel tau, loss-decay) are pure functions of the step
    index evaluated INSIDE jit — no host-side mutable schedule state
    (replaces nerv's ``_training_step_start`` mutation hooks,
    base_slots/method.py:207-221, video_prediction/method.py:26-48).
  * checkpoints are numpy pytrees via runtime.checkpoint (orbax-style
    step-keyed files), saved asynchronously off the training thread.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import get_mesh, replicate, shard_batch, shard_params
from .checkpoint import load_checkpoint, save_checkpoint
from .meters import MeterBank
from .schedules import build_optimizer, cosine_annealing_warmup


class RestartForMemory(RuntimeError):
    """Raised by the trainer after checkpointing when host RSS crosses the
    watchdog limit (see BaseMethod.max_rss_gb). The caller (cli.train) is
    expected to re-exec the process with --auto_resume."""


def _rss_gb() -> float:
    try:
        page = os.sysconf("SC_PAGE_SIZE")  # 4K x86, 16K/64K some arm64
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * page / 1e9
    except (OSError, ValueError, IndexError):  # pragma: no cover - non-linux
        return 0.0


def _is_array(x) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def _device_batch(batch: dict) -> dict:
    """Keep only array leaves (device-friendly) of a collated batch."""
    return {k: v for k, v in batch.items() if _is_array(v)}


# image keys that may arrive uint8 over the host->device wire (datasets
# opting into wire_uint8); decoded to [-1, 1] float32 ON DEVICE with the
# exact BaseTransforms formula ((x/255 - mean)/std, mean=std=0.5 —
# datasets/utils.py:39-40). Moving the normalization into the jit shrinks
# host->device transfers 4x — on the tunneled axon platform that also cuts
# the client's per-transfer host-memory leak 4x (CLAUDE.md round-2 notes),
# and on any TPU it halves dispatch payload for image-driven steps.
WIRE_IMG_KEYS = ("img",)


def _decode_wire(batch: dict) -> dict:
    import jax.numpy as jnp

    out = dict(batch)
    for k in WIRE_IMG_KEYS:
        v = out.get(k, None)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = (v.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return out


def to_bf16(tree):
    """THE AMP cast: every f32 leaf -> bf16, everything else untouched.

    Single definition of the trainer's ``--fp16`` policy (reference AMP at
    scripts/train.py:72,84,105) — bench.py and the AMP regression tests
    import this so a measured/tested program can never silently diverge
    from what the trainer runs."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


class BaseMethod:
    """Generic trainer for flax models following the loss-dict convention.

    Model contract (SURVEY.md §2.1 R5): the flax module exposes
      * ``train_loss(batch, **extras) -> {name: scalar}``
      * ``eval_loss(batch) -> {name: scalar}``
    and total loss = sum over params ``<name>_w`` weights.
    """

    # subtrees excluded from optimization (e.g. SlotFormer's frozen decoder)
    frozen_prefixes: Sequence[str] = ()

    def __init__(
        self,
        model,
        datamodule,
        params,
        ckp_path: str = "checkpoints/exp",
        local_rank: int = 0,  # kept for reference API parity; always 0
        use_ddp: bool = False,  # no-op: sharding replaces DDP
        use_fp16: bool = False,
        mesh=None,
        seed: int = 42,
    ):
        self.model = model
        self.datamodule = datamodule
        self.params = params
        self.ckp_path = ckp_path
        self.use_fp16 = use_fp16
        self.local_rank = 0
        # tp_size > 1 widens the mesh's 'model' axis: Megatron-style param
        # sharding (parallel/tp.py) with XLA-derived collectives; always
        # shape-safe (non-divisible dims stay replicated)
        self.mesh = mesh if mesh is not None else get_mesh(
            n_model=int(params.get("tp_size", 1))
        )
        self.seed = int(params.get("seed", seed))

        self.train_loader = datamodule.train_loader
        self.val_loader = datamodule.val_loader
        self.max_epochs = int(params.max_epochs)
        self.steps_per_epoch = len(self.train_loader)
        self.total_steps = self.max_epochs * self.steps_per_epoch
        self.save_interval = float(params.get("save_interval", 1.0))
        self.eval_interval = int(params.get("eval_interval", 1))
        self.print_iter = int(params.get("print_iter", 50))
        self.grad_accum = int(params.get("accum_grad", 1))
        # fuse K optimizer steps into ONE device execution (lax.scan over
        # stacked batches): amortizes per-execution dispatch/transfer
        # overheads — essential on remote/tunneled devices, harmless locally
        self.steps_per_call = max(int(params.get("steps_per_call", 1)), 1)

        self.loss_weights = params.loss_weights()

        self.it = 0  # global step
        self.epoch = 0
        self.stats = MeterBank()
        self._log_file = None
        # host-RSS watchdog: the tunneled-TPU (axon IFRT-proxy) client leaks
        # host memory proportional to every host->device transfer (~19 MB
        # per CLEVRER-scale image batch, measured; pure execution is clean),
        # so any long run eventually OOMs. When RSS crosses the limit the
        # trainer checkpoints and raises RestartForMemory — cli.train
        # re-execs itself with --auto_resume (preemption-resume semantics,
        # same recovery path as a Slurm requeue). 0 disables; -1 = auto
        # (60% of MemTotal — what cli.train passes); >0 = explicit limit in
        # GB. When ABSENT, the leaky tunneled client itself (detected via
        # its registration env — its PJRT platform string is just "tpu")
        # arms the auto limit for EVERY caller, incl. direct fit() scripts:
        # a checkpoint + loud RestartForMemory beats an un-checkpointed
        # OOM SIGKILL (round-3: a no-limit sweep run died silently at step
        # 2800, logs/savi_sweep_r3_sto_lr4e-4.log). Other platforms stay
        # opt-in — no behavior change for healthy hosts.
        _axon = ("axon" in os.environ.get("JAX_PLATFORMS", "")
                 or bool(os.environ.get("PALLAS_AXON_POOL_IPS")))
        self.max_rss_gb = float(
            params.get("max_rss_gb", -1.0 if _axon else 0.0))
        if self.max_rss_gb < 0:  # auto: 60% of MemTotal
            try:
                with open("/proc/meminfo") as f:
                    total_kb = int(f.readline().split()[1])
                self.max_rss_gb = 0.6 * total_kb / 1e6
            except (OSError, ValueError, IndexError):
                self.max_rss_gb = 0.0
        if self.max_rss_gb > 0:
            # surface the effective limit so restart churn is diagnosable
            print(
                f"[trainer] host-RSS watchdog enabled: limit "
                f"{self.max_rss_gb:.1f} GB (checkpoint + re-exec on breach)",
                flush=True,
            )
        self._wandb = None
        if params.get("use_wandb", False):
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=params.get("project", "slotformer-tpu"),
                    name=os.path.basename(ckp_path.rstrip("/")),
                    config=params.to_dict(),
                    resume="allow",
                )
            except Exception as e:  # offline envs
                print(f"[warn] wandb unavailable: {e}", flush=True)
        # jax.profiler trace: set profile_steps=(start, stop) in params to
        # capture a device trace under <ckp_path>/profile
        self._profile_steps = params.get("profile_steps", None)

        self.optimizer = self._configure_optimizers()
        self._train_step_fn = None
        self._single_step_fn = None
        self._eval_step_fn = None
        self._ckp_writer = None
        self.state = None  # dict(params=..., opt_state=..., rng=...)

    # ------------------------------------------------------------ optimizer
    def _configure_optimizers(self) -> optax.GradientTransformation:
        # MultiSteps advances the inner schedule once per k loader steps, so
        # the schedule horizon must be in OPTIMIZER steps, not loader steps
        sched_steps = self.total_steps // self.grad_accum
        tx = build_optimizer(
            self.params, sched_steps, frozen_prefixes=self.frozen_prefixes
        )
        if self.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.grad_accum)
        return tx

    # ----------------------------------------------------------- state init
    def _init_rngs(self) -> Dict[str, jax.Array]:
        root = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(root, 3)
        return {"params": ks[0], "sample": ks[1], "dropout": ks[2]}

    def setup_state(self, sample_batch: Optional[dict] = None) -> None:
        """Initialize (or graft) params + opt state, replicated on the mesh."""
        if sample_batch is None:
            sample_batch = next(iter(self.val_loader or self.train_loader))
        sample_batch = _device_batch(sample_batch)
        variables = self.model.init(self._init_rngs(), sample_batch)
        params = variables["params"]
        params = self._post_init_params(params)
        # place params first (TP shards transformer kernels on the model
        # axis; replicated when the axis is 1-wide), then place the opt
        # state with the SAME rules: moment leaves sit at `...mu/<param
        # path>` so the $-anchored suffix regexes match them too (GSPMD
        # does NOT propagate input shardings into tx.init's zeros — they
        # are value-independent constants, verified on the 8-dev mesh)
        params = shard_params(self.mesh, params)
        opt_state = shard_params(self.mesh, jax.jit(self.optimizer.init)(params))
        rng = jax.random.PRNGKey(self.seed + 1)
        self.state = {
            "params": params,
            "opt_state": opt_state,
            "rng": rng,
        }

    def _post_init_params(self, params):
        """Hook: graft pretrained subtrees (frozen decoders etc.)."""
        return params

    # -------------------------------------------------------- step schedules
    def train_loss_kwargs(self, step: jnp.ndarray) -> Dict[str, Any]:
        """Scheduled scalars passed into model.train_loss, as pure functions
        of the (traced) step index. Subclasses override."""
        return {}

    # ------------------------------------------------------------ jit steps
    def _make_train_step(self) -> Callable:
        model = self.model
        optimizer = self.optimizer
        weights = dict(self.loss_weights)
        use_bf16 = self.use_fp16  # bf16 is the TPU AMP dtype
        _to_bf16 = to_bf16
        frozen = tuple(self.frozen_prefixes)

        def train_step(state, batch, step):
            rng, sample_rng, dropout_rng = jax.random.split(state["rng"], 3)
            extras = self.train_loss_kwargs(step)
            batch = _decode_wire(batch)
            if use_bf16:
                batch = _to_bf16(batch)

            def loss_fn(p):
                # frozen subtrees: stop_gradient lets XLA dead-code-eliminate
                # their weight-gradient computations entirely (the optimizer
                # mask alone would still compute-then-zero them — e.g. the
                # SlotFormer frozen decoder's deconv weight grads are ~1/3 of
                # the backward FLOPs)
                if frozen:
                    p = {
                        k: jax.lax.stop_gradient(v)
                        if any(k.startswith(f) for f in frozen)
                        else v
                        for k, v in p.items()
                    }
                # mixed precision: f32 master params, bf16 compute — the cast
                # transposes to an f32 grad accumulation automatically
                if use_bf16:
                    p = _to_bf16(p)
                losses = model.apply(
                    {"params": p},
                    batch,
                    method="train_loss",
                    rngs={"sample": sample_rng, "dropout": dropout_rng},
                    **extras,
                )
                losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
                total = jnp.zeros((), jnp.float32)
                for k, v in losses.items():
                    total = total + weights.get(k, 1.0) * v
                losses["total_loss"] = total
                return total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )
            updates, new_opt = optimizer.update(
                grads, state["opt_state"], state["params"]
            )
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {"params": new_params, "opt_state": new_opt, "rng": rng}
            losses["grad_norm"] = optax.global_norm(grads)
            return new_state, losses

        # single-step fn is always available (used directly when
        # steps_per_call == 1, and for epoch-end remainder batches otherwise)
        self._single_step_fn = jax.jit(train_step, donate_argnums=0)
        if self.steps_per_call == 1:
            return self._single_step_fn

        # fused multi-step: lax.scan K optimizer steps over stacked batches in
        # ONE device execution. losses returned from the LAST step only.
        def multi_step(state, batches, step0):
            def body(carry, xs):
                st, i = carry
                b, = xs
                st, losses = train_step(st, b, step0 + i)
                return (st, i + 1), losses

            (state, _), losses = jax.lax.scan(
                body, (state, jnp.zeros((), jnp.int32)), (batches,)
            )
            return state, jax.tree.map(lambda x: x[-1], losses)

        return jax.jit(multi_step, donate_argnums=0)

    def _make_eval_step(self) -> Callable:
        model = self.model

        def eval_step(state, batch, batch_idx):
            # deterministic eval, but DIFFERENT kernel-sampling noise per
            # val batch: a constant key would show every batch the same
            # stochastic draw and mildly bias val KLD/recon for stochastic
            # models (VERDICT r4 weak #6)
            return model.apply(
                {"params": state["params"]},
                _decode_wire(batch),
                method="eval_loss",
                rngs={"sample": jax.random.fold_in(
                    jax.random.PRNGKey(0), batch_idx)},
            )

        return jax.jit(eval_step)

    # ---------------------------------------------------------------- train
    def fit(
        self,
        resume_from: str = "",
        san_check_val_step: int = 2,
    ) -> None:
        resuming = bool(resume_from) and os.path.isfile(resume_from)
        if self.state is None and not resuming:
            self.setup_state()
        if resuming:
            # skip setup_state: load_ckp builds params + the opt-state
            # template itself, so the full model.init + _post_init_params
            # graft (which reads pretrained ckpts from disk) would be
            # thrown away — and every RSS-watchdog restart would both pay
            # it and re-depend on the graft source file still existing
            self.load_ckp(resume_from)
        self._train_step_fn = self._train_step_fn or self._make_train_step()
        self._eval_step_fn = self._eval_step_fn or self._make_eval_step()
        self._open_log()

        if san_check_val_step > 0 and self.val_loader is not None:
            self.validation_epoch(san_check_step=san_check_val_step)

        save_every = max(int(self.steps_per_epoch * self.save_interval), 1)
        start_epoch = self.it // self.steps_per_epoch
        for epoch in range(start_epoch, self.max_epochs):
            self.epoch = epoch
            self.train_loader.set_epoch(epoch)
            self._train_epoch(save_every)
            if self.val_loader is not None and (epoch + 1) % self.eval_interval == 0:
                self.validation_epoch()
            self.save_ckp()
            self._maybe_restart()
        self._close_log()

    def _maybe_restart(self) -> None:
        """Checkpoint + raise RestartForMemory when RSS crosses the limit."""
        if self.max_rss_gb <= 0:
            return
        rss = _rss_gb()
        if rss < self.max_rss_gb:
            return
        print(
            f"[trainer] host RSS {rss:.1f} GB >= limit {self.max_rss_gb:.1f} "
            "GB (tunnel-client transfer leak) — checkpointing for restart",
            flush=True,
        )
        # every call site runs save_ckp() immediately before; just flush
        # the async writer so execv doesn't drop the in-flight checkpoint
        self._join_ckp_writer()
        self._close_log()
        raise RestartForMemory(f"rss {rss:.1f} GB >= {self.max_rss_gb:.1f} GB")

    def _put_batch(self, batch: dict):
        """Place a host batch on the mesh; returns (device_batch, size)."""
        db = _device_batch(batch)
        bs = next(v.shape[0] for v in db.values())
        if bs % self.mesh.shape["data"] == 0:
            return shard_batch(self.mesh, db), bs
        # batch not divisible by the data axis (tiny debug runs, val
        # remainder batches): replicate — exact, just no DP speedup
        return replicate(self.mesh, db), bs

    def _profile_start_if_due(self, inc: int) -> None:
        """Start the profiler when its start step falls inside the next
        call's [it, it+inc) window — equality would never fire when
        steps_per_call > 1 makes self.it skip over it. The _profiling flag
        makes the check idempotent: in fused mode this runs once per BATCH
        while self.it only advances once per fused call."""
        if not self._profile_steps or getattr(self, "_profiling", False):
            return
        if self.it <= int(self._profile_steps[0]) < self.it + inc:
            jax.profiler.start_trace(os.path.join(self.ckp_path, "profile"))
            self._profiling = True

    def _post_step(self, losses, t0, last_print_it, save_every, inc):
        """Per-step bookkeeping shared by the fused loop, the single-step
        loop, and the fused-mode remainder loop (kept in one place so the
        trigger windows cannot drift): profiler stop, interval logging,
        interval checkpoint + RSS watchdog. Returns (t0, last_print_it)."""
        if getattr(self, "_profiling", False) and \
                self.it - inc < int(self._profile_steps[1]) <= self.it:
            jax.tree.map(lambda x: x.block_until_ready(), losses)
            jax.profiler.stop_trace()
            self._profiling = False
            print(f"[profile] trace saved under {self.ckp_path}/profile",
                  flush=True)
        if self.it % self.print_iter < inc:
            losses = {k: float(v) for k, v in losses.items()}
            dt = (time.perf_counter() - t0) / max(self.it - last_print_it, 1)
            t0 = time.perf_counter()
            last_print_it = self.it
            self._log(
                {
                    "phase": "train",
                    "step": self.it,
                    "epoch": self.epoch,
                    "sec_per_step": round(dt, 4),
                    **{k: round(v, 6) for k, v in losses.items()},
                }
            )
        if self.it % save_every < inc:
            self.save_ckp()
            if self.it % self.steps_per_epoch != 0:
                # at an exact epoch boundary fit() validates first and
                # then runs the watchdog — don't skip that eval
                self._maybe_restart()
        return t0, last_print_it

    def _train_epoch(self, save_every: int) -> None:
        t0 = time.perf_counter()
        last_print_it = self.it
        pending = []  # batches awaiting a fused multi-step call
        # mid-epoch resume (fractional save_interval + preemption/watchdog
        # restart): skip the batches this epoch already consumed so steps
        # aren't replayed and the run ends at exactly total_steps. The skip
        # happens at the sampler-index level (iter_from) so no host
        # loading/augmentation is paid for already-consumed batches.
        skip = self.it % self.steps_per_epoch
        inc = max(self.steps_per_call, 1)
        for batch in self.train_loader.iter_from(skip):
            self._profile_start_if_due(inc)
            if self.steps_per_call > 1:
                pending.append(_device_batch(batch))
                if len(pending) < self.steps_per_call:
                    continue
                stacked = {
                    k: np.stack([b[k] for b in pending]) for k in pending[0]
                }
                pending = []
                # [K, B, ...]: batch dim (axis 1) sharded over the mesh
                from jax.sharding import NamedSharding, PartitionSpec

                bs = next(v.shape[1] for v in stacked.values())
                if bs % self.mesh.shape["data"] == 0:
                    sh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
                else:
                    sh = NamedSharding(self.mesh, PartitionSpec())
                batches = jax.device_put(stacked, sh)
                self.state, losses = self._train_step_fn(
                    self.state, batches, jnp.asarray(self.it, jnp.int32)
                )
                self.it += self.steps_per_call
            else:
                batch, _ = self._put_batch(batch)
                self.state, losses = self._train_step_fn(
                    self.state, batch, jnp.asarray(self.it, jnp.int32)
                )
                self.it += 1
            t0, last_print_it = self._post_step(
                losses, t0, last_print_it, save_every, inc)
        # fused mode: run leftover batches (epoch length not divisible by
        # steps_per_call) through the single-step path so no data is dropped;
        # the shared _post_step keeps the logging/checkpoint/profiler
        # bookkeeping identical to the main loop
        for b in pending:
            self._profile_start_if_due(1)
            db, _ = self._put_batch(b)
            self.state, losses = self._single_step_fn(
                self.state, db, jnp.asarray(self.it, jnp.int32)
            )
            self.it += 1
            t0, last_print_it = self._post_step(
                losses, t0, last_print_it, save_every, 1)

    def _val_batches(self, san_check_step: int = -1):
        """Yield (raw_batch, device_batch, batch_size) over the val loader
        with the SAME placement policy as training (_put_batch)."""
        for i, batch in enumerate(self.val_loader):
            if 0 < san_check_step <= i:
                break
            db, n = self._put_batch(batch)
            yield batch, db, n

    def _update_val_stats(self, losses: dict, n: int) -> None:
        """Meter update with per-metric batch-size domains (reference
        clevrer_vqa/method.py:63-112): a companion '<name>_bs' entry weights
        that metric by its own row count (e.g. descriptive vs multiple-choice
        rows); metrics without one are weighted by the batch size."""
        losses = {k: float(v) for k, v in losses.items()}
        ws = {
            k[: -len("_bs")]: losses.pop(k)
            for k in list(losses)
            if k.endswith("_bs")
        }
        for k, v in losses.items():
            w = ws.get(k, n)
            if w > 0:
                self.stats.update({k: v}, n=w)

    def _finish_validation(
        self, san_check_step: int, extra: Optional[Dict[str, float]] = None
    ) -> Dict[str, float]:
        avgs = self.stats.averages()
        if extra:
            avgs.update(extra)
        self._log(
            {"phase": "val", "step": self.it,
             **{k: round(v, 6) for k, v in avgs.items()}}
        )
        if san_check_step <= 0 and int(self.params.get("n_samples", 0)) > 0:
            try:
                self._sample_video()
            except NotImplementedError:
                pass
            except Exception as e:  # vis must never kill training
                print(f"[warn] _sample_video failed: {e}", flush=True)
        return avgs

    def validation_epoch(self, san_check_step: int = -1) -> Dict[str, float]:
        self.stats.reset()
        if self._eval_step_fn is None:
            self._eval_step_fn = self._make_eval_step()
        for bi, (_, db, n) in enumerate(self._val_batches(san_check_step)):
            losses = self._eval_step_fn(self.state, db, bi)
            self._update_val_stats(losses, n)
        return self._finish_validation(san_check_step)

    # ---------------------------------------------------------- media logging
    def _sample_video(self) -> None:
        """Hook: save qualitative videos each val epoch (reference
        base_slots/method.py:133-162). Subclasses implement."""
        raise NotImplementedError

    def _vis_dir(self) -> str:
        d = os.path.join(self.ckp_path, "vis")
        os.makedirs(d, exist_ok=True)
        return d

    def _sample_val_videos(self, n: int):
        """Uniformly sample n whole videos from the val dataset
        (reference _get_sample_idx, base_slots/method.py:50-56)."""
        dst = self.val_loader.dataset
        if not hasattr(dst, "get_video"):
            raise NotImplementedError
        base = dst.base if hasattr(dst, "base") else dst
        n_videos = len(getattr(base, "files", []))
        if n_videos == 0:
            raise NotImplementedError
        n = min(n, n_videos)
        idxs = np.arange(0, n_videos, max(n_videos // n, 1))[:n]
        return [base.get_video(int(i)) for i in idxs]

    # ------------------------------------------------------------ ckpt / log
    def save_ckp(self) -> None:
        """Asynchronous checkpoint: device_get on the caller (cheap next to
        serialization), pickle + atomic rename + symlink on a background
        thread so training never stalls on disk. At most one write in
        flight — the previous one is joined first."""
        step = self.it
        params = jax.device_get(self.state["params"])
        opt_state = jax.device_get(self.state["opt_state"])
        rng = np.asarray(jax.device_get(self.state["rng"]))
        self._join_ckp_writer()

        def _write():
            try:
                from .io import symlink_force

                path = os.path.join(self.ckp_path, f"model_{step}.ckpt.pkl")
                save_checkpoint(
                    path, params, step=step, opt_state=opt_state, rng=rng)
                # keep a stable pointer for consumers
                symlink_force(
                    path, os.path.join(self.ckp_path, "latest.ckpt.pkl"))
            except BaseException as e:
                # surfaced (re-raised) by the next _join_ckp_writer — not
                # re-raised here, a daemon-thread traceback only makes noise
                self._ckp_writer_exc = e

        import threading

        self._ckp_writer = threading.Thread(target=_write, daemon=True)
        self._ckp_writer.start()

    def _join_ckp_writer(self) -> None:
        """Join the in-flight write and RE-RAISE its failure: a swallowed
        write error would let _maybe_restart raise RestartForMemory with no
        fresh checkpoint on disk — an infinite restart loop replaying the
        same steps from the last OLD checkpoint."""
        writer = getattr(self, "_ckp_writer", None)
        if writer is not None:
            writer.join()
            self._ckp_writer = None
        exc = getattr(self, "_ckp_writer_exc", None)
        if exc is not None:
            self._ckp_writer_exc = None
            raise RuntimeError(
                f"async checkpoint write failed under {self.ckp_path!r}"
            ) from exc

    def load_ckp(self, path: str) -> None:
        self._join_ckp_writer()
        ck = load_checkpoint(path)
        self.it = int(ck.get("step", 0))
        params = shard_params(self.mesh, ck["state_dict"])
        # template whose leaves carry the correct TP layouts (shard_params
        # re-applied: moment leaves match the same $-anchored path rules as
        # the params they mirror); restored leaves are placed onto the
        # template's layout leaf-by-leaf
        tmpl = shard_params(self.mesh, jax.jit(self.optimizer.init)(params))
        opt_state = ck.get("opt_state", None)
        if opt_state is None:
            opt_state = tmpl
        else:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(tmpl), jax.tree.leaves(opt_state)
            )
            opt_state = jax.tree.map(
                lambda t, x: jax.device_put(jnp.asarray(x), t.sharding),
                tmpl, opt_state,
            )
        rng = ck.get("rng", None)
        rng = jnp.asarray(rng) if rng is not None else jax.random.PRNGKey(self.seed + 1)
        self.state = {
            "params": params,
            "opt_state": opt_state,
            "rng": rng,
        }

    def _open_log(self) -> None:
        if self.ckp_path:
            os.makedirs(self.ckp_path, exist_ok=True)
            self._log_file = open(os.path.join(self.ckp_path, "log.jsonl"), "a")

    def _close_log(self) -> None:
        self._join_ckp_writer()
        if self._log_file:
            self._log_file.close()
            self._log_file = None

    def _log(self, record: dict) -> None:
        line = json.dumps(record)
        print(line, flush=True)
        if self._log_file:
            self._log_file.write(line + "\n")
            self._log_file.flush()
        if self._wandb is not None:
            phase = record.get("phase", "train")
            scalars = {
                f"{phase}/{k}": v
                for k, v in record.items()
                if isinstance(v, (int, float)) and k not in ("step",)
            }
            self._wandb.log(scalars, step=record.get("step", self.it))
