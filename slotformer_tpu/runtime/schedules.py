"""Optimizer LR schedules and scalar annealing.

Replaces ``nerv.training.CosineAnnealingWarmupRestarts`` as used by the
reference (single cycle = total_steps, linear warmup then cosine decay;
/root/reference/slotformer/base_slots/method.py:79-87) plus the
``cosine_anneal`` scalar schedule used for dVAE gumbel-tau decay
(/root/reference/slotformer/base_slots/models/steve_utils.py:54-69,
driven per-step at method.py:207-221).

Everything here is a pure function of the step index, so schedules live
*inside* the jitted train step (optax) with no host-side state.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import optax


def cosine_annealing_warmup(
    total_steps: int,
    max_lr: float,
    min_lr: float = 0.0,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Linear warmup (min→max over warmup_steps) then cosine decay (max→min).

    Single-cycle variant of the reference's CosineAnnealingWarmupRestarts —
    the reference always passes first_cycle=total_steps so never restarts.
    """
    total_steps = max(int(total_steps), 1)
    warmup_steps = int(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr + (max_lr - min_lr) * step / max(warmup_steps, 1)
        decay_steps = max(total_steps - warmup_steps, 1)
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = min_lr + 0.5 * (max_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def cosine_anneal(
    step,
    start_value: float,
    final_value: float,
    start_step: int,
    final_step: int,
):
    """Scalar cosine annealing from start_value to final_value.

    Works on python ints and traced values (used for gumbel tau decay inside
    the jitted dVAE/STEVE train step).
    """
    if final_step <= start_step:
        return final_value
    span = final_step - start_step
    if isinstance(step, (int, float)):
        t = min(max((step - start_step) / span, 0.0), 1.0)
        a = 0.5 * (start_value - final_value)
        b = 0.5 * (start_value + final_value)
        return b + a * math.cos(math.pi * t)
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip((step - start_step) / span, 0.0, 1.0)
    a = 0.5 * (start_value - final_value)
    b = 0.5 * (start_value + final_value)
    return b + a * jnp.cos(jnp.pi * t)


def build_optimizer(
    params_cfg,
    total_steps: int,
    frozen_prefixes: Sequence[str] = (),
    param_labels_fn=None,
) -> optax.GradientTransformation:
    """Build the reference training optimizer stack as one optax chain.

    Supports:
      * Adam / AdamW selected by ``params.optimizer`` + ``params.weight_decay``
      * global-norm gradient clipping via ``params.clip_grad`` (<=0 disables;
        reference semantics: stosavi_clevrer_params.py:18)
      * cosine warmup schedule from ``lr`` / ``warmup_steps_pct``
      * dual-group LR: any param subtree whose top-level key starts with one
        of ``params.dec_lr_prefixes`` (default ``('trans_decoder',)``) uses
        ``params.dec_lr`` with min_lr=0 — the STEVE two-group optimizer
        (reference: base_slots/method.py:237-276)
      * frozen subtrees (zero update) via ``frozen_prefixes`` — used for
        SlotFormer's frozen SAVi decoder.

    ``param_labels_fn(path_tuple) -> label`` may override labeling.
    """
    lr = float(params_cfg.lr)
    warmup_steps = int(float(params_cfg.get("warmup_steps_pct", 0.0)) * total_steps)
    opt_name = str(params_cfg.get("optimizer", "Adam")).lower()
    weight_decay = float(params_cfg.get("weight_decay", 0.0) or 0.0)
    clip_grad = float(params_cfg.get("clip_grad", -1.0) or -1.0)
    dec_lr = params_cfg.get("dec_lr", None)
    dec_prefixes = tuple(params_cfg.get("dec_lr_prefixes", ("trans_decoder",)))

    def make_opt(schedule):
        txs = []
        if clip_grad > 0:
            txs.append(optax.clip_by_global_norm(clip_grad))
        if opt_name == "adamw" or (opt_name == "adam" and weight_decay > 0):
            # adam + weight_decay means decoupled decay (torch AdamW
            # semantics); other optimizers must NOT be silently hijacked
            txs.append(optax.adamw(schedule, weight_decay=weight_decay))
        elif opt_name == "adam":
            txs.append(optax.adam(schedule))
        elif opt_name == "sgd":
            if weight_decay > 0:
                txs.append(optax.add_decayed_weights(weight_decay))
            txs.append(optax.sgd(schedule))
        else:
            raise NotImplementedError(f"optimizer {opt_name}")
        return optax.chain(*txs)

    main_sched = cosine_annealing_warmup(
        total_steps, max_lr=lr, min_lr=lr / 100.0, warmup_steps=warmup_steps
    )

    labels_needed = bool(frozen_prefixes) or dec_lr is not None
    if not labels_needed:
        return make_opt(main_sched)

    opts = {"main": make_opt(main_sched)}
    if dec_lr is not None:
        dec_sched = cosine_annealing_warmup(
            total_steps, max_lr=float(dec_lr), min_lr=0.0, warmup_steps=warmup_steps
        )
        opts["dec"] = make_opt(dec_sched)
    if frozen_prefixes:
        opts["frozen"] = optax.set_to_zero()

    def default_label(path):
        top = str(path[0].key if hasattr(path[0], "key") else path[0])
        for p in frozen_prefixes:
            if top.startswith(p):
                return "frozen"
        if dec_lr is not None:
            for p in dec_prefixes:
                if top.startswith(p):
                    return "dec"
        return "main"

    label_fn = param_labels_fn or default_label

    def labeler(tree):
        import jax

        return jax.tree_util.tree_map_with_path(lambda path, _: label_fn(path), tree)

    return optax.multi_transform(opts, labeler)
