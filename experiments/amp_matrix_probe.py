"""Round-5 probe: f32 vs AMP (bf16 compute) train-step time for the model
families the precision table does not yet cover — STEVE, dVAE, and the
Aloe VQA head (SAVi and SlotFormer were measured in
logs/dec_bwd_probe_r5.log / sf_bf16_ab_r5.log).

Shapes are the reference training configs:
  STEVE  — Physion 128x128, batch 48, T=6, 6 slots x 192, frozen dVAE
           (reference base_slots/configs/steve_physion_params.py; trained
           with --fp16 upstream, scripts/train.py:72)
  dVAE   — Physion 128x128, batch 64, single frames, vocab 4096
           (base_slots/configs/dvae_physion_params.py)
  Aloe   — CLEVRER rows, batch 256, (6+1) slots x 25 frames + 32 text
           tokens, 12 layers x d_model 144
           (clevrer_vqa/configs/aloe_clevrer_params.py)

AMP here is THE trainer cast (runtime.to_bf16 imported, not re-derived):
f32 master params + bf16 compute at the loss boundary, f32 loss reduction
— identical semantics to `cli.train --fp16`.

Timing per CLAUDE.md tunneled-TPU rules: K optimizer steps folded into one
jit lax.scan whose body threads (params, opt_state) through the carry (so
LICM cannot hoist it), synced by fetching a scalar.

NOTE: bench.py's time_train is the SOURCE OF TRUTH for this K-step
scan timing harness; this probe carries a frozen copy so its logged
numbers stay reproducible as measured. If the harness methodology
changes in bench.py, re-measure rather than assume these logs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

KT = 4
# CPU smoke mode: shrink every leg to trace-check the probe end-to-end
TINY = bool(int(os.environ.get("SF_PROBE_TINY", "0") or 0))


def timed_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    assert np.isfinite(v), v
    return (time.perf_counter() - t0) / iters


def time_train(model, batch, rng_names=("sample", "dropout"), frozen=(),
               use_bf16=False, train_loss_kwargs=None):
    """One jitted K-step training scan; returns seconds per optimizer step."""
    variables = model.init(
        {n: jax.random.PRNGKey(i)
         for i, n in enumerate(("params",) + tuple(rng_names))},
        batch,
    )
    params = jax.device_put(variables["params"])
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt_state = jax.device_put(tx.init(params))
    dbatch = jax.device_put(batch)
    kwargs = train_loss_kwargs or {}

    def one(carry, i):
        p, o = carry

        def loss_fn(pp):
            if frozen:
                pp = {k: jax.lax.stop_gradient(v) if k in frozen else v
                      for k, v in pp.items()}
            b = dbatch
            if use_bf16:
                # THE trainer cast — imported so the measured program
                # cannot drift from --fp16 semantics
                from slotformer_tpu.runtime import to_bf16
                pp, b = to_bf16(pp), to_bf16(b)
            losses = model.apply(
                {"params": pp}, b, method="train_loss",
                rngs={n: jax.random.fold_in(jax.random.PRNGKey(7 + j), i)
                      for j, n in enumerate(rng_names)},
                **kwargs,
            )
            return jnp.asarray(
                sum(jnp.asarray(v, jnp.float32) for v in losses.values()),
                jnp.float32)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), o), loss

    @jax.jit
    def k_steps(p, o):
        (p, o), losses = jax.lax.scan(one, (p, o), jnp.arange(KT))
        return losses[-1]

    return timed_scalar(k_steps, params, opt_state) / KT


def probe_steve(results):
    """STEVE legs. First r7b attempt showed the reference batch (48) does
    NOT fit a 16 GB v5e in f32 (XLA: 'Used 30.54G of 15.75G hbm',
    amp_matrix_probe_r5_steve.log) — the reference itself trains STEVE
    fp16 on 40 GB A100s. So: a matched-batch speed A/B at bs that fits
    both, plus a capacity sweep showing the largest batch each precision
    fits."""
    from slotformer_tpu.models.steve import STEVE

    t, res, d = (2, 32, 32) if TINY else (6, 128, 192)
    vocab = 64 if TINY else 4096
    model = STEVE(
        resolution=(res, res), clip_len=t,
        slot_dict=dict(num_slots=6, slot_size=d, slot_mlp_size=2 * d,
                       num_iterations=2),
        enc_dict=dict(enc_channels=(3, 64, 64, 64, 64), enc_ks=5,
                      enc_out_channels=d, enc_norm=""),
        dvae_dict=dict(down_factor=4, vocab_size=vocab),
        dec_dict=dict(dec_num_layers=4, dec_num_heads=4, dec_d_model=d),
        pred_dict=dict(pred_type="transformer", pred_rnn=True,
                       pred_norm_first=True, pred_num_layers=2,
                       pred_num_heads=4, pred_ffn_dim=4 * d,
                       pred_sg_every=None),
        loss_dict=dict(use_img_recon_loss=False),
    )

    def run(tag, bs, amp):
        batch = {"img": np.random.RandomState(0)
                 .uniform(-1, 1, (bs, t, res, res, 3)).astype(np.float32)}
        try:
            dt = time_train(model, batch, frozen=("dvae",), use_bf16=amp)
        except Exception as e:  # noqa: BLE001 — OOM arrives as JaxRuntimeError
            if "memory" not in str(e).lower() and "hbm" not in str(e).lower():
                raise
            results[f"steve_train_{tag}"] = "OOM"
            print(json.dumps(results), flush=True)
            return False
        results[f"steve_train_{tag}_ms"] = round(dt * 1e3, 1)
        results[f"steve_train_{tag}_fps"] = round(bs * t / dt, 1)
        print(json.dumps(results), flush=True)
        return True

    if TINY:
        run("f32_b2", 2, False)
        run("amp_bf16_b2", 2, True)
        return
    # matched-batch speed A/B (b16 ≈ 10 GB f32 by linear scaling)
    run("f32_b16", 16, False)
    run("amp_bf16_b16", 16, True)
    # capacity: reference batch is 48; f32@48 measured OOM on the first
    # attempt — re-record it cheaply is NOT worth a 30 s AOT compile, so
    # stamp it from that run and sweep AMP downward from 48.
    results["steve_train_f32_b48"] = "OOM (30.54G of 15.75G hbm, r7b run 1)"
    print(json.dumps(results), flush=True)
    for bs in (48, 32, 24):
        if run(f"amp_bf16_b{bs}", bs, True):
            break


def probe_dvae(results):
    from slotformer_tpu.models.dvae import dVAE

    bs, res = (2, 32) if TINY else (64, 128)
    model = dVAE(vocab_size=64 if TINY else 4096, img_channels=3)
    batch = {"img": np.random.RandomState(0)
             .uniform(-1, 1, (bs, res, res, 3)).astype(np.float32)}
    for tag, amp in (("f32", False), ("amp_bf16", True)):
        dt = time_train(model, batch, rng_names=("sample",), use_bf16=amp,
                        train_loss_kwargs=dict(tau=0.5, hard=False))
        results[f"dvae_train_{tag}_ms"] = round(dt * 1e3, 1)
        results[f"dvae_train_{tag}_fps"] = round(bs / dt, 1)
        print(json.dumps(results), flush=True)


def probe_aloe(results):
    from slotformer_tpu.models.aloe import CLEVRERAloe

    bs, t, n, c, lq, lc = (4, 3, 7, 16, 20, 12) if TINY else \
        (256, 25, 7, 128, 20, 12)
    model = CLEVRERAloe(
        transformer_dict=dict(input_len=n * t + lq + lc, input_dim=16,
                              pos_enc="learnable", num_layers=12,
                              num_heads=8, ffn_dim=512, norm_first=True,
                              cls_mlp_size=128),
        lang_dict=dict(question_len=lq, question_vocab_size=82,
                       answer_vocab_size=22),
        vision_dict=dict(vision_dim=c),
        loss_dict=dict(use_mask_obj_loss=False),
    )
    rs = np.random.RandomState(0)
    batch = {
        "video_emb": rs.randn(bs, t, n, c).astype(np.float32),
        "q_tokens": rs.randint(1, 82, (bs, lq + lc)).astype(np.int32),
        "q_pad_mask": np.zeros((bs, lq + lc), bool),
        "is_cls": (rs.rand(bs) < 0.5),
        "label": rs.randint(0, 2, (bs,)).astype(np.int32),
    }
    for tag, amp in (("f32", False), ("amp_bf16", True)):
        dt = time_train(model, batch, rng_names=("dropout",), use_bf16=amp)
        results[f"aloe_train_{tag}_ms"] = round(dt * 1e3, 1)
        results[f"aloe_train_{tag}_rows_ps"] = round(bs / dt, 1)
        print(json.dumps(results), flush=True)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = {}
    # Resumable leg selection: a killed run (observed round 5 — the dVAE and
    # Aloe legs finished, the STEVE leg never started) can be completed with
    # SF_PROBE_LEGS=steve instead of re-spending the measured legs' window.
    legs = os.environ.get("SF_PROBE_LEGS", "dvae,aloe,steve").split(",")
    probes = {"dvae": probe_dvae, "aloe": probe_aloe, "steve": probe_steve}
    for leg in legs:
        probes[leg.strip()](results)


if __name__ == "__main__":
    main()
