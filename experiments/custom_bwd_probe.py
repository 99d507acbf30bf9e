"""Round-5 probe: the custom-backward frozen-decoder loss on hardware.

Compares (CLEVRER train shape, F=640 frames x 7 slots -> 64x64):
  dec_grad_custom      - decoder-only fwd+d(slots) through
                         ops.frozen_decoder_loss (bool relu-mask residuals,
                         linear_transpose backward) vs round-5 measured
                         f32-chunked 137.8 ms / bf16 162.1 ms
                         (logs/dec_bwd_probe_r5.log)
  sf_train_custom      - full SlotFormer train step with dec_custom_bwd vs
                         the f32+chunk-160 default (166.7 ms)

Timing per CLAUDE.md tunneled-TPU rules: iterations folded into one jit
lax.scan whose body DEPENDS on the carry; synced by fetching a scalar.

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

F = int(os.environ.get("SF_PROBE_F", "640"))
S, D = 7, 128
RES = 64


def timed_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    assert np.isfinite(v)
    return (time.perf_counter() - t0) / iters


def probe_dec_grad_custom(results, nc):
    from slotformer_tpu.models.savi import SpatialBroadcastDecoder
    from slotformer_tpu.ops.frozen_decoder_loss import (
        frozen_decoder_recon_loss,
    )

    dec = SpatialBroadcastDecoder(
        resolution=(RES, RES), slot_size=D,
        dec_dict=dict(dec_channels=(128, 64, 64, 64, 64),
                      dec_resolution=(8, 8), dec_ks=5),
    )
    rs = np.random.RandomState(0)
    slots = jax.device_put(rs.randn(F, S, D).astype(np.float32))
    img = jax.device_put(
        rs.uniform(-1, 1, (F, RES, RES, 3)).astype(np.float32))
    params = jax.device_put(dec.init(jax.random.PRNGKey(0), slots[:2]))["params"]
    w = jnp.ones((F,), jnp.float32)
    denom = jnp.asarray(float(F * RES * RES * 3), jnp.float32)
    cfg = ((128, 64, 64, 64, 64), (8, 8), (RES, RES), 5)

    def loss(s, p, i):
        if nc == 1:
            return frozen_decoder_recon_loss(p, s, i, w, denom, cfg, S)

        def body(c, xs):
            ss, ii, ww = xs
            return c + frozen_decoder_recon_loss(
                p, ss, ii, ww, denom, cfg, S), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(()),
            (s.reshape(nc, F // nc, S, D),
             i.reshape(nc, F // nc, RES, RES, 3),
             w.reshape(nc, F // nc)))
        return acc

    @jax.jit
    def k(s, p, i):
        def one(c, _):
            l, g = jax.value_and_grad(loss)(s + 1e-20 * c, p, i)
            return c + l + g.mean(), None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(4))
        return acc

    dt = timed_scalar(k, slots, params, img) / 4
    results[f"dec_grad_custom_c{nc}_ms"] = round(dt * 1e3, 1)
    results[f"dec_grad_custom_c{nc}_fps"] = round(F / dt, 1)


def probe_full_train(results, tag, loss_extra):
    from __graft_entry__ import _flagship_model

    model = _flagship_model(**loss_extra)
    rs = np.random.RandomState(0)
    batch = jax.device_put(
        {"slots": rs.randn(64, 16, 7, 128).astype(np.float32),
         "img": rs.uniform(-1, 1, (64, 16, RES, RES, 3)).astype(np.float32)})
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)
    params = jax.device_put(variables["params"])
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt_state = jax.device_put(tx.init(params))

    def one(carry, i):
        p, o = carry

        def loss_fn(pp):
            pp = {k: jax.lax.stop_gradient(v) if k == "decoder" else v
                  for k, v in pp.items()}
            losses = model.apply(
                {"params": pp}, batch, method="train_loss",
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)})
            return sum(jnp.asarray(v) for v in losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), o), loss

    @jax.jit
    def k_steps(p, o):
        (_, _), losses = jax.lax.scan(one, (p, o), jnp.arange(4))
        return losses[-1]

    dt = timed_scalar(k_steps, params, opt_state) / 4
    results[f"sf_train_{tag}_ms"] = round(dt * 1e3, 1)
    results[f"sf_train_{tag}_fps"] = round(64 * 10 / dt, 1)
    trace_dir = os.environ.get("SF_TRACE_DIR")
    if trace_dir and tag == "custom":
        with jax.profiler.trace(os.path.join(trace_dir, tag)):
            float(k_steps(params, opt_state))
        results["trace_dir"] = trace_dir


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = {}
    for nc in (4, 8, 2, 1):
        probe_dec_grad_custom(results, nc)
        print(json.dumps(results), flush=True)
    probe_full_train(results, "f32_default", {})
    print(json.dumps(results), flush=True)
    # dec_custom_bwd now composes with dec_chunk_frames (default 160 -> 4
    # chunks at F=640)
    probe_full_train(results, "custom_c4", {"dec_custom_bwd": True})
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
