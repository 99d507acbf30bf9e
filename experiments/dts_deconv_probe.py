"""A/B probe: dense vs depth-to-space deconv (SF_PHASE_DECONV=2) on the
real chip — decode forward (the rollout/test_vp hot path) and the full
SlotFormer train step.

Carry-threaded repeat-4 lax.scan timing (LICM-safe, CLAUDE.md round-4
pitfall), synced by fetching a scalar. Emits one JSON line per
measurement; the decision rule for flipping the default is printed at the
end (the committed default follows the measurement — round-3 lesson).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

RES = 64
F, S = 640, 7  # decode batch: frames x slots (matches dec_bwd_probe_r4)

results = {}


def emit(**kw):
    results.update(kw)
    print(json.dumps(kw), flush=True)


def timed_scalar(fn, *args, iters=3):
    fn(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        v = float(fn(*args))  # scalar fetch = the only reliable sync
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v)
    return best


def mk_dec():
    from slotformer_tpu.models.savi import SpatialBroadcastDecoder

    return SpatialBroadcastDecoder(
        resolution=(RES, RES), slot_size=128,
        dec_dict=dict(dec_channels=(128, 64, 64, 64, 64),
                      dec_resolution=(8, 8), dec_ks=5, dec_norm=""),
    )


def probe_decode(tag, phase):
    import os

    os.environ["SF_PHASE_DECONV"] = str(phase)  # read at trace time
    dec = mk_dec()
    rs = np.random.RandomState(0)
    s = jax.device_put(rs.randn(F, S, 128).astype(np.float32))
    p = jax.device_put(
        dec.init(jax.random.PRNGKey(0), np.zeros((1, S, 128), np.float32))
    )

    @jax.jit
    def k(s, p):
        def one(c, _):
            rc, _, m, _ = dec.apply(p, s + 1e-20 * c)
            return jnp.float32(rc.mean() + m.mean()), None

        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(4))
        return acc

    dt = timed_scalar(k, s, p) / 4
    emit(**{f"decode_{tag}_ms": round(dt * 1e3, 1),
            f"decode_{tag}_fps": round(F / dt, 1)})
    return dt


def probe_train(tag, phase):
    import os

    os.environ["SF_PHASE_DECONV"] = str(phase)
    from __graft_entry__ import _flagship_model

    model = _flagship_model()
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
    emit(**{f"sf_train_{tag}_ms": round(dt * 1e3, 1),
            f"sf_train_{tag}_fps": round(64 * 16 / dt, 1)})
    return dt


def probe_savi_train(tag, phase):
    """SAVi train step — TRAINABLE decoder, so dW flows through the DTS
    weight-packing scatter too (mode 1 lost this at 0.87x)."""
    import os

    os.environ["SF_PHASE_DECONV"] = str(phase)
    from experiments.phase_deconv_probe import mk_savi

    model = mk_savi()
    rs = np.random.RandomState(0)
    batch = jax.device_put(
        {"img": rs.uniform(-1, 1, (64, 6, RES, RES, 3)).astype(np.float32)})
    rngs = ("sample", "dropout")
    variables = model.init(
        {n: jax.random.PRNGKey(i) for i, n in enumerate(("params",) + rngs)},
        batch)
    params = jax.device_put(variables["params"])
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt_state = jax.device_put(tx.init(params))

    def one(carry, i):
        p, o = carry

        def loss_fn(pp):
            losses = model.apply(
                {"params": pp}, batch, method="train_loss",
                rngs={n: jax.random.fold_in(jax.random.PRNGKey(7 + j), i)
                      for j, n in enumerate(rngs)})
            return jnp.asarray(
                sum(jnp.asarray(v) for v in losses.values()), jnp.float32)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), o), loss

    @jax.jit
    def k_steps(p, o):
        (_, _), losses = jax.lax.scan(one, (p, o), jnp.arange(4))
        return losses[-1]

    dt = timed_scalar(k_steps, params, opt_state) / 4
    emit(**{f"savi_train_{tag}_ms": round(dt * 1e3, 1),
            f"savi_train_{tag}_fps": round(64 * 6 / dt, 1)})
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    d_dense = probe_decode("dense", 0)
    d_dts = probe_decode("dts", 2)
    t_dense = probe_train("dense", 0)
    t_dts = probe_train("dts", 2)
    s_dense = probe_savi_train("dense", 0)
    s_dts = probe_savi_train("dts", 2)
    emit(decode_speedup=round(d_dense / d_dts, 3),
         sf_train_speedup=round(t_dense / t_dts, 3),
         savi_train_speedup=round(s_dense / s_dts, 3))
    win = d_dense / d_dts > 1.02 and t_dense / t_dts > 1.0
    print(f"VERDICT: {'DTS WINS — flip the default after a full bench run' if win else 'DTS does not win — keep dense default'}",
          flush=True)
