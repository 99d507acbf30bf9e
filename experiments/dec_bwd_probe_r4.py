"""Round-4 probe: attack the frozen-decoder backward (VERDICT r3 #7).

The SlotFormer train step is decoder-backward-bound (docs/benchmark.md:
decoder fwd+dx ~133.6 ms chunked of a ~165 ms step). The frozen decoder
needs only dx (dW is stop_gradient'ed away already) and its backward is
HBM-bound on saved activations. Variants timed here, decoder-only at the
CLEVRER train shape (640 frames x 7 slots -> 64x64), then the winning one
through the full SlotFormer train step:

  f32          - current production path (whole batch + chunk 160)
  bf16         - decoder params + inputs cast to bf16 (halves activation
                 HBM traffic; loss accumulated in f32). NOTE round-3 found
                 explicit-bf16 conv storage ~2.5x SLOWER on the decode
                 FORWARD; this re-tests under value_and_grad where the
                 activation traffic dominates.
  chunk sweep  - bf16 may shift the optimal lax.scan chunk size.

Also prints an analytic roofline (conv MACs + saved-activation bytes vs
197 TFLOP/s bf16 peak / 819 GB/s HBM on v5e) and optionally captures a
jax.profiler trace of the full train step (SF_TRACE_DIR env).

Timing per CLAUDE.md tunneled-TPU rules: iterations folded into one jit via
lax.scan, synced by fetching a scalar.
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

F = int(os.environ.get("SF_PROBE_F", "640"))  # CLEVRER: B=64 x T_ro=10
S, D = 7, 128
RES = 64


def timed_scalar(fn, *args, iters=3):
    v = float(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    assert np.isfinite(v)
    return (time.perf_counter() - t0) / iters


def mk_dec():
    from slotformer_tpu.models.savi import SpatialBroadcastDecoder

    return SpatialBroadcastDecoder(
        resolution=(RES, RES), slot_size=D,
        dec_dict=dict(dec_channels=(128, 64, 64, 64, 64),
                      dec_resolution=(8, 8), dec_ks=5),
    )


def probe_dec_grad(results, dtype_name, nc):
    """Frozen-decoder img-recon loss fwd+dx: d(loss)/d(slots)."""
    dec = mk_dec()
    rs = np.random.RandomState(0)
    slots = jax.device_put(rs.randn(F, S, D).astype(np.float32))
    img = jax.device_put(rs.uniform(-1, 1, (F, RES, RES, 3))
                         .astype(np.float32))
    params = jax.device_put(dec.init(jax.random.PRNGKey(0), slots[:2]))
    cdt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cparams = jax.tree.map(lambda a: a.astype(cdt), params)

    def loss(s, p, i):
        s = s.reshape(F, S, D).astype(cdt)
        if nc == 1:
            rc = dec.apply(p, s)[0]
            return ((rc.astype(jnp.float32) - i) ** 2).mean()

        def body(c, xs):
            ss, ii = xs
            rc = dec.apply(p, ss)[0]
            return c + ((rc.astype(jnp.float32) - ii) ** 2).sum(), None

        sse, _ = jax.lax.scan(
            body, jnp.zeros(()),
            (s.reshape(nc, F // nc, S, D),
             i.reshape(nc, F // nc, RES, RES, 3)))
        return sse / i.size

    @jax.jit
    def k(s, p, i):
        def one(c, _):
            # thread the carry into the input: without this the body is
            # loop-invariant and XLA's while-loop LICM can hoist the whole
            # decode+grad out of the scan (first probe version measured
            # an impossible >peak FLOP rate on the bf16 variant)
            l, g = jax.value_and_grad(loss)(s + 1e-20 * c, p, i)
            return c + l + g.mean(), None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(4))
        return acc

    dt = timed_scalar(k, slots, cparams, img) / 4
    tag = f"dec_grad_{dtype_name}_c{nc}"
    results[f"{tag}_ms"] = round(dt * 1e3, 1)
    results[f"{tag}_fps"] = round(F / dt, 1)


def probe_dec_fwd(results, dtype_name):
    """Decode-only forward (the rollout/test_vp path), carry-threaded."""
    dec = mk_dec()
    rs = np.random.RandomState(0)
    slots = jax.device_put(rs.randn(F, S, D).astype(np.float32))
    params = jax.device_put(dec.init(jax.random.PRNGKey(0), slots[:2]))
    cdt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cparams = jax.tree.map(lambda a: a.astype(cdt), params)

    @jax.jit
    def k(s, p):
        def one(c, _):
            rc, _, m, _ = dec.apply(p, (s + 1e-20 * c).astype(cdt))
            return (c + rc.astype(jnp.float32).mean()
                    + m.astype(jnp.float32).mean()), None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(4))
        return acc

    dt = timed_scalar(k, slots, cparams) / 4
    results[f"dec_fwd_{dtype_name}_ms"] = round(dt * 1e3, 2)
    results[f"dec_fwd_{dtype_name}_fps"] = round(F / dt, 1)


def roofline(results):
    """Analytic MACs + activation bytes for the decode fwd+dx.

    Two FLOP counts: 'naive' multiplies the k^2 taps over the s-dilated
    input (what a dense lowering pays if zeros are not skipped);
    'algorithmic' counts only the ~k^2/s^2 nonzero taps per output of a
    stride-s transposed conv (what the phase decomposition / an ideal
    lowering pays). Real XLA sits between the two.
    """
    # per image-slot: deconv 8->16 (128->64ch, s2), 16->32 (s2), 32->64
    # (s2), 64 (s1), then the 1x1 out conv
    layers = [(16, 128, 64, 2), (32, 64, 64, 2), (64, 64, 64, 2),
              (64, 64, 64, 1)]
    naive = sum(h * h * 25 * ci * co for h, ci, co, _ in layers)
    algo = sum(h * h * (25 // (s * s) if s > 1 else 25) * ci * co
               for h, ci, co, s in layers)
    out_macs = RES * RES * 64 * 4
    act_elems = sum(h * h * co for h, _, co, _ in layers)  # saved pre-relu
    n = F * S
    for name, macs in (("naive", naive + out_macs), ("algo", algo + out_macs)):
        fwd_tf = 2 * macs * n / 1e12
        results[f"roofline_fwd_{name}_tflop"] = round(fwd_tf, 2)
        results[f"roofline_fwd_dx_{name}_tflop"] = round(2 * fwd_tf, 2)
        results[f"roofline_{name}_floor_ms_at_peak"] = round(
            2 * fwd_tf / 197 * 1e3, 1)
    for name, bytes_per in (("f32", 4), ("bf16", 2)):
        gb = act_elems * n * bytes_per / 1e9
        results[f"roofline_act_{name}_gb"] = round(gb, 2)
        # fwd writes + bwd reads acts, + dout streams of similar size
        results[f"roofline_hbm_floor_{name}_ms"] = round(
            3 * gb / 819 * 1e3, 1)


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

    trace_dir = os.environ.get("SF_TRACE_DIR")
    dt = timed_scalar(k_steps, params, opt_state) / 4
    results[f"sf_train_{tag}_ms"] = round(dt * 1e3, 1)
    results[f"sf_train_{tag}_fps"] = round(64 * 10 / dt, 1)
    if trace_dir and tag == "f32":
        with jax.profiler.trace(trace_dir):
            float(k_steps(params, opt_state))
        results["trace_dir"] = trace_dir


def probe_savi_train(results, tag, use_bf16):
    """SAVi train step (trainable decoder) f32 vs AMP (runtime/method.py's
    use_fp16 semantics: f32 master params, bf16 compute cast at the loss
    boundary)."""
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
            b = batch
            if use_bf16:
                pp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pp)
                b = jax.tree.map(lambda x: x.astype(jnp.bfloat16), b)
            losses = model.apply(
                {"params": pp}, b, method="train_loss",
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
    results[f"savi_train_{tag}_ms"] = round(dt * 1e3, 1)
    results[f"savi_train_{tag}_fps"] = round(64 * 6 / dt, 1)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = {}
    roofline(results)
    print(json.dumps(results), flush=True)
    for dtype_name in ("f32", "bf16"):
        probe_dec_fwd(results, dtype_name)
        print(json.dumps(results), flush=True)
    for dtype_name, nc in (("f32", 4), ("f32", 1), ("bf16", 1)):
        probe_dec_grad(results, dtype_name, nc)
        print(json.dumps(results), flush=True)
    probe_full_train(results, "f32", {})
    print(json.dumps(results), flush=True)
    probe_full_train(results, "bf16", {"dec_recon_bf16": True})
    print(json.dumps(results), flush=True)
    probe_full_train(results, "f32_unchunked", {"dec_chunk_frames": 0})
    print(json.dumps(results), flush=True)
    probe_savi_train(results, "f32", False)
    print(json.dumps(results), flush=True)
    probe_savi_train(results, "amp_bf16", True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
