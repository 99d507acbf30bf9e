"""A/B probe: phase-decomposed vs input-dilated transposed conv on the TPU.

XLA lowers ``ConvTranspose`` (stride s) by dilating the input with zeros
(``lhs_dilation=s``); if the MXU path multiplies those zeros, up to s^2 of
the deconv work is wasted. ``models/nn.py::_phase_conv_transpose`` computes
the same function as s*s small dense convs over the undilated input
(exactness pinned by tests/test_models.py::test_phase_deconv_matches_dilated).
This probe times the three programs the docs quote (decode forward, SAVi
train step, SlotFormer train step) both ways — toggling the
``SF_PHASE_DECONV`` env flag, which DeconvNormAct reads at trace time — and
prints a verdict; the flag's default in models/nn.py is set from this
measurement.

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


def timed_scalar(fn, *args, iters=3):
    v = float(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    assert np.isfinite(v)
    return (time.perf_counter() - t0) / iters


def mk_savi():
    from slotformer_tpu.models import StoSAVi

    return StoSAVi(
        resolution=(64, 64), clip_len=6,
        slot_dict=dict(num_slots=7, slot_size=128, slot_mlp_size=256,
                       num_iterations=2, kernel_mlp=False),
        enc_dict=dict(enc_channels=(3, 64, 64, 64, 64), enc_ks=5,
                      enc_out_channels=128),
        dec_dict=dict(dec_channels=(128, 64, 64, 64, 64),
                      dec_resolution=(8, 8), dec_ks=5),
        pred_dict=dict(pred_type="transformer", pred_rnn=True,
                       pred_norm_first=True, pred_num_layers=2,
                       pred_num_heads=4, pred_ffn_dim=512, pred_sg_every=None),
        loss_dict=dict(use_post_recon_loss=True, kld_method="var-0.01"),
    )


def probe_decode(results, name):
    """Decode-only forward: 640 frames x 7 slots -> 64x64 RGBA."""
    from slotformer_tpu.models.savi import SpatialBroadcastDecoder

    slots = jax.device_put(
        np.random.RandomState(0).randn(640, 7, 128).astype(np.float32))
    dec = SpatialBroadcastDecoder(
        resolution=(64, 64), slot_size=128,
        dec_dict=dict(dec_channels=(128, 64, 64, 64, 64),
                      dec_resolution=(8, 8), dec_ks=5),
    )
    params = dec.init(jax.random.PRNGKey(0), slots[:2])

    @jax.jit
    def k_fwd(p, s):
        def one(c, _):
            rc, _, m, _ = dec.apply(p, s)
            return c + rc.mean() + m.mean(), None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(4))
        return acc

    dt = timed_scalar(k_fwd, params, slots) / 4
    results[f"decode_fwd_{name}_ms"] = round(dt * 1e3, 2)
    results[f"decode_fwd_{name}_fps"] = round(640 / dt, 1)


def probe_train(results, model, batch, tag, rngs=("sample", "dropout"),
                frozen=()):
    variables = model.init(
        {n: jax.random.PRNGKey(i) for i, n in enumerate(("params",) + rngs)},
        batch)
    params = jax.device_put(variables["params"])
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt_state = jax.device_put(tx.init(params))
    dbatch = jax.device_put(batch)

    def one(carry, i):
        p, o = carry

        def loss_fn(pp):
            if frozen:
                pp = {k: jax.lax.stop_gradient(v) if k in frozen else v
                      for k, v in pp.items()}
            losses = model.apply(
                {"params": pp}, dbatch, method="train_loss",
                rngs={n: jax.random.fold_in(jax.random.PRNGKey(7 + j), i)
                      for j, n in enumerate(rngs)})
            return sum(jnp.asarray(v) for v in losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), o), loss

    @jax.jit
    def k_steps(p, o):
        (_, _), losses = jax.lax.scan(one, (p, o), jnp.arange(4))
        return losses[-1]

    dt = timed_scalar(k_steps, params, opt_state) / 4
    results[f"{tag}_ms"] = round(dt * 1e3, 1)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = {}
    from __graft_entry__ import _flagship_model

    rs = np.random.RandomState(0)
    savi_batch = {"img": rs.uniform(-1, 1, (64, 6, 64, 64, 3))
                  .astype(np.float32)}
    sf_batch = {"slots": rs.randn(64, 16, 7, 128).astype(np.float32),
                "img": rs.uniform(-1, 1, (64, 16, 64, 64, 3))
                .astype(np.float32)}

    for name, flag in (("dense", "0"), ("phase", "1")):
        os.environ["SF_PHASE_DECONV"] = flag  # read at trace time
        probe_decode(results, name)
        print(json.dumps(results), file=sys.stderr, flush=True)
        probe_train(results, mk_savi(), savi_batch, f"savi_train_{name}")
        print(json.dumps(results), file=sys.stderr, flush=True)
        probe_train(results, _flagship_model(), sf_batch, f"sf_train_{name}",
                    rngs=("dropout",), frozen=("decoder",))
        print(json.dumps(results), file=sys.stderr, flush=True)

    for tag in ("decode_fwd", "savi_train", "sf_train"):
        d = results.get(f"{tag}_dense_ms")
        p = results.get(f"{tag}_phase_ms")
        if d and p:
            results[f"{tag}_speedup"] = round(d / p, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
