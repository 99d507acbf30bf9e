"""Benchmark fused whole-loop slot-attention Pallas kernel vs XLA on TPU.

CLEVRER shapes: B=64, N=64*64=4096, D=128, S=7, 2 iterations.
Tunnel notes (CLAUDE.md): fold reps into one lax.scan jit, sync via scalar.
"""
import functools
import time

import jax
import jax.numpy as jnp

from slotformer_tpu.ops.slot_attention_kernel import (
    fused_slot_attention, fused_reference)

B, N, D, S, ITERS = 64, 4096, 128, 7, 2
H = 256  # mlp hidden (reference CLEVRER savi: slot_mlp_size=256)
REPS = 50

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 24)
k = jax.random.normal(ks[0], (B, N, D), jnp.float32)
v = jax.random.normal(ks[1], (B, N, D), jnp.float32)
slots = jax.random.normal(ks[2], (B, S, D), jnp.float32)
wp = dict(
    q_ln_scale=jnp.ones((D,)), q_ln_bias=jnp.zeros((D,)),
    wq=jax.random.normal(ks[3], (D, D)) * 0.05,
    w_ir=jax.random.normal(ks[4], (D, D)) * 0.05,
    w_iz=jax.random.normal(ks[5], (D, D)) * 0.05,
    w_in=jax.random.normal(ks[6], (D, D)) * 0.05,
    w_hr=jax.random.normal(ks[7], (D, D)) * 0.05,
    w_hz=jax.random.normal(ks[8], (D, D)) * 0.05,
    w_hn=jax.random.normal(ks[9], (D, D)) * 0.05,
    b_ir=jnp.zeros((D,)), b_iz=jnp.zeros((D,)), b_in=jnp.zeros((D,)),
    b_hn=jnp.zeros((D,)),
    mlp_ln_scale=jnp.ones((D,)), mlp_ln_bias=jnp.zeros((D,)),
    w1=jax.random.normal(ks[10], (D, H)) * 0.05, b1=jnp.zeros((H,)),
    w2=jax.random.normal(ks[11], (H, D)) * 0.05, b2=jnp.zeros((D,)),
)

scale = D ** -0.5


def scan_bench(fn):
    """Run fn REPS times inside one jit, return a scalar to sync on."""
    @jax.jit
    def run(k, v, slots):
        def body(c, _):
            h, attn = fn(k, v, c)
            return h, jnp.sum(attn[0, 0])
        h, sums = jax.lax.scan(body, slots, None, length=REPS)
        return jnp.sum(h) + jnp.sum(sums)
    return run


fns = {
    "pallas_fused": lambda k, v, s: fused_slot_attention(
        k, v, s, wp, ITERS, S, scale, 1e-6, False),
    "xla": lambda k, v, s: fused_reference(
        k, v, s, wp, ITERS, S, scale, 1e-6),
}

print(f"backend={jax.default_backend()} devices={jax.devices()}")
results = {}
for name, fn in fns.items():
    run = scan_bench(fn)
    # compile + warmup
    float(run(k, v, slots))
    t0 = time.perf_counter()
    out = float(run(k, v, slots))
    dt = time.perf_counter() - t0
    per = dt / REPS * 1e3
    results[name] = per
    print(f"{name}: {per:.3f} ms/call  (out={out:.4f})")

# parity check
h1, a1 = fns["pallas_fused"](k, v, slots)
h2, a2 = fns["xla"](k, v, slots)
print("max diff slots:", float(jnp.max(jnp.abs(h1 - h2))),
      "attn:", float(jnp.max(jnp.abs(a1 - a2))))
print(f"speedup pallas vs xla: {results['xla'] / results['pallas_fused']:.3f}x")
