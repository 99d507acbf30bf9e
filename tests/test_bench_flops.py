"""Pin the two FLOP-counting pitfalls bench.py corrects for.

docs/benchmark.md "Throughput + MFU": (1) a training program counted for
MFU must return its updated params, or XLA dead-code-eliminates the whole
backward pass (measured 3x undercount on hardware); (2) XLA counts a
lax.scan body once, not x trip-count. These are backend behaviors the bench
methodology depends on — if an XLA upgrade changes them, bench.py's
corrections (and the documented MFU numbers' meaning) must be revisited.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench


def _loss(w, x):
    h = jnp.tanh(x @ w)
    return ((h @ w.T - x) ** 2).mean()


W = np.random.RandomState(0).randn(128, 128).astype(np.float32)
X = np.random.RandomState(1).randn(64, 128).astype(np.float32)


def test_backward_pass_is_dce_d_without_live_grad_output():
    @jax.jit
    def loss_only(w, x):
        loss, _ = jax.value_and_grad(_loss)(w, x)
        return loss  # grads dead -> backward eliminated

    @jax.jit
    def loss_and_grad(w, x):
        loss, g = jax.value_and_grad(_loss)(w, x)
        return loss, g

    f_dead = bench._program_flops(loss_only, W, X)
    f_live = bench._program_flops(loss_and_grad, W, X)
    if f_dead is None or f_live is None:
        pytest.skip("backend reports no cost analysis")
    # fwd ~2 matmuls, fwd+bwd ~6 — require a clear gap
    assert f_live > 1.8 * f_dead, (f_dead, f_live)


def test_scan_body_counted_once():
    K = 8

    @jax.jit
    def one(w, x):
        return _loss(w, x)

    @jax.jit
    def scanned(w, xs):
        acc, _ = jax.lax.scan(lambda c, x: (c + _loss(w, x), None), 0.0, xs)
        return acc

    XS = np.stack([X] * K)
    f1 = bench._program_flops(one, W, X)
    fk = bench._program_flops(scanned, W, XS)
    if f1 is None or fk is None:
        pytest.skip("backend reports no cost analysis")
    # if XLA ever starts multiplying by trip count, fk would be ~K*f1 and
    # bench.py's own xK scaling would double-count
    assert fk < 2.5 * f1, (f1, fk)
