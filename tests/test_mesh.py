"""Mesh/sharding tests on the fake 8-device CPU mesh."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from slotformer_tpu.parallel import (
    batch_sharding,
    get_mesh,
    pad_batch_to,
    param_specs,
    replicate,
    shard_batch,
    shard_params,
)


def test_mesh_shape():
    mesh = get_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_layout():
    mesh = get_mesh()
    batch = {"img": np.ones((16, 3, 8, 8), np.float32), "name": ["a"] * 16}
    sb = shard_batch(mesh, batch)
    assert sb["img"].sharding == batch_sharding(mesh)
    # each device holds 16/8 = 2 samples
    shard = sb["img"].addressable_shards[0]
    assert shard.data.shape[0] == 2
    assert sb["name"] == ["a"] * 16  # non-arrays untouched


def test_data_parallel_psum_semantics():
    """A sharded-batch jit reduction must equal the host reduction."""
    mesh = get_mesh()
    batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    x = jax.device_put(batch, batch_sharding(mesh))

    @jax.jit
    def mean_sq(x):
        return jnp.mean(x**2)

    np.testing.assert_allclose(float(mean_sq(x)), float(np.mean(batch**2)), rtol=1e-6)


def test_replicate_params():
    mesh = get_mesh()
    params = {"w": np.ones((4, 4), np.float32)}
    rp = replicate(mesh, params)
    assert rp["w"].sharding.is_fully_replicated


def test_tp_param_specs_rules():
    """Megatron rules: col-shard linear1/QKV, row-shard linear2/out;
    non-divisible dims and unmatched leaves stay replicated."""
    from jax.sharding import PartitionSpec as P

    params = {
        "transformer_encoder": {
            "layer_0": {
                "linear1": {"kernel": np.zeros((8, 32)), "bias": np.zeros((32,))},
                "linear2": {"kernel": np.zeros((32, 8)), "bias": np.zeros((8,))},
                "self_attn": {
                    "query": {"kernel": np.zeros((8, 4, 2)), "bias": np.zeros((4, 2))},
                    "out": {"kernel": np.zeros((4, 2, 8)), "bias": np.zeros((8,))},
                },
                "norm1": {"scale": np.zeros((8,)), "bias": np.zeros((8,))},
            }
        },
        "odd": {"linear1": {"kernel": np.zeros((8, 33))}},  # 33 % 2 != 0
    }
    specs = param_specs(params, n_model=2)
    layer = specs["transformer_encoder"]["layer_0"]
    assert layer["linear1"]["kernel"] == P(None, "model")
    assert layer["linear1"]["bias"] == P("model")
    assert layer["linear2"]["kernel"] == P("model", None)
    assert layer["linear2"]["bias"] == P()  # row-parallel bias replicated
    assert layer["self_attn"]["query"]["kernel"] == P(None, "model", None)
    assert layer["self_attn"]["query"]["bias"] == P("model", None)
    assert layer["self_attn"]["out"]["kernel"] == P("model", None, None)
    assert layer["norm1"]["scale"] == P()
    assert specs["odd"]["linear1"]["kernel"] == P()  # non-divisible fallback
    # n_model=1: everything replicated
    flat = jax.tree.leaves(param_specs(params, n_model=1))
    from jax.sharding import PartitionSpec
    assert all(s == PartitionSpec() for s in flat)


def test_tp_shard_params_physical():
    """shard_params must physically split matched kernels over 'model'."""
    mesh = get_mesh(n_model=2)
    params = {
        "linear1": {"kernel": np.arange(8 * 32, dtype=np.float32).reshape(8, 32)},
        "norm": {"scale": np.ones((8,), np.float32)},
    }
    placed = shard_params(mesh, params)
    k = placed["linear1"]["kernel"]
    assert k.addressable_shards[0].data.shape == (8, 16)  # split over 2
    assert placed["norm"]["scale"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(k), params["linear1"]["kernel"])


def test_pad_batch_to():
    batch = {"x": np.ones((5, 3)), "scalar": 1}
    padded, mask = pad_batch_to(batch, 8)
    assert padded["x"].shape == (8, 3)
    assert mask.sum() == 5
    same, mask2 = pad_batch_to({"x": np.ones((8, 3))}, 8)
    assert same["x"].shape == (8, 3) and mask2.all()


@pytest.mark.slow
def test_single_vs_multi_device_train_equivalence():
    """DDP-equivalence: N optimizer steps of the tiny SlotFormer on a
    1-device mesh and on the full 4x2 mesh, with the IDENTICAL global batch
    and rng keys, must produce the same final params (the property the
    reference gets from NCCL allreduce, scripts/sbatch_run.sh:36-42). Only
    f32 reduction-order noise is tolerated."""
    import os
    import sys

    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g
    from slotformer_tpu.runtime.params import BaseParams
    from slotformer_tpu.runtime.schedules import build_optimizer

    model = g._flagship_model(tiny=True)
    B, T = 8, 6
    rs = np.random.RandomState(0)
    batch = {
        "slots": rs.randn(B, T, 4, 16).astype(np.float32),
        "img": rs.uniform(-1, 1, (B, T, 16, 16, 3)).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)

    class _P(BaseParams):
        lr = 1e-3
        optimizer = "Adam"
        warmup_steps_pct = 0.1
        clip_grad = 0.05

    tx = build_optimizer(_P(), total_steps=100, frozen_prefixes=("decoder",))

    @jax.jit
    def train_step(params, opt_state, batch, step):
        def loss_fn(p):
            losses = model.apply(
                {"params": p}, batch, method="train_loss",
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(1), step)},
            )
            return sum(jnp.asarray(v) for v in losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(mesh, n_steps=3):
        # shard_params = TP placement on the 4x2 mesh, plain replication on
        # the 1-device mesh; the same suffix rules place the opt-state
        # moments (mirrors runtime/method.py)
        params = shard_params(mesh, variables["params"])
        opt_state = shard_params(mesh, jax.jit(tx.init)(params))
        sbatch = shard_batch(mesh, batch)
        losses = []
        for i in range(n_steps):
            params, opt_state, loss = train_step(params, opt_state, sbatch, i)
            losses.append(float(loss))
        return jax.device_get(params), losses

    devices = jax.devices()
    params_1, losses_1 = run(get_mesh(n_model=1, devices=devices[:1]))
    params_8, losses_8 = run(get_mesh(n_model=2, devices=devices))

    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5, atol=1e-6)
    flat_1 = jax.tree_util.tree_leaves_with_path(params_1)
    flat_8 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(params_8)
    )
    for k, v1 in flat_1:
        np.testing.assert_allclose(
            flat_8[jax.tree_util.keystr(k)], v1, rtol=1e-4, atol=1e-5,
            err_msg=f"param {jax.tree_util.keystr(k)} diverged",
        )
