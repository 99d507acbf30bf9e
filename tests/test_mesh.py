"""Mesh/sharding tests on the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from slotformer_tpu.parallel import (
    batch_sharding,
    get_mesh,
    pad_batch_to,
    replicate,
    shard_batch,
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


def test_pad_batch_to():
    batch = {"x": np.ones((5, 3)), "scalar": 1}
    padded, mask = pad_batch_to(batch, 8)
    assert padded["x"].shape == (8, 3)
    assert mask.sum() == 5
    same, mask2 = pad_batch_to({"x": np.ones((8, 3))}, 8)
    assert same["x"].shape == (8, 3) and mask2.all()
