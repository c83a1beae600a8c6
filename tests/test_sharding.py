"""Multi-device sharding tests on the 8-way virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ttsx.core.mesh import make_mesh, batch_sharding, shard_batch
from ttsx.core.config import MeshConfig
from ttsx.parallel import make_dp_mesh, shard_batch_dp, replicate, dp_train_step

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=-1, tp=1))
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(MeshConfig(dp=4, tp=2))
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(dp=3, tp=2))


def test_shard_batch_places_on_dp():
    mesh = make_dp_mesh()
    batch = {"x": jnp.arange(16.0).reshape(16, 1)}
    sharded = shard_batch_dp(batch, mesh)
    assert sharded["x"].sharding.spec == P("dp")


def test_dp_grad_allreduce_matches_single_device():
    """A dp-sharded SGD step must produce the same update as unsharded."""
    mesh = make_dp_mesh()

    def loss_fn(w, batch):
        pred = batch["x"] @ w
        return jnp.mean((pred - batch["y"]) ** 2)

    def step(w, batch):
        g = jax.grad(loss_fn)(w, batch)
        return w - 0.1 * g

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    batch = {"x": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)),
             "y": jnp.asarray(rng.normal(size=(16, 1)).astype(np.float32))}

    w_single = step(w, batch)

    wrapped = dp_train_step(lambda s, b: (step(s, b), None), mesh)
    with mesh:
        w_rep = replicate(w, mesh)
        b_shd = shard_batch_dp(batch, mesh)
        w_multi, _ = wrapped(w_rep, b_shd)

    np.testing.assert_allclose(np.asarray(w_single), np.asarray(w_multi),
                               atol=1e-5)


def test_dp_synthesis_sharded_batch():
    from ttsx.parallel import dp_synthesis
    mesh = make_dp_mesh()

    def synth(params, x):
        return jnp.tanh(x @ params)

    params = jnp.eye(4, dtype=jnp.float32)
    x = jnp.ones((8, 4), jnp.float32)
    fn = dp_synthesis(synth, mesh)
    with mesh:
        out = fn(replicate(params, mesh), shard_batch_dp(x, mesh))
    assert out.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(out), np.tanh(np.ones((8, 4))),
                               atol=1e-6)
