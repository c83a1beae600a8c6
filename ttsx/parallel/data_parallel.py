"""Data-parallel execution over a jax.sharding Mesh.

The TPU-native mapping of the reference's DDP capability (SURVEY §2.10):
params replicated, batch sharded on the 'dp' mesh axis; XLA inserts the
psum/all-reduce collectives over ICI. Also provides batched multi-utterance
synthesis serving (BASELINE.json config #5: "batched over ICI").
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttsx.core.mesh import make_mesh
from ttsx.core.config import MeshConfig


def make_dp_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return make_mesh(MeshConfig(dp=len(devices), tp=1), devices)


def shard_batch_dp(batch: Dict, mesh: Mesh) -> Dict:
    s = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def dp_train_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a pure (state, batch) -> (state, out) step for dp execution.

    state is replicated; batch is sharded on its leading axis. jit +
    shardings make XLA emit the gradient all-reduce over ICI — the
    reference's DDP bucket all-reduce, minus the buckets.
    """
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("dp"))

    def wrapped(state, batch):
        state = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, rep), state)
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, shd), batch)
        return step_fn(state, batch)

    return jax.jit(wrapped)


def dp_synthesis(synth_fn: Callable, mesh: Mesh) -> Callable:
    """Batched multi-utterance synthesis sharded over ICI (BASELINE #5)."""
    shd = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnums=())
    def wrapped(params, *batched_inputs):
        params = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, rep), params)
        inputs = tuple(
            jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, shd), b)
            for b in batched_inputs)
        return synth_fn(params, *inputs)

    return wrapped
