"""Device mesh and sharding helpers.

The TPU-native replacement for the reference's opt-in DDP wrapper
(train/unified_trainer.py:78-101): a jax.sharding.Mesh over ICI with
batch-sharded data parallelism; collectives are inserted by XLA under jit.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttsx.core.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    dp == -1 means "all devices not consumed by tp".
    """
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp = max(1, cfg.tp)
    dp = cfg.dp if cfg.dp > 0 else n // tp
    if dp * tp != n:
        raise ValueError(f"mesh dp*tp={dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=cfg.axis_names[:2])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with the batch axis sharded on dp."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def maybe_constrain(x, *spec_axes):
    """with_sharding_constraint(x, P(*spec_axes)) IF a context mesh with
    those axes is active (jax.set_mesh / shard_map), else identity.

    Lets models carry sharding annotations (e.g. the vocoder's band_tp
    tensor parallelism) that engage only under a Mesh — init and
    single-device paths stay annotation-free instead of raising
    "requires a non-empty mesh in context"."""
    import jax
    from jax.sharding import PartitionSpec, get_abstract_mesh

    m = get_abstract_mesh()
    if m is None or m.empty:
        return x
    names = set(m.axis_names)
    if not all(a is None or a in names for a in spec_axes):
        return x
    return jax.lax.with_sharding_constraint(x, PartitionSpec(*spec_axes))
