"""vmap rule for the fused resblock stack (split out for the LoC gate).

The Generator nn.vmap's BandTower over a leading band axis with PER-BAND
weights; custom_vmap routes that to either a batch-axis fold (no mesh,
shared weights) or a lax.map over the band axis (per-band weights or an
active mesh — folding a dp-sharded batch axis would force all-gathers,
CLAUDE.md invariant)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

_VMAP_SAFE_CACHE = {}


def film_resblock_stack_pallas(x, film, w1s, b1s, w2s, b2s, dilations,
                               interpret: bool = False):
    """vmap-safe fused resblock stack (outer vmap axes fold into batch).

    film may be at the waveform rate [B, T, 6C] or any coarser rate
    [B, Tf, 6C] (nearest-gathered in-kernel, `(t*Tf)//T` convention)."""
    from ttsx.ops.resblock_stack_kernel import _stack_impl

    key = (tuple(dilations), interpret)
    if key not in _VMAP_SAFE_CACHE:
        from jax.custom_batching import custom_vmap

        @custom_vmap
        def fn(x, film, w1s, b1s, w2s, b2s):
            return _stack_impl(x, film, w1s, b1s, w2s, b2s, key[0],
                               key[1])

        @fn.def_vmap
        def _rule(axis_size, in_batched, x, film, w1s, b1s, w2s, b2s):
            from jax.sharding import get_abstract_mesh

            bc = lambda a, batched: (a if batched else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape))
            # under an active mesh the batch axis may be dp-sharded:
            # folding the (replicated) vmap axis into it would force XLA
            # to reshard/all-gather activations (CLAUDE.md invariant —
            # never fold the batch axis). lax.map keeps the vmap axis
            # leading: one kernel launch per band, batch sharding intact.
            m = get_abstract_mesh()
            mesh_active = m is not None and not m.empty
            if any(in_batched[2:]) or mesh_active:
                out = jax.lax.map(
                    lambda args: fn(*args),
                    tuple(bc(a, f) for a, f in
                          zip((x, film, w1s, b1s, w2s, b2s), in_batched)))
                return out, True
            x, film = (bc(a, f) for a, f in
                       zip((x, film), in_batched[:2]))
            fold = lambda a: a.reshape((a.shape[0] * a.shape[1],)
                                       + a.shape[2:])
            y = _stack_impl(fold(x), fold(film), w1s, b1s, w2s, b2s,
                            key[0], key[1])
            return y.reshape(x.shape[:2] + y.shape[1:]), True

        _VMAP_SAFE_CACHE[key] = fn
    return _VMAP_SAFE_CACHE[key](x, film, w1s, b1s, w2s, b2s)
