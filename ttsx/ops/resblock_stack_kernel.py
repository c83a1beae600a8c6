"""Stage-resident fused Pallas FiLM residual STACK (round-3 agenda).

Round 1 fused ONE FiLMResidualBlock per pallas_call and lost 2.3x to XLA:
the pre-windowed overlapping tiles materialized 3 full halo-extended
copies of every input in HBM (ttsx/ops/resblock_kernel.py). This kernel
runs ALL resblocks of an upsampling stage (dilations 1, 3, 5) on one
VMEM-resident tile:

  * non-overlapping TILE-row blocks via BlockSpec — no overlapping
    window materialization;
  * a separate [B, tiles, 2H, C] halo array (H=16 rows per side, 6% of
    the tile) carries the neighbor context; inside the kernel the tile
    and its halos concatenate to one [TILE+2H, C] VMEM array;
  * each block computes full-width (the 2H margin rows are recomputed —
    6% extra FLOPs) so intermediate activations never touch HBM; with
    halo 16 > sum(d_i + 1) = 12 the center TILE rows stay exact through
    all three blocks;
  * per-conv SAME zero-padding is emulated by masking rows whose global
    position falls outside [0, T) before every conv (the reference
    module zero-pads each block's input activation);
  * FiLM scale/shift for all blocks arrive pre-projected as one
    [B, T, 6C] array (slice per block in-kernel, like the GLU split).

Weight layout per block i: w1s[i] [3, C, 2C] (k=3 conv, dilation d_i),
w2s[i] [3, C, C] (k=3, dilation 1) — identical tap convention to
resblock_kernel.py (tap k pairs offset (k-1)*d).

Parity: tests/test_ops.py::test_resblock_stack_kernel_parity vs the
chained ttsx.models.vocoder.FiLMResidualBlock XLA path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_T = 512
HALO = 16  # rows per side; must exceed sum(d_i + 1) over the stack


def _shift_up(h, s):
    """rows r -> h[r - s] (prepend s zero rows)."""
    if s == 0:
        return h
    return jnp.concatenate([jnp.zeros((s, h.shape[1]), h.dtype), h[:-s]])


def _shift_down(h, s):
    """rows r -> h[r + s] (drop first s rows, append zeros)."""
    if s == 0:
        return h
    return jnp.concatenate([h[s:], jnp.zeros((s, h.shape[1]), h.dtype)])


def _make_kernel(dilations, t_total: int):
    n_blocks = len(dilations)

    def kernel(xt_ref, xh_ref, ft_ref, fh_ref, w1_ref, b1_ref, w2_ref,
               b2_ref, out_ref):
        """xt: [1, TILE, C]; xh: [1, 1, 2H, C]; ft: [1, TILE, 6C];
        fh: [1, 1, 2H, 6C]; w1: [n, 3, C, 2C]; b1: [n, 1, 2C];
        w2: [n, 3, C, C]; b2: [n, 1, C]; out: [1, TILE, C]."""
        ti = pl.program_id(1)
        L = out_ref.shape[1]
        C = out_ref.shape[2]
        W = L + 2 * HALO

        xh = xh_ref[0, 0]
        x = jnp.concatenate([xh[:HALO], xt_ref[0], xh[HALO:]], axis=0)
        fh = fh_ref[0, 0]
        f = jnp.concatenate([fh[:HALO], ft_ref[0], fh[HALO:]], axis=0)

        # SAME-padding mask: rows whose global position is outside [0, T)
        gpos = (ti * L - HALO
                + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0))
        inside = ((gpos >= 0) & (gpos < t_total)).astype(x.dtype)

        for i in range(n_blocks):
            d = dilations[i]
            h = jnp.where(x > 0, x, 0.1 * x) * inside
            u = (jnp.dot(_shift_up(h, d), w1_ref[i, 0],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h, w1_ref[i, 1],
                           preferred_element_type=jnp.float32)
                 + jnp.dot(_shift_down(h, d), w1_ref[i, 2],
                           preferred_element_type=jnp.float32)
                 ) + b1_ref[i]
            a = u[:, :C]
            b = u[:, C:]
            g = a * (1.0 / (1.0 + jnp.exp(-b)))              # GLU
            sc = f[:, 2 * i * C:(2 * i + 1) * C]
            sh = f[:, (2 * i + 1) * C:(2 * i + 2) * C]
            g = g * (1.0 + sc) + sh                          # FiLM
            w = jnp.where(g > 0, g, 0.1 * g) * inside
            v = (jnp.dot(_shift_up(w, 1), w2_ref[i, 0],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(w, w2_ref[i, 1],
                           preferred_element_type=jnp.float32)
                 + jnp.dot(_shift_down(w, 1), w2_ref[i, 2],
                           preferred_element_type=jnp.float32)
                 ) + b2_ref[i]
            x = x + v                                        # residual

        out_ref[0] = x[HALO:HALO + L]

    return kernel


@partial(jax.jit, static_argnames=("dilations", "interpret"))
def _stack_impl(x, film, w1s, b1s, w2s, b2s, dilations, interpret=False):
    """x: [B, T, C]; film: [B, T, 6C] = per-block (scale_i | shift_i)
    channel-concat; w1s: [n, 3, C, 2C]; w2s: [n, 3, C, C]."""
    assert sum(d + 1 for d in dilations) <= HALO
    B, T, C = x.shape
    pad_t = (-T) % TILE_T
    Tp = T + pad_t
    tiles = Tp // TILE_T

    def prep(a):
        ap = jnp.pad(a.astype(jnp.float32),
                     ((0, 0), (HALO, pad_t + HALO), (0, 0)))
        tile_part = ap[:, HALO:HALO + Tp]
        # halo rows for tile k: padded rows [kL, kL+H) and [ (k+1)L+H,
        # (k+1)L+2H ) — 2H rows per tile vs 2H + L for full windows
        idx = (jnp.arange(tiles)[:, None] * TILE_T
               + jnp.concatenate([jnp.arange(HALO),
                                  TILE_T + HALO + jnp.arange(HALO)])[None])
        return tile_part, ap[:, idx, :]

    xt, xh = prep(x)
    ft, fh = prep(film)
    n = len(dilations)

    out = pl.pallas_call(
        _make_kernel(tuple(dilations), T),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_T, C), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, 2 * HALO, C),
                         lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, TILE_T, 6 * C), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, 2 * HALO, 6 * C),
                         lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((n, 3, C, 2 * C), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((n, 1, 2 * C), lambda bi, ti: (0, 0, 0)),
            pl.BlockSpec((n, 3, C, C), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((n, 1, C), lambda bi, ti: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, C), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(xt, xh, ft, fh, w1s.astype(jnp.float32),
      b1s[:, None, :].astype(jnp.float32), w2s.astype(jnp.float32),
      b2s[:, None, :].astype(jnp.float32))
    return out[:, :T, :].astype(x.dtype)


_VMAP_SAFE_CACHE = {}


def film_resblock_stack_pallas(x, film, w1s, b1s, w2s, b2s, dilations,
                               interpret: bool = False):
    """vmap-safe fused resblock stack (outer vmap axes fold into batch)."""
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
            Bv, B, T, C = x.shape
            fold = lambda a: a.reshape(Bv * B, T, a.shape[-1])
            y = _stack_impl(fold(x), fold(film), w1s, b1s, w2s, b2s,
                            key[0], key[1])
            return y.reshape(Bv, B, T, C), True

        _VMAP_SAFE_CACHE[key] = fn
    return _VMAP_SAFE_CACHE[key](x, film, w1s, b1s, w2s, b2s)
