"""Stage-resident fused Pallas FiLM residual STACK (round-3 agenda).

Round 1 fused ONE FiLMResidualBlock per pallas_call and lost 2.3x to XLA:
the pre-windowed overlapping tiles materialized 3 full halo-extended
copies of every input in HBM (ttsx/ops/resblock_kernel.py). This kernel
runs ALL resblocks of an upsampling stage (dilations 1, 3, 5) on one
VMEM-resident tile:

  * non-overlapping TILE-row blocks via BlockSpec — no overlapping
    window materialization;
  * a separate [B, tiles, 2H, C] halo array (H=16 rows per side) carries
    the neighbor context; inside the kernel the tile and its halos
    concatenate to one [TILE+2H, C] VMEM array;
  * each block computes full-width (the 2H margin rows are recomputed)
    so intermediate activations never touch HBM; with halo 16 >
    sum(d_i + 1) = 12 the center TILE rows stay exact through all blocks;
  * per-conv SAME zero-padding is emulated by masking rows whose global
    position falls outside [0, T) before every conv (the reference
    module zero-pads each block's input activation);
  * FiLM scale/shift for all blocks arrive pre-projected as one
    [B, Tf, 6C] array. Round 4: Tf may be the CONDITIONING rate (mel
    frames), not the waveform rate — the kernel then nearest-gathers
    rows in VMEM via an exact one-hot matmul (host-precomputed local
    indices, so integer semantics match the XLA `(t*Tf)//T` gather
    bit-for-bit). At the last generator stage the full-rate film array
    is 6C wide and 256x longer than the mel-rate one: shipping it
    through HBM was the kernel's largest traffic term.

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


def _pick_tile(c: int) -> int:
    """Tile rows ~inverse to channel width (constant VMEM footprint).

    The generator halves C as it upsamples 2-16x per stage: at the last
    stage (C=16, T=240k for 10 s audio) a fixed 512-row tile makes 469
    sequential grid steps per band with trivial per-step work — grid
    iterations on a TensorCore are serial, so fixed per-step overhead
    dominates device time (measured round 4: the resblock portion is
    ~21 ms of the 32.5 ms generator). Cap at 4x (2048 rows): Mosaic pads
    every [W, C] temporary to 128 lanes, so below C=32 a bigger tile no
    longer trades channels for rows — tile 4096 at C=16 OOMed scoped
    VMEM at 23.6 M vs the 16 M limit (measured; ~12 live [W, 128-lane]
    f32 temporaries ≈ W*512B*12)."""
    return int(TILE_T * max(1, min(128 // max(c, 1), 4)))


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


def _make_kernel(dilations, t_total: int, fb: int):
    """fb == 0: film arrives tiled at waveform rate (ft + fh halos).
    fb > 0: film arrives as one [fb, 6C] block per tile plus a local
    row-index map; rows are gathered by an exact one-hot matmul."""
    n_blocks = len(dilations)

    def body(x, f, inside, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        C = out_ref.shape[2]
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
        L = out_ref.shape[1]
        out_ref[0] = x[HALO:HALO + L]

    def kernel_direct(xt_ref, xh_ref, ft_ref, fh_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, out_ref):
        ti = pl.program_id(1)
        L = out_ref.shape[1]
        W = L + 2 * HALO
        xh = xh_ref[0, 0]
        x = jnp.concatenate([xh[:HALO], xt_ref[0], xh[HALO:]], axis=0)
        fh = fh_ref[0, 0]
        f = jnp.concatenate([fh[:HALO], ft_ref[0], fh[HALO:]], axis=0)
        gpos = (ti * L - HALO
                + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0))
        inside = ((gpos >= 0) & (gpos < t_total)).astype(x.dtype)
        body(x, f, inside, w1_ref, b1_ref, w2_ref, b2_ref, out_ref)

    def kernel_gather(xt_ref, xh_ref, ftile_ref, lidx_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, out_ref):
        ti = pl.program_id(1)
        L = out_ref.shape[1]
        W = L + 2 * HALO
        xh = xh_ref[0, 0]
        x = jnp.concatenate([xh[:HALO], xt_ref[0], xh[HALO:]], axis=0)
        onehot = (lidx_ref[0, 0]
                  == jax.lax.broadcasted_iota(jnp.int32, (W, fb), 1)
                  ).astype(jnp.float32)
        f = jnp.dot(onehot, ftile_ref[0, 0],
                    preferred_element_type=jnp.float32)
        gpos = (ti * L - HALO
                + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0))
        inside = ((gpos >= 0) & (gpos < t_total)).astype(x.dtype)
        body(x, f, inside, w1_ref, b1_ref, w2_ref, b2_ref, out_ref)

    return kernel_gather if fb else kernel_direct


@partial(jax.jit, static_argnames=("dilations", "interpret"))
def _stack_impl(x, film, w1s, b1s, w2s, b2s, dilations, interpret=False):
    """x: [B, T, C]; film: [B, Tf, 6C] = per-block (scale_i | shift_i)
    channel-concat, at waveform rate (Tf == T) or any coarser rate
    (rows nearest-gathered with the XLA `(t*Tf)//T` convention);
    w1s: [n, 3, C, 2C]; w2s: [n, 3, C, C]."""
    assert sum(d + 1 for d in dilations) <= HALO
    B, T, C = x.shape
    Tf = film.shape[1]
    tile_t = _pick_tile(C)
    pad_t = (-T) % tile_t
    Tp = T + pad_t
    tiles = Tp // tile_t
    W = tile_t + 2 * HALO

    def prep(a):
        ap = jnp.pad(a.astype(jnp.float32),
                     ((0, 0), (HALO, pad_t + HALO), (0, 0)))
        tile_part = ap[:, HALO:HALO + Tp]
        # halo rows for tile k: padded rows [kL, kL+H) and [(k+1)L+H,
        # (k+1)L+2H) — 2H rows per tile vs 2H + L for full windows
        idx = (jnp.arange(tiles)[:, None] * tile_t
               + jnp.concatenate([jnp.arange(HALO),
                                  tile_t + HALO + jnp.arange(HALO)])[None])
        return tile_part, ap[:, idx, :]

    xt, xh = prep(x)
    n = len(dilations)
    # film rate conversion: coarse film rides to VMEM as one compact
    # [FB, 6C] block per tile (FB ~ W*Tf/T rows) instead of a full-rate
    # [W, 6C] tile — the dominant HBM saving. FB is padded to sublanes;
    # use the coarse path only when it actually shrinks the transfer.
    fb = 0
    if Tf != T:
        fb = -((W * Tf // T + 3) // -8) * 8
        fb = min(fb, -(Tf // -8) * 8)
    if fb and fb < W // 2:
        g = (jnp.arange(tiles)[:, None] * tile_t - HALO
             + jnp.arange(W)[None])                       # [tiles, W]
        fi = jnp.clip(g, 0, T - 1) * Tf // T
        fstart = jnp.minimum(fi[:, 0], max(Tf - fb, 0))
        lidx = (fi - fstart[:, None]).astype(jnp.int32)   # [tiles, W]
        fidx = jnp.minimum(fstart[:, None] + jnp.arange(fb)[None], Tf - 1)
        ftile = film.astype(jnp.float32)[:, fidx, :]      # [B,tiles,fb,6C]
        film_args = [ftile, jnp.broadcast_to(lidx[None, :, :, None],
                                             (B, tiles, W, 1))]
        film_specs = [
            pl.BlockSpec((1, 1, fb, 6 * C), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, 1, W, 1), lambda bi, ti: (bi, ti, 0, 0)),
        ]
    else:
        fb = 0
        if Tf != T:  # coarse but not worth the gather: expand on host
            idx = jnp.clip((jnp.arange(T) * Tf) // T, 0, Tf - 1)
            film = film[:, idx, :]
        ft, fh = prep(film)
        film_args = [ft, fh]
        film_specs = [
            pl.BlockSpec((1, tile_t, 6 * C), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, 2 * HALO, 6 * C),
                         lambda bi, ti: (bi, ti, 0, 0)),
        ]

    out = pl.pallas_call(
        _make_kernel(tuple(dilations), T, fb),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((1, tile_t, C), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, 2 * HALO, C),
                         lambda bi, ti: (bi, ti, 0, 0)),
            *film_specs,
            pl.BlockSpec((n, 3, C, 2 * C), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((n, 1, 2 * C), lambda bi, ti: (0, 0, 0)),
            pl.BlockSpec((n, 3, C, C), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((n, 1, C), lambda bi, ti: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_t, C), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(xt, xh, *film_args, w1s.astype(jnp.float32),
      b1s[:, None, :].astype(jnp.float32), w2s.astype(jnp.float32),
      b2s[:, None, :].astype(jnp.float32))
    return out[:, :T, :].astype(x.dtype)


from ttsx.ops.resblock_stack_vmap import (  # noqa: E402  (re-export)
    film_resblock_stack_pallas)
