"""Fused Pallas FiLM residual block (vocoder MRF stack).

Second half of the BASELINE north-star ("transposed-conv upsampling +
multi-receptive-field residual stack fuse into blocked VMEM-resident
convolutions"): the whole FiLMResidualBlock —

    h  = leaky_relu(x)
    u  = conv_k3_dilated(h)          (2C channels)
    g  = glu(u)                       a * sigmoid(b)
    g  = g * (1 + scale) + shift      (FiLM, cond pre-projected outside)
    w  = leaky_relu(g)
    y  = x + conv_k3(w)

— computed per time tile with the intermediate activations never leaving
VMEM. Each k=3 conv is three tap matmuls over a halo-extended tile; the
halo is loaded via 8-aligned pl.ds from a padded full row (Mosaic
alignment rule), and neighbor taps are static slices of the loaded value.

Parity: tests/test_ops.py::test_resblock_kernel_parity vs
ttsx.models.vocoder.FiLMResidualBlock with identical params.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_T = 512
HALO = 8  # loaded halo (aligned); must cover dilation + 1


def _make_kernel(dilation: int, t_total: int):
    def kernel(x_ref, sc_ref, sh_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               out_ref):
        """x/sc/sh: [1, 1, TILE + 2*HALO, C] pre-windowed overlapping
        tiles (materialized XLA-side — full rows at waveform rate blow
        VMEM); w1: [3, C, 2C]; w2: [3, C, C]; out: [1, TILE, C]."""
        ti = pl.program_id(1)
        L = out_ref.shape[1]
        C = out_ref.shape[2]
        d = dilation
        start = ti * L  # global tile origin (for the boundary mask)

        xv = x_ref[0, 0]                                  # [L+2H, C]
        h = jnp.where(xv > 0, xv, 0.1 * xv)

        # conv1 (k=3, dilation d) on region R = [HALO-1, HALO+L+1)
        def tap(m, off):
            lo = HALO - 1 + off
            return m[lo:lo + L + 2, :]

        u = (jnp.dot(tap(h, -d), w1_ref[0],
                     preferred_element_type=jnp.float32)
             + jnp.dot(tap(h, 0), w1_ref[1],
                       preferred_element_type=jnp.float32)
             + jnp.dot(tap(h, d), w1_ref[2],
                       preferred_element_type=jnp.float32)) + b1_ref[:]
        a = u[:, :C]
        b = u[:, C:]
        g = a * (1.0 / (1.0 + jnp.exp(-b)))               # GLU

        scv = sc_ref[0, 0]
        shv = sh_ref[0, 0]
        g = g * (1.0 + scv[HALO - 1:HALO + L + 1, :]) \
            + shv[HALO - 1:HALO + L + 1, :]               # FiLM
        w = jnp.where(g > 0, g, 0.1 * g)
        # conv2's SAME padding zero-pads the ACTIVATION in the reference
        # module — zero halo rows that fall outside [0, T)
        gpos = (start - 1
                + jax.lax.broadcasted_iota(jnp.int32, (L + 2, 1), 0))
        w = jnp.where((gpos >= 0) & (gpos < t_total), w, 0.0)

        # conv2 (k=3, dilation 1) on the center L region; w has halo 1
        v = (jnp.dot(w[0:L, :], w2_ref[0],
                     preferred_element_type=jnp.float32)
             + jnp.dot(w[1:L + 1, :], w2_ref[1],
                       preferred_element_type=jnp.float32)
             + jnp.dot(w[2:L + 2, :], w2_ref[2],
                       preferred_element_type=jnp.float32)) + b2_ref[:]
        out_ref[0] = xv[HALO:HALO + L, :] + v             # residual

    return kernel


def film_resblock_pallas(x, scale, shift, w1, b1, w2, b2, dilation: int,
                         interpret: bool = False):
    """vmap-safe wrapper (outer vmap axes fold into the kernel batch)."""
    return _get_vmap_safe(dilation, interpret)(x, scale, shift, w1, b1,
                                               w2, b2)


_VMAP_SAFE_CACHE = {}


def _get_vmap_safe(dilation: int, interpret: bool):
    key = (dilation, interpret)
    if key in _VMAP_SAFE_CACHE:
        return _VMAP_SAFE_CACHE[key]
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fn(x, scale, shift, w1, b1, w2, b2):
        return _resblock_impl(x, scale, shift, w1, b1, w2, b2, dilation,
                              interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, scale, shift, w1, b1, w2, b2):
        bc = lambda a, batched: (a if batched else jnp.broadcast_to(
            a[None], (axis_size,) + a.shape))
        if any(in_batched[3:]):
            out = jax.lax.map(lambda args: fn(*args),
                              tuple(bc(a, f) for a, f in
                                    zip((x, scale, shift, w1, b1, w2, b2),
                                        in_batched)))
            return out, True
        x, scale, shift = (bc(a, f) for a, f in
                           zip((x, scale, shift), in_batched[:3]))
        Bv, B, T, C = x.shape
        fold = lambda a: a.reshape(Bv * B, T, a.shape[-1])
        y = _resblock_impl(fold(x), fold(scale), fold(shift), w1, b1, w2,
                           b2, dilation, interpret)
        return y.reshape(Bv, B, T, C), True

    _VMAP_SAFE_CACHE[key] = fn
    return fn


@partial(jax.jit, static_argnames=("dilation", "interpret"))
def _resblock_impl(x: jnp.ndarray, scale: jnp.ndarray,
                   shift: jnp.ndarray, w1: jnp.ndarray,
                   b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
                   dilation: int, interpret: bool = False
                   ) -> jnp.ndarray:
    """x/scale/shift: [B, T, C]; w1: [3, C, 2C]; w2: [3, C, C].
    scale/shift are the FiLM Dense outputs already broadcast to x's rate.
    """
    assert dilation < HALO, "dilation must fit inside the aligned halo"
    B, T, C = x.shape
    pad_t = (-T) % TILE_T
    Tp = T + pad_t
    tiles = Tp // TILE_T

    idx = (jnp.arange(tiles)[:, None] * TILE_T
           + jnp.arange(TILE_T + 2 * HALO)[None, :])  # into padded row

    def window(a):
        ap = jnp.pad(a.astype(jnp.float32),
                     ((0, 0), (HALO, pad_t + HALO), (0, 0)))
        return ap[:, idx, :]  # [B, tiles, TILE+2H, C]

    xw, scw, shw = window(x), window(scale), window(shift)

    tile = lambda: pl.BlockSpec((1, 1, TILE_T + 2 * HALO, C),
                                lambda bi, ti: (bi, ti, 0, 0))
    out = pl.pallas_call(
        _make_kernel(dilation, T),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        grid=(B, tiles),
        in_specs=[tile(), tile(), tile(),
                  pl.BlockSpec((3, C, 2 * C), lambda bi, ti: (0, 0, 0)),
                  pl.BlockSpec((1, 2 * C), lambda bi, ti: (0, 0)),
                  pl.BlockSpec((3, C, C), lambda bi, ti: (0, 0, 0)),
                  pl.BlockSpec((1, C), lambda bi, ti: (0, 0))],
        out_specs=pl.BlockSpec((1, TILE_T, C), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(xw, scw, shw, w1.astype(jnp.float32),
      b1[None].astype(jnp.float32), w2.astype(jnp.float32),
      b2[None].astype(jnp.float32))
    return out[:, :T, :].astype(x.dtype)
