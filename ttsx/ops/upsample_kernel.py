"""Fused Pallas transposed-conv upsampling kernel (vocoder hot path).

North-star from BASELINE.json: "vocoder7's transposed-conv upsampling +
multi-receptive-field residual stack fuse into blocked VMEM-resident
convolutions". This kernel covers the ConvTranspose1d(k=2f, stride=f)
stage + bias + leaky-relu in ONE HBM pass.

Alignment (measured against flax/lax conv_transpose + the torch-style
crop c = f//2 of ttsx.nn.conv.ConvTranspose1d): an impulse at frame t
writes the REVERSED kernel starting at output t*f - c, so output
y[t*f + j] receives exactly two contributions,

  y[t'f + j] = x[t']  · w[2f-1-j-c]
             + x[t'+1]· w[3f-1-j-c]   (when j >= f-c)
             + x[t'-1]· w[ f-1-j-c]   (when j <  f-c)

With x zero-padded one frame on each side this is THREE
[L, Cin] x [Cin, f*Cout] MXU matmuls per time tile (prev/cur/next tap
banks, disjoint nonzero columns) plus an interleaving reshape — no
scatter, no overlap-add buffer; bias + leaky-relu fuse on the way out.
Parity test: tests/test_ops.py::test_upsample_kernel_parity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_T = 256


def _pick_tile(f_cout: int) -> int:
    """Tile rows ~inverse to the output row width (constant VMEM).

    Late generator stages have tiny rows (f*Cout = 32 at the last
    stage) but very long T — a fixed 256-row tile makes hundreds of
    sequential grid steps with trivial per-step work, so fixed per-step
    overhead dominates (same finding as resblock_stack_kernel round 4).
    Budget ≈1 MB for the [TILE, f*Cout] f32 output block."""
    return int(TILE_T * max(1, min(1024 // max(f_cout, 1), 8)))


def _make_kernel(apply_lrelu: bool):
    def kernel(xp_ref, xc_ref, xn_ref, w_prev_ref, w_cur_ref,
               w_next_ref, b_ref, out_ref):
        _upsample_body(xp_ref, xc_ref, xn_ref, w_prev_ref, w_cur_ref,
                       w_next_ref, b_ref, out_ref, apply_lrelu)
    return kernel


def _upsample_body(xp_ref, xc_ref, xn_ref, w_prev_ref, w_cur_ref,
                   w_next_ref, b_ref, out_ref, apply_lrelu):
    """xp/xc/xn: [1, TILE, Cin] pre-shifted aligned blocks (x[t-1], x[t],
    x[t+1]); w_*: [Cin, f*Cout]; out: [1, TILE*f, Cout].

    The neighbor shift happens on the XLA side: Mosaic vector loads must
    be 8-aligned in the sublane dim, so `pl.ds(start+1, L)` is illegal.
    """
    # output stays [L, f*Cout]; the interleave reshape to [L*f, Cout]
    # happens outside the kernel (Mosaic rejects lane-splitting reshapes
    # when Cout < the 128-lane width; XLA fuses the reshape for free)
    y = (jnp.dot(xc_ref[0], w_cur_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(xn_ref[0], w_next_ref[:],
                   preferred_element_type=jnp.float32)
         + jnp.dot(xp_ref[0], w_prev_ref[:],
                   preferred_element_type=jnp.float32))
    y = y + b_ref[:]  # b tiled to [1, f*Cout]
    if apply_lrelu:
        y = jnp.where(y > 0, y, 0.1 * y)  # fused leaky-relu(0.1)
    out_ref[0] = y


def upsample_lrelu_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          factor: int, interpret: bool = False,
                          lrelu: bool = True) -> jnp.ndarray:
    """vmap-safe wrapper: Mosaic rejects the default pallas batching rule
    for this kernel (shape-cast in the interleave reshape), so outer vmap
    axes (e.g. the generator's band axis) are folded into the kernel's own
    batch grid dimension via a custom_vmap rule."""
    fn = _get_vmap_safe(factor, interpret, lrelu)
    return fn(x, w, b)


@partial(jax.jit, static_argnames=("factor", "interpret", "lrelu"))
def _upsample_impl(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   factor: int, interpret: bool = False,
                   lrelu: bool = True) -> jnp.ndarray:
    """x: [B, T, Cin]; w: [2f, Cin, Cout] (flax ConvTranspose layout);
    b: [Cout] -> [leaky_relu(0.1)] conv_transpose(x) cropped to
    [B, T*f, Cout], matching ttsx.nn.conv.ConvTranspose1d(stride=f).
    Set lrelu=False for a bare ConvT (when the consumer applies its own
    activation, e.g. FiLMResidualBlock's entry leaky-relu)."""
    B, T, Cin = x.shape
    k, _, Cout = w.shape
    f = factor
    assert k == 2 * f, "kernel must be 2*stride"

    c = f // 2
    zeros = jnp.zeros_like(w[0])
    cur, nxt, prv = [], [], []
    for j in range(f):
        i_cur = 2 * f - 1 - j - c
        i_nxt = 3 * f - 1 - j - c
        i_prv = f - 1 - j - c
        cur.append(w[i_cur] if 0 <= i_cur < k else zeros)
        nxt.append(w[i_nxt] if 0 <= i_nxt < k else zeros)
        prv.append(w[i_prv] if 0 <= i_prv < k else zeros)
    w_cur = jnp.stack(cur, axis=1).reshape(Cin, f * Cout)
    w_nxt = jnp.stack(nxt, axis=1).reshape(Cin, f * Cout)
    w_prv = jnp.stack(prv, axis=1).reshape(Cin, f * Cout)

    tile_t = _pick_tile(f * Cout)
    pad_t = (-T) % tile_t
    Tp = T + pad_t
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_t), (0, 0)))
    x_prev = jnp.pad(xf[:, :-1], ((0, 0), (1, 0), (0, 0)))
    x_next = jnp.pad(xf[:, 1:], ((0, 0), (0, 1), (0, 0)))
    tiles = Tp // tile_t

    b_tiled = jnp.tile(b.astype(jnp.float32), (f,))[None, :]

    row = lambda: pl.BlockSpec((1, tile_t, Cin), lambda bi, ti: (bi, ti, 0))
    wspec = lambda: pl.BlockSpec((Cin, f * Cout), lambda bi, ti: (0, 0))
    out = pl.pallas_call(
        _make_kernel(lrelu),
        out_shape=jax.ShapeDtypeStruct((B, Tp, f * Cout), jnp.float32),
        grid=(B, tiles),
        in_specs=[row(), row(), row(), wspec(), wspec(), wspec(),
                  pl.BlockSpec((1, f * Cout), lambda bi, ti: (0, 0))],
        out_specs=pl.BlockSpec((1, tile_t, f * Cout),
                               lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(x_prev, xf, x_next, w_prv, w_cur, w_nxt, b_tiled)
    out = out.reshape(B, Tp * f, Cout)
    return out[:, :T * f, :].astype(x.dtype)


_VMAP_SAFE_CACHE = {}


def _get_vmap_safe(factor: int, interpret: bool, lrelu: bool):
    key = (factor, interpret, lrelu)
    if key in _VMAP_SAFE_CACHE:
        return _VMAP_SAFE_CACHE[key]

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fn(x, w, b):
        return _upsample_impl(x, w, b, factor, interpret, lrelu)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, w, b):
        xb, wb, bb = in_batched
        if not xb:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        if wb or bb:
            # batched weights: sequential fallback (never hit by the
            # generator's shared-tower vmap)
            out = jax.lax.map(lambda args: fn(*args), (x, w, b))
            return out, True
        Bv, B, T, Cin = x.shape
        y = _upsample_impl(x.reshape(Bv * B, T, Cin), w, b, factor,
                           interpret, lrelu)
        return y.reshape(Bv, B, y.shape[1], y.shape[2]), True

    _VMAP_SAFE_CACHE[key] = fn
    return fn
