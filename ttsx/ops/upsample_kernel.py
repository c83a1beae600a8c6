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


def _upsample_kernel(xp_ref, xc_ref, xn_ref, w_prev_ref, w_cur_ref,
                     w_next_ref, b_ref, out_ref):
    """xp/xc/xn: [1, TILE, Cin] pre-shifted aligned blocks (x[t-1], x[t],
    x[t+1]); w_*: [Cin, f*Cout]; out: [1, TILE*f, Cout].

    The neighbor shift happens on the XLA side: Mosaic vector loads must
    be 8-aligned in the sublane dim, so `pl.ds(start+1, L)` is illegal.
    """
    Cout = out_ref.shape[2]
    f = w_cur_ref.shape[1] // Cout
    L = xc_ref.shape[1]
    y = (jnp.dot(xc_ref[0], w_cur_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(xn_ref[0], w_next_ref[:],
                   preferred_element_type=jnp.float32)
         + jnp.dot(xp_ref[0], w_prev_ref[:],
                   preferred_element_type=jnp.float32))
    y = y.reshape(L * f, Cout) + b_ref[:]
    out_ref[0] = jnp.where(y > 0, y, 0.1 * y)  # fused leaky-relu(0.1)


@partial(jax.jit, static_argnames=("factor", "interpret"))
def upsample_lrelu_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          factor: int, interpret: bool = False
                          ) -> jnp.ndarray:
    """x: [B, T, Cin]; w: [2f, Cin, Cout] (flax ConvTranspose layout);
    b: [Cout] -> leaky_relu(conv_transpose(x), 0.1) cropped to
    [B, T*f, Cout], matching ttsx.nn.conv.ConvTranspose1d(stride=f)."""
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

    pad_t = (-T) % TILE_T
    Tp = T + pad_t
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_t), (0, 0)))
    x_prev = jnp.pad(xf[:, :-1], ((0, 0), (1, 0), (0, 0)))
    x_next = jnp.pad(xf[:, 1:], ((0, 0), (0, 1), (0, 0)))
    tiles = Tp // TILE_T

    row = lambda: pl.BlockSpec((1, TILE_T, Cin), lambda bi, ti: (bi, ti, 0))
    wspec = lambda: pl.BlockSpec((Cin, f * Cout), lambda bi, ti: (0, 0))
    out = pl.pallas_call(
        _upsample_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp * f, Cout), jnp.float32),
        grid=(B, tiles),
        in_specs=[row(), row(), row(), wspec(), wspec(), wspec(),
                  pl.BlockSpec((1, Cout), lambda bi, ti: (0, 0))],
        out_specs=pl.BlockSpec((1, TILE_T * f, Cout),
                               lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(x_prev, xf, x_next, w_prv, w_cur, w_nxt,
      b[None, :].astype(jnp.float32))
    return out[:, :T * f, :].astype(x.dtype)
