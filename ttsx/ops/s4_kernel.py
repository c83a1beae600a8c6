"""Pallas chunked-scan kernel for the diagonal S4 SSM.

North-star kernel from BASELINE.json ("prosody3's S4 state-space layers run
as an associative-scan kernel"). The jnp associative-scan path
(ttsx/nn/s4.py scan_dw_conv) materializes [B, T, C, d] states in HBM; this
kernel carries the state in VMEM across a sequential grid over time chunks
— states never touch HBM.

Within a chunk of length L the recurrence is evaluated in closed form as
MXU matmuls (TPU Pallas has no dynamic row stores, and per-step scalar
loops would starve the MXU). With s0 the carry-in state and
E[t] = exp(a)^t per mode:

  y[t, (h,e)] = sum_d C[h,d,e] * ( E[t+1] * s0[(h,e), d]           (carry)
              + sum_{s<=t} E[t-s] * b * u[s, (h,e)] )              (local)

  local per mode d:   inner_d = Tri_d @ u_h        [L,L]x[L,e] MXU matmul
  carry per mode d:   outer(epow, s0_d)            VPU
  next state:         s_L = E[L]*s0 + Tri_d[L-1] @ u_h

Grid: (B, n_chunks, H) — TPU grid steps run sequentially, so the VMEM
scratch state persists across chunks; it is zeroed at each batch row's
first chunk. Mode Toeplitz blocks are tiled per head to stay in VMEM.

`s4_scan(...)` falls back to the jnp associative scan off-TPU;
`interpret=True` runs the same kernel on CPU for the parity tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _s4_head_kernel(u_ref, tri_ref, epow_ref, c_ref, y_ref, state_ref):
    """One (batch, chunk, head) grid step.

    u_ref:    [1, CHUNK, e]     this head's input block
    tri_ref:  [1, d, CHUNK, CHUNK]  lower-tri decay Toeplitz per mode
    epow_ref: [1, CHUNK + 1, d] E[t+1] rows; row CHUNK holds E[CHUNK]
    c_ref:    [1, d, e]         readout for this head
    y_ref:    [1, CHUNK, e]     output block
    state_ref:[H, e, d]         carried state for every head (scratch)
    """
    chunk_idx = pl.program_id(1)
    head = pl.program_id(2)
    L = u_ref.shape[2]
    d = c_ref.shape[1]

    @pl.when(chunk_idx == 0)
    def _():
        state_ref[head] = jnp.zeros_like(state_ref[head])

    u = u_ref[0, 0]                                # [L, e]
    s0 = state_ref[head]                           # [e, d]

    acc = jnp.zeros(u.shape, jnp.float32)
    state_cols = []
    for di in range(d):
        tri = tri_ref[0, di]                       # [L, L]
        inner = jnp.dot(tri, u, preferred_element_type=jnp.float32)
        carry = epow_ref[0, :L, di][:, None] * s0[:, di][None, :]
        acc = acc + (inner + carry) * c_ref[0, di, :][None, :]
        # keep the dot 2Dx2D — 1D operands hit a TPU dot-dims lowering bug
        s_new = (epow_ref[0, L, di] * s0[:, di]
                 + jnp.dot(tri[L - 1:L, :], u,
                           preferred_element_type=jnp.float32)[0])
        # collected and stacked once: .at[:, di].set lowers to an
        # unsupported scatter inside TPU kernels
        state_cols.append(s_new)

    y_ref[0, 0] = acc
    state_ref[head] = jnp.stack(state_cols, axis=1)


def _tri_and_pows(a_diag: jnp.ndarray, b: jnp.ndarray, L: int):
    """Per-mode lower-tri decay Toeplitz + carry powers.

    Returns tri [H, d, L, L] and epow [H, L+1, d]
    (epow[t] = exp(a)^(t+1); epow[L] = exp(a)^L).
    """
    H, d = a_diag.shape
    decay = jnp.exp(jnp.clip(a_diag, -50.0, 50.0))            # [H, d]
    t = jnp.arange(L + 1, dtype=jnp.float32)
    pows = decay[:, None, :] ** t[None, :, None]              # [H, L+1, d]
    ti = jnp.arange(L)
    lag = (ti[:, None] - ti[None, :]).astype(jnp.float32)     # [L, L]
    tri = jnp.where(lag[None, None] >= 0,
                    decay[:, :, None, None] ** lag[None, None], 0.0)
    tri = tri * b[:, :, None, None]
    epow = jnp.concatenate([pows[:, 1:L + 1], pows[:, L:L + 1]], axis=1)
    return tri, epow


@partial(jax.jit, static_argnames=("interpret",))
def s4_scan_pallas(u: jnp.ndarray, a_diag: jnp.ndarray, b: jnp.ndarray,
                   c_full: jnp.ndarray, interpret: bool = False
                   ) -> jnp.ndarray:
    """u: [B, T, C=H*e] -> y: [B, T, C]; causal diagonal-SSM recurrence."""
    B, T, C = u.shape
    H, d = a_diag.shape
    e = C // H
    pad = (-T) % CHUNK
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    n_chunks = Tp // CHUNK
    tri, epow = _tri_and_pows(a_diag, b, CHUNK)

    # channels regrouped so each head's e channels are a contiguous block
    u_heads = u.astype(jnp.float32).reshape(B, Tp, H, e)
    u_heads = jnp.moveaxis(u_heads, 2, 1)                     # [B, H, Tp, e]

    out = pl.pallas_call(
        _s4_head_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, e), jnp.float32),
        grid=(B, n_chunks, H),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK, e),
                         lambda bi, ci, hi: (bi, hi, ci, 0)),
            pl.BlockSpec((1, d, CHUNK, CHUNK),
                         lambda bi, ci, hi: (hi, 0, 0, 0)),
            pl.BlockSpec((1, CHUNK + 1, d), lambda bi, ci, hi: (hi, 0, 0)),
            pl.BlockSpec((1, d, e), lambda bi, ci, hi: (hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, CHUNK, e),
                               lambda bi, ci, hi: (bi, hi, ci, 0)),
        scratch_shapes=[pltpu.VMEM((H, e, d), jnp.float32)],
        interpret=interpret,
    )(u_heads, tri, epow, c_full.astype(jnp.float32))

    y = jnp.moveaxis(out, 1, 2).reshape(B, Tp, C)
    return y[:, :T, :].astype(u.dtype)


def s4_scan(u: jnp.ndarray, a_diag: jnp.ndarray, b: jnp.ndarray,
            c_full: jnp.ndarray) -> jnp.ndarray:
    """Pallas on TPU; jnp associative scan elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return s4_scan_pallas(u, a_diag, b, c_full)
    from ttsx.nn.s4 import scan_dw_conv
    return scan_dw_conv(u, a_diag, b, c_full)
