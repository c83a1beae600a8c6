"""Pallas chunked-recurrence kernel for the diagonal S4 SSM.

North-star kernel from BASELINE.json ("prosody3's S4 state-space layers run
as an associative-scan kernel"). The jnp associative-scan path
(ttsx/nn/s4.py scan_dw_conv) materializes [B, T, C, d] states in HBM;
this kernel walks time in chunks carrying the [C, d] state in VMEM — the
state never touches HBM, and per chunk it does d small VPU FMAs plus one
[chunk, d] x [d, e] MXU readout per head.

    s_t = exp(a) * s_{t-1} + b * u_t          (diagonal recurrence, VPU)
    y_t[(h,e)] = sum_d c[h,d,e] * s_t[d]      (readout matmul, MXU)

Grid: (B,) — one program per batch element; the time loop is a
jax.lax.fori_loop over chunks inside the kernel.

Public entry `s4_scan(...)` matches scan_dw_conv's contract and falls back
to it off-TPU; `interpret=True` runs the kernel on CPU for tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHUNK = 128


def _s4_kernel(u_ref, decay_ref, b_ref, c_ref, y_ref, state_ref):
    """u: [T, C]; decay/b: [H, d]; c: [H, d, e]; y: [T, C]; state: [C, d].

    C = H*e input/output channels; each channel (h, e) carries its own
    d-dim mode state driven by u[:, (h, e)].
    """
    T, C = u_ref.shape
    H, d = decay_ref.shape
    e = C // H

    state_ref[:] = jnp.zeros_like(state_ref)
    decay = decay_ref[:]                       # [H, d]
    b = b_ref[:]                               # [H, d]
    # per-channel views: [C, d]
    decay_c = jnp.repeat(decay, e, axis=0)
    b_c = jnp.repeat(b, e, axis=0)

    n_chunks = T // CHUNK

    def chunk_body(ci, _):
        u = u_ref[pl.ds(ci * CHUNK, CHUNK), :]         # [CHUNK, C]

        def step(t, carry):
            s = carry                                   # [C, d]
            s = decay_c * s + b_c * u[t][:, None]
            # readout: y[c] = sum_d c_full[h(c), d, e(c)] * s[c, d]
            # reshape channel axis into (H, e) and einsum per head
            s_h = s.reshape(H, e, d)
            y_t = jnp.einsum("hed,hde->he", s_h, c_ref[:],
                             preferred_element_type=jnp.float32)
            y_ref[ci * CHUNK + t, :] = y_t.reshape(C)
            return s

        s_final = jax.lax.fori_loop(0, CHUNK, step, state_ref[:])
        state_ref[:] = s_final
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


# NB: pl imported lazily so CPU-only environments can import this module.
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@partial(jax.jit, static_argnames=("interpret",))
def s4_scan_pallas(u: jnp.ndarray, a_diag: jnp.ndarray, b: jnp.ndarray,
                   c_full: jnp.ndarray, interpret: bool = False
                   ) -> jnp.ndarray:
    """u: [B, T, C] -> y: [B, T, C]; causal diagonal-SSM recurrence."""
    B, T, C = u.shape
    H, d = a_diag.shape
    pad = (-T) % CHUNK
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    decay = jnp.exp(jnp.clip(a_diag, -50.0, 50.0)).astype(jnp.float32)

    kernel = pl.pallas_call(
        _s4_kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, d), jnp.float32)],
        interpret=interpret,
    )

    def per_batch(ub):
        return kernel(ub.astype(jnp.float32), decay,
                      b.astype(jnp.float32), c_full.astype(jnp.float32))

    y = jax.vmap(per_batch)(u)
    return y[:, :T, :].astype(u.dtype)


def s4_scan(u: jnp.ndarray, a_diag: jnp.ndarray, b: jnp.ndarray,
            c_full: jnp.ndarray) -> jnp.ndarray:
    """Pallas on TPU; jnp associative scan elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return s4_scan_pallas(u, a_diag, b, c_full)
    from ttsx.nn.s4 import scan_dw_conv
    return scan_dw_conv(u, a_diag, b, c_full)
