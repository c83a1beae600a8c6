"""Multi-head diagonal S4 state-space layer, TPU-native.

Re-designs the reference's "Multi-head S4 V7.0" (prosody3/s4.py:32-186):
per-head diagonal A with fixed -linspace init, low-rank U/V residual,
factorized C = C1@C2 + diag(C0), learned per-head positional bias with
tail extension, grouped width-3 local conv, SwiGLU gate, GroupNorm out.

TPU-native kernel: instead of materializing exp(A t)B C and running a
depthwise cuDNN conv (s4.py:129-153), we evaluate the depthwise long
convolution spectrally with rFFT (O(T log T), XLA-fused) or as a diagonal
recurrence via jax.lax.associative_scan for streaming/causal use.

Note on semantics: torch F.conv1d is cross-correlation, so the reference's
"causal conv" actually applies the decay kernel time-reversed; we implement
the *intended* SSM convolution y_t = sum_s K_s x_{t-s} (lag s weighted by
exp(A s)), which is also what the recurrence form computes.

Canonical layout here is [B, T, C] (channels-last for TPU lanes).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ttsx.core.config import S4Config
from ttsx.nn.conv import Conv1d


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def ssm_kernel(a_diag: jnp.ndarray, b: jnp.ndarray, c_full: jnp.ndarray,
               length: int) -> jnp.ndarray:
    """Materialize the depthwise SSM kernel.

    a_diag: [H, d]; b: [H, d]; c_full: [H, d, e]  ->  K: [H*e, L]
    K[(h,e), s] = sum_d exp(clip(a[h,d]*s)) * b[h,d] * c_full[h,d,e]
    (reference kernel construction: prosody3/s4.py:129-141).
    """
    t = jnp.arange(length, dtype=jnp.float32)  # [L]
    decay = jnp.exp(jnp.clip(a_diag[:, None, :] * t[None, :, None], -50.0, 50.0))
    expab = decay * b[:, None, :]  # [H, L, d]
    k = jnp.einsum("htd,hde->hte", expab, c_full)  # [H, L, e]
    h, L, e = k.shape
    return jnp.transpose(k, (0, 2, 1)).reshape(h * e, L)


def fft_dw_conv(x: jnp.ndarray, w: jnp.ndarray, causal: bool) -> jnp.ndarray:
    """Depthwise long convolution via rFFT.

    x: [B, T, C]; w: [C, L]. Returns [B, T, C].
    Causal: y_t = sum_{s<=t} w_s x_{t-s}. Centered: output shifted by (L-1)//2.
    """
    T = x.shape[1]
    L = w.shape[-1]
    n = _next_pow2(T + L - 1)
    dtype = x.dtype
    xf = jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=1)
    kf = jnp.fft.rfft(w.astype(jnp.float32), n=n, axis=-1)  # [C, nf]
    y = jnp.fft.irfft(xf * kf.T[None], n=n, axis=1)
    s = 0 if causal else (L - 1) // 2
    return y[:, s:s + T, :].astype(dtype)


def scan_dw_conv(x: jnp.ndarray, a_diag: jnp.ndarray, b: jnp.ndarray,
                 c_full: jnp.ndarray) -> jnp.ndarray:
    """Causal diagonal-SSM recurrence via associative scan (streaming path).

    x: [B, T, C=H*e]. State per channel is the d modes of its head:
      s_t = exp(a) * s_{t-1} + b * u_t;   y_t[(h,e)] = sum_d c[h,d,e] s_t[d]
    Equivalent to fft_dw_conv with the materialized kernel, computed in
    recurrent form. Memory: [B, T, C, d] — use for short/streaming windows.
    """
    B, T, C = x.shape
    H, d = a_diag.shape
    e = C // H
    u = x.reshape(B, T, H, e).astype(jnp.float32)
    decay = jnp.exp(jnp.clip(a_diag, -50.0, 50.0))  # exp(a*1): step decay [H, d]
    # elements: (a, s) with combine (a2*a1, a2*s1 + s2)
    a_seq = jnp.broadcast_to(decay[None, None, :, None, :], (B, T, H, e, d))
    b_seq = u[..., None] * b[None, None, :, None, :]  # [B, T, H, e, d]

    def combine(l, r):
        al, sl = l
        ar, sr = r
        return al * ar, ar * sl + sr

    _, states = jax.lax.associative_scan(combine, (a_seq, b_seq), axis=1)
    y = jnp.einsum("bthed,hde->bthe", states, c_full)
    return y.reshape(B, T, C).astype(x.dtype)


class S4(nn.Module):
    """Multi-head diagonal S4 layer over [B, T, C]."""
    d_model: int
    cfg: S4Config = dataclasses.field(default_factory=S4Config)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        H = cfg.heads
        assert self.d_model % H == 0, "d_model must be divisible by heads"
        d = self.d_model // H
        r = cfg.rank
        B_, T, C = x.shape
        assert C == self.d_model

        # ---- fixed SSM buffers (prosody3/s4.py:25-30) ----
        a_row = -np.linspace(1.0, d, d, dtype=np.float32) / d
        a_diag = jnp.asarray(np.tile(a_row, (H, 1)))          # [H, d]
        b_in = jnp.ones((H, d), jnp.float32)

        # ---- learnable SSM readout ----
        c1 = self.param("C1", nn.initializers.normal(0.02), (H, d, r))
        c2 = self.param("C2", nn.initializers.normal(0.02), (H, r, d))
        c0 = self.param("C0", nn.initializers.zeros, (H, d))
        c_full = jnp.einsum("hdr,hre->hde", c1, c2) + jax.vmap(jnp.diag)(c0)

        # low-rank residual factors, flattened across heads (s4.py:170-180)
        u_f = self.param("U", nn.initializers.normal(d ** -0.5), (H, d, r))
        v_f = self.param("V", nn.initializers.normal(d ** -0.5), (H, d, r))

        pos_bias = self.param("pos_bias", nn.initializers.zeros, (H, cfg.l_max))

        # ---- 1) pre-norm ----
        h = nn.LayerNorm()(x)

        # ---- 2) depthwise SSM long conv ----
        mode = cfg.kernel_mode
        if mode == "auto":
            # fft stays the default: the on-device A/B
            # (eval_results/kernel_ab.json, TPU v5e) has pallas at
            # 1.6-2.0 ms vs fft 2.4 ms vs assoc-scan 39.9 ms — but at
            # H=4/d_modes=16, while THIS layer ties modes to width
            # (d = C/H below). The pallas kernel's per-mode Toeplitz
            # blocks are O((C/H)^2) work and d*CHUNK^2*4 bytes of VMEM —
            # at the flagship refiner's mid level (C=1120+, d=280) that
            # is ~18 MB/block and a 280-way unrolled loop; fft is
            # O(C*T*logT) and wins from d ≈ 64 up. `pallas` remains the
            # right explicit choice for small-mode causal SSMs.
            mode = "fft"
        if mode in ("scan", "pallas") and not cfg.causal:
            raise ValueError(f"{mode} kernel path is causal-only")
        if mode == "scan":
            y = scan_dw_conv(h, a_diag, b_in, c_full)
        elif mode == "pallas":
            # chunked VMEM-resident recurrence (ttsx/ops/s4_kernel.py);
            # falls back to the associative scan off-TPU
            from ttsx.ops.s4_kernel import s4_scan
            y = s4_scan(h, a_diag, b_in, c_full)
        else:
            w = ssm_kernel(a_diag, b_in, c_full, T)
            y = fft_dw_conv(h, w, cfg.causal)

        # ---- 3) positional bias with tail extension (s4.py:155-162) ----
        if T <= cfg.l_max:
            pb = pos_bias[:, :T]
        else:
            tail = jnp.broadcast_to(pos_bias[:, -1:], (H, T - cfg.l_max))
            pb = jnp.concatenate([pos_bias, tail], axis=1)
        bias = jnp.repeat(pb, d, axis=0)              # [C, T]
        y = y + bias.T[None]                          # [B, T, C]

        # ---- 4) local grouped conv + SwiGLU gate (s4.py:164-168) ----
        y = Conv1d(features=C, kernel_size=3, groups=H, padding="SAME",
                   use_bias=True)(y)
        g = Conv1d(features=2 * C, kernel_size=1)(y)
        a_g, b_g = jnp.split(g, 2, axis=-1)
        y = a_g * jax.nn.silu(b_g)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)

        # ---- 5) low-rank residual (s4.py:170-180) ----
        v_flat = v_f.reshape(C, r)
        u_flat = u_f.reshape(C, r)
        res = (h @ v_flat) @ u_flat.T
        res = nn.Dropout(cfg.dropout, broadcast_dims=(1,))(
            res, deterministic=deterministic)
        y = y + res

        # ---- 6) output GroupNorm ----
        return nn.GroupNorm(num_groups=cfg.norm_groups)(y)
