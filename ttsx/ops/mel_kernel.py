"""Fused Pallas mel-frontend kernel.

North-star kernel from BASELINE.json: framing + window + DFT magnitude +
mel filterbank + log/normalize fused in one VMEM-resident kernel, replacing
torchaudio's separate STFT/MelScale/log passes (reference:
reference_encoder/utils.py:23-42).

Design (TPU): the per-frame DFT is expressed as two real matmuls against
precomputed cos/sin bases [n_fft, n_bins] — on TPU the MXU eats these; an
rFFT would leave the MXU idle. The mel projection fuses into the same
kernel as a third matmul, and log compression rides the VPU on the way out.
Grid tiles over frames so arbitrary T streams through a fixed VMEM
footprint; the frame gather from the padded signal happens via async DMA
of the needed signal span per tile.

`mel_frontend(...)` is the public entry: it uses the Pallas kernel on TPU
and falls back to the jnp reference (ttsx.dsp.stft.mel_spectrogram) when
Pallas is unavailable (CPU tests use interpret mode).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ttsx.core.config import AudioConfig
from ttsx.dsp.stft import hann_window, mel_filterbank

_FRAMES_PER_TILE = 128


def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def _mel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, win_ref, out_ref):
    """One grid step: [tile, n_fft] frames -> [tile, n_mels] log-mel."""
    frames = frames_ref[:] * win_ref[:]                    # window (VPU)
    re = jnp.dot(frames, cos_ref[:],
                 preferred_element_type=jnp.float32)       # MXU
    im = jnp.dot(frames, sin_ref[:],
                 preferred_element_type=jnp.float32)       # MXU
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    mel = jnp.dot(mag, fb_ref[:],
                  preferred_element_type=jnp.float32)      # MXU
    out_ref[:] = jnp.log(mel + 1e-5)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def mel_frontend_pallas(wav: jnp.ndarray, cfg: AudioConfig,
                        interpret: bool = False) -> jnp.ndarray:
    """wav [B, N] -> log-mel [B, T, n_mels] (unnormalized log-mel; caller
    applies per-bin normalization when cfg.mel_normalize)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_fft, hop = cfg.n_fft, cfg.hop_length
    B, N = wav.shape
    wav = jnp.pad(wav.astype(jnp.float32),
                  ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n = wav.shape[-1]
    T = 1 + (n - n_fft) // hop
    tiles = -(-T // _FRAMES_PER_TILE)
    T_pad = tiles * _FRAMES_PER_TILE

    # frame gather on the XLA side (one dynamic-slice matmul-free op);
    # the kernel fuses window+DFT+mel+log over frame tiles
    idx = jnp.arange(T_pad)[:, None] * hop + jnp.arange(n_fft)[None, :]
    idx = jnp.minimum(idx, n - 1)
    frames = wav[:, idx]                                   # [B, T_pad, n_fft]

    cosb, sinb = _dft_bases(n_fft)
    fb = mel_filterbank(cfg.sample_rate, n_fft, cfg.n_mels,
                        cfg.f_min, cfg.f_max)
    win = hann_window(cfg.win_length)
    if cfg.win_length < n_fft:
        pad = (n_fft - cfg.win_length) // 2
        win = np.pad(win, (pad, n_fft - cfg.win_length - pad))

    kernel = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((T_pad, cfg.n_mels), jnp.float32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_FRAMES_PER_TILE, n_fft), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, n_fft // 2 + 1), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, n_fft // 2 + 1), lambda i: (0, 0)),
            pl.BlockSpec((n_fft // 2 + 1, cfg.n_mels), lambda i: (0, 0)),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_FRAMES_PER_TILE, cfg.n_mels),
                               lambda i: (i, 0)),
        interpret=interpret,
    )

    def per_batch(fr):
        return kernel(fr, jnp.asarray(cosb), jnp.asarray(sinb),
                      jnp.asarray(fb), jnp.asarray(win)[None, :])

    mel = jax.vmap(per_batch)(frames)[:, :T, :]
    if cfg.mel_normalize:
        mean = jnp.mean(mel, axis=1, keepdims=True)
        std = jnp.std(mel, axis=1, keepdims=True) + 1e-5
        mel = (mel - mean) / std
    return mel


def mel_frontend(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Pallas on TPU, jnp reference elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return mel_frontend_pallas(wav, cfg)
    from ttsx.dsp.stft import mel_spectrogram
    return mel_spectrogram(wav, cfg)
