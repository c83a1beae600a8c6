"""Frame-level acoustic features: f0 (autocorrelation), energy, VAD.

TPU-native replacement for the reference's missing `utils.audio.
extract_f0_energy` (data_loading1/data.set.py:20-22) and the host-side
librosa/parselmouth fallback (reference_encoder/main.py:322-352).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ttsx.core.config import AudioConfig
from ttsx.dsp.stft import frame_signal


@partial(jax.jit, static_argnames=("cfg", "fmin", "fmax"))
def extract_f0_energy(wav: jnp.ndarray, cfg: AudioConfig,
                      fmin: float = 65.0, fmax: float = 500.0):
    """wav [B, N] -> (f0 [B, T], energy [B, T], voiced [B, T]).

    Autocorrelation pitch tracker over the same framing as the mel
    frontend, entirely in-graph: framing -> mean-removal -> FFT-based
    autocorrelation -> peak pick in the [fmin, fmax] lag band.
    """
    frames = frame_signal(wav.astype(jnp.float32), cfg.win_length,
                          cfg.hop_length)                     # [B, T, W]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    energy = jnp.sqrt(jnp.mean(frames ** 2, axis=-1) + 1e-10)  # [B, T]

    w = frames.shape[-1]
    n = 1 << (2 * w - 1).bit_length()
    spec = jnp.fft.rfft(frames, n=n, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=n, axis=-1)[..., :w]
    ac = ac / jnp.maximum(ac[..., :1], 1e-10)                 # normalize

    lag_min = max(2, int(cfg.sample_rate / fmax))
    lag_max = min(w - 1, int(cfg.sample_rate / fmin))
    band = ac[..., lag_min:lag_max]
    best = jnp.argmax(band, axis=-1) + lag_min                # [B, T]
    peak = jnp.take_along_axis(ac, best[..., None], axis=-1)[..., 0]

    f0 = cfg.sample_rate / best.astype(jnp.float32)
    voiced = (peak > 0.3) & (energy > 1e-3)
    f0 = jnp.where(voiced, f0, 0.0)
    return f0, energy, voiced


@partial(jax.jit, static_argnames=("cfg", "threshold"))
def energy_vad(wav: jnp.ndarray, cfg: AudioConfig,
               threshold: float = 0.02) -> jnp.ndarray:
    """Simple energy VAD [B, T] — the in-graph stand-in for webrtcvad
    (SURVEY §2.9); the host pipeline can swap in a learned VAD."""
    frames = frame_signal(wav.astype(jnp.float32), cfg.win_length,
                          cfg.hop_length)
    rms = jnp.sqrt(jnp.mean(frames ** 2, axis=-1) + 1e-10)
    ref = jnp.maximum(jnp.max(rms, axis=-1, keepdims=True), 1e-6)
    return rms > threshold * ref
