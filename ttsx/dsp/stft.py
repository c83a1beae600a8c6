"""STFT / mel-spectrogram frontend, jnp reference implementation.

TPU-native replacement for torchaudio's C++ STFT/MelSpectrogram
(reference: reference_encoder/utils.py:23-42, vocoder7/stft.py:25-30,
prosody3/prosody_predictor.py:110-112): framing is a reshape+window,
the DFT is jnp.fft.rfft (XLA-fused), and the mel filterbank is one
[n_bins, n_mels] MXU matmul. A fused Pallas kernel with the same contract
lives in ttsx/ops/mel_kernel.py; this module is its numerical reference.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ttsx.core.config import AudioConfig


def hann_window(n: int) -> np.ndarray:
    # periodic Hann, matching torch.hann_window(n) semantics
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, f_min: float = 0.0,
                   f_max: float | None = None) -> np.ndarray:
    """HTK-style triangular filterbank [n_fft//2+1, n_mels]
    (torchaudio.functional.melscale_fbanks equivalent)."""
    f_max = f_max or sr / 2.0
    n_bins = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_bins, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def frame_signal(wav: jnp.ndarray, n_fft: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """wav [B, N] -> frames [B, T, n_fft] (reflect-padded when centered)."""
    if center:
        wav = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n = wav.shape[-1]
    t = 1 + (n - n_fft) // hop
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return wav[:, idx]


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center"))
def stft_magnitude(wav: jnp.ndarray, n_fft: int, hop: int,
                   win_length: int | None = None,
                   center: bool = True) -> jnp.ndarray:
    """wav [B, N] -> |STFT| [B, T, n_fft//2+1]."""
    win_length = win_length or n_fft
    frames = frame_signal(wav.astype(jnp.float32), n_fft, hop, center)
    win = jnp.asarray(hann_window(win_length), jnp.float32)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = jnp.pad(win, (pad, n_fft - win_length - pad))
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.abs(spec)


@partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """wav [B, N] -> log-mel [B, T, n_mels].

    Matches reference_encoder/utils.py:23-42 semantics: power-1 magnitude
    mel, log compression, optional per-bin mean/std normalization.
    """
    mag = stft_magnitude(wav, cfg.n_fft, cfg.hop_length, cfg.win_length)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                    cfg.f_min, cfg.f_max))
    mel = mag @ fb                                   # [B, T, n_mels] MXU
    mel = jnp.log(mel + cfg.log_eps)
    if cfg.mel_normalize:
        mean = jnp.mean(mel, axis=1, keepdims=True)
        std = jnp.std(mel, axis=1, keepdims=True) + 1e-5
        mel = (mel - mean) / std
    return mel


@partial(jax.jit, static_argnames=("cfg", "n_mfcc"))
def mfcc(wav: jnp.ndarray, cfg: AudioConfig, n_mfcc: int = 13) -> jnp.ndarray:
    """wav [B, N] -> MFCC [B, T, n_mfcc] via DCT-II of log-mel."""
    logmel = mel_spectrogram(wav, cfg)               # [B, T, n_mels]
    n = cfg.n_mels
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(np.pi * k * (2 * np.arange(n)[None, :] + 1) / (2 * n))
    dct = dct * np.sqrt(2.0 / n)
    dct[0] *= 1.0 / np.sqrt(2.0)
    return logmel @ jnp.asarray(dct.astype(np.float32)).T


def istft(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Griffin-free inverse STFT (overlap-add) for [B, T, n_bins]."""
    spec = mag * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)   # [B, T, n_fft]
    win = jnp.asarray(hann_window(n_fft), jnp.float32)
    frames = frames * win
    B, T, _ = frames.shape
    out_len = n_fft + hop * (T - 1)
    out = jnp.zeros((B, out_len), jnp.float32)
    norm = jnp.zeros((out_len,), jnp.float32)
    idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = out.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(win ** 2, (T,)))
    out = out / jnp.maximum(norm, 1e-8)[None]
    return out[:, n_fft // 2: out_len - n_fft // 2]
