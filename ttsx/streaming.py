"""Streaming synthesis: fixed-size chunks with overlap cross-fade.

The reference scales long inputs by host-side chunking with bounded
in-graph length (SURVEY §5.7: 60 s diarization chunks, 120 s ffmpeg
chunks, l_max 1024). Synthesis-side we express the same capability as a
host loop over fixed [B, chunk, .] windows through the ALREADY-COMPILED
stage functions — one executable regardless of utterance length — with
overlap cross-fades at chunk seams. Static shapes keep XLA happy; the
compiled program is reused for every chunk.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ttsx.core.config import TTSXConfig
from ttsx.models.pipeline import TTSPipeline


class StreamingSynthesizer:
    def __init__(self, cfg: TTSXConfig, params, chunk_frames: int = 256,
                 overlap_frames: int = 16):
        assert overlap_frames < chunk_frames
        self.cfg = cfg
        self.pipe = TTSPipeline(cfg)
        self.params = params
        self.chunk = chunk_frames
        self.overlap = overlap_frames
        self.hop = 1
        for f in cfg.vocoder.upsample_factors:
            self.hop *= f
        self._fn = jax.jit(self._chunk_fn)

    def _chunk_fn(self, params, text, pros, emo, spk, sid):
        out = self.pipe.synthesize(params, text, pros, emo, spk, sid,
                                   use_sde=False)
        return out.wav

    def synthesize(self, text_emb: np.ndarray, prosody: np.ndarray,
                   emotion_probs: np.ndarray, speaker: np.ndarray,
                   style_id: np.ndarray) -> np.ndarray:
        """text_emb [B, T, D] of arbitrary T -> wav [B, T*hop]."""
        B, T, _ = text_emb.shape
        step = self.chunk - self.overlap
        n_chunks = max(1, -(-max(T - self.overlap, 1) // step))
        out_len = T * self.hop
        wav = np.zeros((B, out_len), np.float32)
        weight = np.zeros(out_len, np.float32)
        ov_samp = self.overlap * self.hop
        ramp = (np.linspace(0.0, 1.0, ov_samp, dtype=np.float32)
                if ov_samp else np.zeros(0, np.float32))

        for ci in range(n_chunks):
            lo = min(ci * step, max(T - self.chunk, 0))
            hi = lo + self.chunk
            pad = max(hi - T, 0)
            sl = lambda x: np.pad(x[:, lo:min(hi, T)],
                                  ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
            w = np.asarray(self._fn(
                self.params,
                jnp.asarray(sl(text_emb)), jnp.asarray(sl(prosody)),
                jnp.asarray(emotion_probs), jnp.asarray(speaker),
                jnp.asarray(style_id)))[:, :, 0]
            a = lo * self.hop
            b = min(hi, T) * self.hop
            n = b - a
            # cross-fade only at interior seams
            fade = np.ones(n, np.float32)
            if ov_samp and ci > 0:
                fade[:ov_samp] = ramp
            if ov_samp and ci < n_chunks - 1:
                fade[-ov_samp:] = np.minimum(fade[-ov_samp:], ramp[::-1])
            wav[:, a:b] += w[:, :n] * fade
            weight[a:b] += fade
        return wav / np.maximum(weight, 1e-6)[None]
