"""Slice embedding extraction — TPU-batched.

Re-designs hyper_diarizer/embedding.py:63-110: the reference extracts
ECAPA + Resemblyzer per slice in a ThreadPool, fuses with a learnable
gate and contextualizes with a 2-layer transformer. Here every slice is
embedded in ONE batched ReferenceEncoder call (bucketed to a fixed frame
length — the TPU-native replacement for the thread fan-out), followed by
a lightweight self-attention contextualization across slices.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ttsx.core.config import AudioConfig, RefEncConfig


class SliceEmbedder:
    def __init__(self, au: AudioConfig | None = None,
                 cfg: RefEncConfig | None = None, params=None,
                 max_frames: int = 256, context_layers: int = 0,
                 spec_weight: float | None = None, seed: int = 0):
        # context_layers: cross-slice attention contextualization
        # (embedding.py:63-110's transformer step). Defaults OFF: with an
        # untrained encoder the softmax blend homogenizes embeddings and
        # destroys speaker separation; enable once `params` is a trained
        # checkpoint.
        self.au = au or AudioConfig()
        self.cfg = cfg or RefEncConfig(speaker_dim=192, ecapa_channels=256)
        self.max_frames = max_frames
        self.context_layers = context_layers
        # dual-source fusion weight (the reference fuses ECAPA +
        # Resemblyzer with a learned gate, embedding.py:63-110). Default
        # is adaptive: with no trained checkpoint the handcrafted
        # voiceprint must dominate (a random encoder maps everything near
        # one direction), but once `params` is trained the learned
        # embedding is far cleaner — measured on the tone-corpus
        # dialogue, same-vs-diff speaker cosine margin is 0.97 for the
        # trained encoder alone vs -0.03 when the spectral tail dominates
        # at weight 2.0 (phoneme content swamps timbre in raw mel stats)
        self.spec_weight = (spec_weight if spec_weight is not None
                            else (0.5 if params is not None else 2.0))
        self._params = params
        self._model = None
        self._seed = seed
        # parallel diarize_batch shares one embedder across job threads;
        # lazy init must be atomic (a half-built state where _model is
        # set but _params is still None made concurrent extract() apply
        # with params=None — measured flaky in the batch test)
        import threading
        self._init_lock = threading.Lock()

    def _ensure_model(self, mel_dim: int):
        if self._model is not None and self._params is not None:
            return
        with self._init_lock:
            if self._model is not None and self._params is not None:
                return
            import jax
            from ttsx.models.reference_encoder import ReferenceEncoder
            model = ReferenceEncoder(self.cfg)
            if self._params is None:
                # deterministic random init: still a usable (if
                # untrained) projection for clustering; production
                # loads a checkpoint
                import jax.numpy as jnp
                dummy = jnp.zeros((1, self.max_frames, mel_dim))
                self._params = model.init(
                    jax.random.PRNGKey(self._seed), dummy)
            self._model = model

    def extract(self, wav: np.ndarray, slices: List[Tuple[float, float]]
                ) -> np.ndarray:
        """wav [N], slices [(s, e)...] -> embeddings [n_slices, D]."""
        import jax
        import jax.numpy as jnp
        from ttsx.dsp import mel_spectrogram

        if not slices:
            return np.zeros((0, self.cfg.speaker_dim), np.float32)
        sr = self.au.sample_rate
        hop = self.au.hop_length
        max_samples = self.max_frames * hop

        # ONE padded batch of slice waveforms -> ONE mel + encoder call
        batch = np.zeros((len(slices), max_samples), np.float32)
        mask_len = np.zeros(len(slices), np.int64)
        for i, (s, e) in enumerate(slices):
            seg = wav[int(s * sr):int(e * sr)][:max_samples]
            batch[i, :len(seg)] = seg
            mask_len[i] = max(len(seg) // hop, 1)

        mel = mel_spectrogram(jnp.asarray(batch), self.au)  # [n, T, n_mels]
        self._ensure_model(mel.shape[-1])
        T = mel.shape[1]
        mask = jnp.asarray(np.arange(T)[None, :] < mask_len[:, None])
        emb = self._model.apply(self._params, mel, mask)
        emb = np.asarray(emb, np.float32)

        # deterministic spectral-statistics tail (the reference fuses TWO
        # embedders — ECAPA + Resemblyzer — embedding.py:63-110; the second
        # source here is a handcrafted voiceprint: per-slice mel mean/std,
        # which keeps clustering informative even before the learned
        # encoder is trained). Stats come from UNNORMALIZED log-mel — the
        # frontend's per-bin normalization would erase exactly the
        # spectral profile that identifies the voice.
        import dataclasses as _dc
        mel_raw = mel
        if self.au.mel_normalize:
            mel_raw = mel_spectrogram(
                jnp.asarray(batch),
                _dc.replace(self.au, mel_normalize=False))
        m = np.asarray(mel_raw, np.float32)
        msk = np.asarray(mask, np.float32)[..., None]
        denom = np.maximum(msk.sum(1), 1.0)
        mel_mean = (m * msk).sum(1) / denom                  # [n, n_mels]
        mel_std = np.sqrt(np.maximum(
            ((m - mel_mean[:, None]) ** 2 * msk).sum(1) / denom, 0.0))
        spec = np.concatenate([mel_mean, mel_std], axis=1)
        # center per bin across slices but do NOT variance-equalize:
        # with a handful of slices the per-bin std is a noisy estimate,
        # and dividing by it amplifies noise-floor bins to unit scale,
        # drowning the few informative (voiced) bins — measured on the
        # alternating-tone dialogue, same-speaker voiceprint cosine is
        # ~1.0 centered-only vs ~0.1 z-scored once silence pads are
        # snapped off (the z-scored version's apparent separation came
        # from a silence-fraction artifact, not timbre)
        spec = spec - spec.mean(0, keepdims=True)
        spec /= np.linalg.norm(spec, axis=1, keepdims=True) + 1e-8
        # weight the voiceprint tail above the learned part: an untrained
        # encoder maps everything near one direction (cos~1) and would
        # otherwise swamp the discriminative spectral stats
        emb = np.concatenate([emb, self.spec_weight * spec], axis=1)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8

        # cross-slice contextualization (embedding.py transformer step):
        # softmax(sim/temp) attention over slices, residual, renormalize
        for _ in range(self.context_layers):
            sim = emb @ emb.T
            attn = np.exp(sim / 0.5 - sim.max(axis=1, keepdims=True) / 0.5)
            attn /= attn.sum(axis=1, keepdims=True)
            emb = emb + 0.5 * (attn @ emb)
            emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8
        return emb
