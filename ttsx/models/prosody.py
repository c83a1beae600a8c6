"""Stage 2 — S4 prosody predictor + emotion classifier.

Re-designs prosody3/prosody_predictor.py:53-165 and
prosody3/emotion_classifier.py / assign_emotion_tags.py.

Canonical mel layout is [B, T, n_mels]; outputs match the reference dict:
f0/energy/pitch_var per frame, speech_rate/pause_dur per utterance, 13 MFCCs.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ttsx.core.config import ProsodyConfig
from ttsx.nn.s4 import S4
from ttsx.nn.embed import sinusoidal_table, extend_to_length

PROSODY_DIM = 18  # 5 scalars broadcast + 13 mfcc, the [B, T, 18] contract
EMOTIONS = ("joy", "sadness", "anger", "fear", "surprise", "neutral")


def _head(x: jnp.ndarray, out: int, name: str) -> jnp.ndarray:
    h = nn.LayerNorm(name=f"{name}_ln")(x)
    return nn.Dense(out, name=f"{name}_out")(h)


class ProsodyPredictor(nn.Module):
    """mel [B, T, n_mels] -> prosody feature dict (ProsodyPredictorV15)."""
    cfg: ProsodyConfig = dataclasses.field(default_factory=ProsodyConfig)

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mask: jnp.ndarray | None = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, T, _ = mel.shape
        x = nn.Dense(cfg.cond_dim)(mel)

        # sinusoidal frequency PE, crop/tail-extend to T
        # (prosody_predictor.py:133-142)
        pe = jnp.asarray(sinusoidal_table(cfg.n_freq, cfg.cond_dim))
        h = x + extend_to_length(pe, T)[None]

        for i in range(cfg.n_layers):
            h = S4(cfg.cond_dim, cfg.s4, name=f"s4_{i}")(
                h, deterministic=deterministic)

        if mask is not None:
            m = mask[..., None].astype(h.dtype)
            pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        else:
            pooled = jnp.mean(h, axis=1)

        return {
            "f0": _head(h, 1, "f0")[..., 0],                # [B, T]
            "energy": _head(h, 1, "energy")[..., 0],        # [B, T]
            "pitch_var": _head(h, 1, "pitch_var")[..., 0],  # [B, T]
            "speech_rate": _head(pooled, 1, "speech_rate"),  # [B, 1]
            "pause_dur": _head(pooled, 1, "pause_dur"),      # [B, 1]
            "mfcc": _head(pooled, cfg.n_mfcc, "mfcc"),       # [B, 13]
        }


def pack_prosody(feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Assemble the [B, T, 18] prosody conditioning tensor used by acoustic/
    refiner/vocoder (5 scalars + 13 MFCCs; sde_refiner5/model.py:265 note)."""
    T = feats["f0"].shape[1]
    per_frame = jnp.stack(
        [feats["f0"], feats["energy"], feats["pitch_var"]], axis=-1)  # [B,T,3]
    rate = jnp.broadcast_to(feats["speech_rate"][:, :, None],
                            (per_frame.shape[0], T, 1))
    pause = jnp.broadcast_to(feats["pause_dur"][:, :, None],
                             (per_frame.shape[0], T, 1))
    mfcc = jnp.broadcast_to(feats["mfcc"][:, None, :],
                            (per_frame.shape[0], T, feats["mfcc"].shape[-1]))
    return jnp.concatenate([per_frame, rate, pause, mfcc], axis=-1)


class EmotionClassifier(nn.Module):
    """23-d (4 VADER + 19 prosody) -> 2-layer transformer -> sigmoid 6-way
    emotion probabilities (prosody3/emotion_classifier.py:5-29)."""
    hidden: int = 64
    n_emotions: int = 6
    n_layers: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, features: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        # features: [B, F=23]; treat feature dims as a length-1 token seq
        h = nn.Dense(self.hidden)(features)[:, None, :]
        for _ in range(self.n_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, deterministic=deterministic)(h, h)
            h = nn.LayerNorm()(h + attn)
            f = nn.Dense(self.hidden * 2)(h)
            f = nn.gelu(f)
            f = nn.Dense(self.hidden)(f)
            h = nn.LayerNorm()(h + f)
        return nn.sigmoid(nn.Dense(self.n_emotions)(h[:, 0, :]))


class EmotionWeightLearner(nn.Module):
    """MLP gating VADER-vs-prosody blend
    (prosody3/emotion_classifier.py EmotionWeightLearner)."""
    hidden: int = 32

    @nn.compact
    def __call__(self, vader: jnp.ndarray, prosody_vec: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([vader, prosody_vec], axis=-1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.sigmoid(nn.Dense(1)(h))  # [B, 1] blend weight


def assign_emotion_tags(probs: jnp.ndarray) -> List[Tuple[str, str]]:
    """Top-2 (primary, secondary) emotion names per element
    (prosody3/assign_emotion_tags.py:2-11). Host-side helper."""
    import numpy as np
    order = np.argsort(-np.asarray(probs), axis=-1)
    return [(EMOTIONS[i[0]], EMOTIONS[i[1]]) for i in order]
