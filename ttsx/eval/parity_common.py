"""Shared helpers for the parity-number harness (ttsx/eval/parity.py and
parity_aux.py): mel-space normalization bookkeeping, batch sampling, and
the de-normalized MCD measurement path."""
from __future__ import annotations

from typing import Dict

import numpy as np

from ttsx.core.config import AudioConfig

# un-normalized natural-log mel so MCD's 10/ln10 factor yields honest dB
AUDIO = AudioConfig(mel_normalize=False)

_STATS_KEYS = ("mel_raw", "mel_mean", "mel_std")


def _speaker_vec(ids: np.ndarray, dim: int, n_speakers: int) -> np.ndarray:
    """One-hot speaker conditioning padded/cropped to `dim`."""
    eye = np.eye(max(n_speakers, dim), dtype=np.float32)[:, :dim]
    return eye[ids]


def _normalize_mels(d: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Swap the raw log-mel for its per-utterance per-bin normalization
    (the flagship's training space, AudioConfig.mel_normalize) while
    keeping the stats so MCD can be measured in honest log-mel dB by
    de-normalizing predictions with the *target's* stats."""
    raw = d["mel"]
    mean = raw.mean(axis=1, keepdims=True)
    std = raw.std(axis=1, keepdims=True) + 1e-5
    out = dict(d)
    out["mel"] = ((raw - mean) / std).astype(np.float32)
    out["mel_raw"], out["mel_mean"], out["mel_std"] = raw, mean, std
    return out


def _model_batch(d: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip eval-only stats keys from a features dict."""
    return {k: v for k, v in d.items() if k not in _STATS_KEYS}


def _denorm_mcd(pred_norm: np.ndarray, data: Dict[str, np.ndarray],
                j: int, mcd_fn) -> float:
    """MCD dB between a normalized prediction and the raw target mel."""
    raw = pred_norm * data["mel_std"][j] + data["mel_mean"][j]
    return mcd_fn(raw, data["mel_raw"][j])


def _batch_sampler(feats: Dict[str, np.ndarray], batch: int, seed: int):
    rng = np.random.default_rng(seed)
    n = len(feats["mel"])
    while True:
        idx = rng.integers(0, n, batch)
        yield {k: v[idx] for k, v in feats.items()}
