"""Speaker-encoder and prosody datasets.

Re-designs reference_encoder/dataset.py:9-122 (RefEncDataset: (path,
speaker) list -> mel/wav + label with train-time random 2-4 s crop,
noise/reverb/speed augments, SpecAugment freq 15 / time 35, beta(0.4,0.4)
mixup) and prosody3/Dataset.py:8-50 (JSON-manifest dataset returning
(mel, (spk, emotions, vader_scores, prosody vector))).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ttsx.core.config import AudioConfig
from ttsx.data.dataset import read_wav
from ttsx.data.collate import (
    add_noise, add_reverb, speed_perturb, spec_augment, mixup)


class RefEncDataset:
    """(path, speaker) items -> (mel [T, n_mels] or wav, label)."""

    def __init__(self, file_list: Sequence[Tuple[str, str]],
                 audio: Optional[AudioConfig] = None, train: bool = True,
                 return_mel: bool = True,
                 crop_seconds: Tuple[float, float] = (2.0, 4.0),
                 seed: int = 0, mel_fn=None):
        self.items = list(file_list)
        self.audio = audio or AudioConfig()
        self.train = train
        self.return_mel = return_mel
        self.crop_seconds = crop_seconds
        self.rng = np.random.default_rng(seed)
        self.spk2id = {s: i for i, s in
                       enumerate(sorted({spk for _, spk in self.items}))}
        if mel_fn is None:
            import jax.numpy as jnp
            from ttsx.dsp import mel_spectrogram
            mel_fn = lambda w: np.asarray(
                mel_spectrogram(jnp.asarray(w[None]), self.audio))[0]
        self.mel_fn = mel_fn

    def __len__(self):
        return len(self.items)

    @property
    def speaker_ids(self) -> List[int]:
        return [self.spk2id[spk] for _, spk in self.items]

    def __getitem__(self, idx: int):
        path, spk = self.items[idx]
        wav, _ = read_wav(path, self.audio.sample_rate)
        sr = self.audio.sample_rate
        if self.train:
            # random 2-4 s crop (dataset.py:52-56)
            lo, hi = self.crop_seconds
            crop = int(self.rng.uniform(lo, hi) * sr)
            if len(wav) > crop:
                start = self.rng.integers(0, len(wav) - crop + 1)
                wav = wav[start:start + crop]
            # augments in the reference's order-of-application
            if self.rng.random() < 0.5:
                wav = add_noise(wav, self.rng)
            if self.rng.random() < 0.3:
                wav = add_reverb(wav, self.rng)
            if self.rng.random() < 0.3:
                wav = speed_perturb(wav, self.rng)
        label = self.spk2id[spk]
        if not self.return_mel:
            return wav, label
        mel = self.mel_fn(wav)  # [T, n_mels]
        if self.train:
            mel = spec_augment(mel[None], self.rng, freq_mask=15,
                               time_mask=35)[0]
        return mel.astype(np.float32), label

    def mixup_batch(self, mels: np.ndarray, labels: np.ndarray,
                    alpha: float = 0.4):
        """(mel, spk, spk2, lam) mixup contract (dataset.py mixup)."""
        return mixup(mels, labels, self.rng, alpha)


class ProsodyManifestDataset:
    """JSON manifest -> (mel, (speaker, emotions, vader_scores,
    prosody_vector)) (prosody3/Dataset.py:8-50).

    Manifest format: {"items": [{"mel_path"| "wav_path", "speaker",
    "emotions": [...], "vader": [4], "prosody": [18]}]}.
    """

    def __init__(self, manifest_path: str | Path,
                 audio: Optional[AudioConfig] = None, mel_fn=None):
        data = json.loads(Path(manifest_path).read_text())
        self.items = data["items"]
        self.audio = audio or AudioConfig()
        if mel_fn is None:
            import jax.numpy as jnp
            from ttsx.dsp import mel_spectrogram
            mel_fn = lambda w: np.asarray(
                mel_spectrogram(jnp.asarray(w[None]), self.audio))[0]
        self.mel_fn = mel_fn

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int):
        it = self.items[idx]
        if "mel_path" in it:
            mel = np.load(it["mel_path"]).astype(np.float32)
        else:
            wav, _ = read_wav(it["wav_path"], self.audio.sample_rate)
            mel = self.mel_fn(wav)
        meta = (it.get("speaker", "unknown"),
                np.asarray(it.get("emotions", [0.0] * 6), np.float32),
                np.asarray(it.get("vader", [0.0] * 4), np.float32),
                np.asarray(it.get("prosody", [0.0] * 18), np.float32))
        return mel, meta
