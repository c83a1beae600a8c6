"""Batch collation: padding, augmentation, SpecAugment, feature cache.

Re-designs batching2/colate.py:43-199 (TTSCollator + AugmentationPipeline):
  * pads wav/text to bucketed lengths (XLA-friendly static shapes — the
    SURVEY §5.7 fixed-shape answer to torch's dynamic padding),
  * seeded, reproducible wav augments in random order,
  * thread-safe feature cache keyed by wav_path,
  * SpecAugment on batched mels,
  * per-batch collate_time metric,
  * emits the §2.1 batch-keys contract.

Mel/f0/energy are computed on-device in one batched call (the TPU-native
move: the reference does per-item torchaudio mels in DataLoader workers).
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ttsx.core.config import AudioConfig


def bucket_length(n: int, bucket: int = 4096) -> int:
    """Round up to a bucket so XLA sees few distinct shapes."""
    return int(np.ceil(max(n, 1) / bucket) * bucket)


# ---------------------------------------------------------------------------
# wav augments (reference_encoder/augment.py, host-side numpy)
# ---------------------------------------------------------------------------
def add_noise(wav: np.ndarray, rng: np.random.Generator,
              noise_bank: Optional[Sequence[np.ndarray]] = None,
              snr_db_range=(5.0, 20.0)) -> np.ndarray:
    """Random-SNR additive noise (augment.py:10-30); white noise when no
    bank is provided."""
    snr_db = rng.uniform(*snr_db_range)
    if noise_bank:
        noise = noise_bank[rng.integers(len(noise_bank))]
        if len(noise) < len(wav):
            noise = np.tile(noise, int(np.ceil(len(wav) / len(noise))))
        start = rng.integers(0, len(noise) - len(wav) + 1)
        noise = noise[start:start + len(wav)]
    else:
        noise = rng.normal(size=len(wav)).astype(np.float32)
    p_sig = np.mean(wav ** 2) + 1e-10
    p_noise = np.mean(noise ** 2) + 1e-10
    scale = np.sqrt(p_sig / (p_noise * 10 ** (snr_db / 10.0)))
    return wav + scale * noise


def add_reverb(wav: np.ndarray, rng: np.random.Generator,
               rir_bank: Optional[Sequence[np.ndarray]] = None) -> np.ndarray:
    """RIR convolution (augment.py:32-44); synthetic exponential-decay RIR
    when no bank is provided."""
    if rir_bank:
        rir = rir_bank[rng.integers(len(rir_bank))]
    else:
        n = 2000
        rir = (rng.normal(size=n) * np.exp(-np.linspace(0, 8, n))).astype(
            np.float32)
        rir[0] = 1.0
    out = np.convolve(wav, rir)[:len(wav)].astype(np.float32)
    peak = np.abs(out).max() + 1e-8
    return out / peak * (np.abs(wav).max() + 1e-8)


def speed_perturb(wav: np.ndarray, rng: np.random.Generator,
                  factors=(0.9, 1.1)) -> np.ndarray:
    """Resample-based speed change (augment.py:46-59, sox `speed`)."""
    f = factors[rng.integers(len(factors))]
    n = int(round(len(wav) / f))
    return np.interp(np.linspace(0, len(wav) - 1, n), np.arange(len(wav)),
                     wav).astype(np.float32)


def load_noise_bank(directory, target_sr: int, limit: int = 64):
    """Load a directory of wavs as an augmentation bank (the reference's
    NOISE_FILES / RIR lists, reference_encoder/augment.py:10-44)."""
    from pathlib import Path
    from ttsx.data.dataset import read_wav
    bank = []
    for p in sorted(Path(directory).glob("**/*.wav"))[:limit]:
        wav, _ = read_wav(p, target_sr)
        if len(wav):
            bank.append(wav)
    return bank


class AugmentationPipeline:
    """Random-order wav+noise augment chain (colate.py AugmentationPipeline)."""

    def __init__(self, augments: Optional[List[Callable]] = None,
                 p: float = 0.5):
        self.augments = augments if augments is not None else [
            add_noise, add_reverb, speed_perturb]
        self.p = p

    def __call__(self, wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        order = rng.permutation(len(self.augments))
        for i in order:
            if rng.random() < self.p:
                wav = self.augments[i](wav, rng)
        return wav


def spec_augment(mel: np.ndarray, rng: np.random.Generator,
                 freq_mask: int = 15, time_mask: int = 35,
                 n_masks: int = 1) -> np.ndarray:
    """SpecAugment on [B, T, n_mels] (dataset.py freq 15 / time 35)."""
    mel = mel.copy()
    B, T, F = mel.shape
    for b in range(B):
        for _ in range(n_masks):
            f = rng.integers(0, freq_mask + 1)
            f0 = rng.integers(0, max(F - f, 1))
            mel[b, :, f0:f0 + f] = 0.0
            t = rng.integers(0, min(time_mask, T) + 1)
            t0 = rng.integers(0, max(T - t, 1))
            mel[b, t0:t0 + t, :] = 0.0
    return mel


def mixup(mel: np.ndarray, labels: np.ndarray, rng: np.random.Generator,
          alpha: float = 0.4):
    """Beta(0.4,0.4) mixup returning (mel, labels, labels2, lam)
    (reference_encoder/dataset.py mixup)."""
    lam = rng.beta(alpha, alpha)
    perm = rng.permutation(len(mel))
    mixed = lam * mel + (1 - lam) * mel[perm]
    return mixed.astype(mel.dtype), labels, labels[perm], lam


@dataclass
class CollatorConfig:
    audio: AudioConfig = field(default_factory=AudioConfig)
    augment: bool = True
    spec_augment: bool = True
    cache_features: bool = True
    bucket_wav: int = 8192
    bucket_text: int = 64
    seed: int = 0
    half: bool = False  # cast float outputs to bf16-width (AMP analog)


class TTSCollator:
    """List of TTSDataset items -> padded batch dict (§2.1 contract)."""

    def __init__(self, cfg: CollatorConfig,
                 augmenter: Optional[AugmentationPipeline] = None,
                 mel_fn: Optional[Callable] = None,
                 f0_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.augmenter = augmenter or AugmentationPipeline()
        self._cache: Dict[str, np.ndarray] = {}
        self._lock = threading.Lock()
        if mel_fn is None or f0_fn is None:
            import jax.numpy as jnp
            from ttsx.dsp import extract_f0_energy
            from ttsx.ops.mel_kernel import mel_frontend  # pallas on TPU
            mel_fn = mel_fn or (lambda w: np.asarray(
                mel_frontend(jnp.asarray(w), cfg.audio)))
            f0_fn = f0_fn or (lambda w: tuple(
                np.asarray(x)
                for x in extract_f0_energy(jnp.asarray(w), cfg.audio)))
        self.mel_fn = mel_fn
        self.f0_fn = f0_fn

    def _augmented_wav(self, item: Dict, rng: np.random.Generator) -> np.ndarray:
        key = item.get("wav_path")
        if self.cfg.cache_features and key:
            with self._lock:
                if key in self._cache:
                    return self._cache[key]
        wav = item["wav"]
        if self.cfg.augment:
            wav = self.augmenter(wav, rng)
        if self.cfg.cache_features and key:
            with self._lock:
                self._cache[key] = wav
        return wav

    def __call__(self, items: List[Dict], epoch: int = 0,
                 batch_idx: int = 0) -> Dict:
        t0 = time.perf_counter()
        # seeded reproducible augments (colate.py seed_fn)
        rng = np.random.default_rng(
            (self.cfg.seed * 1_000_003 + epoch * 10_007 + batch_idx) & 0x7FFFFFFF)

        wavs = [self._augmented_wav(it, rng) for it in items]
        max_wav = bucket_length(max(len(w) for w in wavs),
                                self.cfg.bucket_wav)
        wav_batch = np.zeros((len(items), max_wav), np.float32)
        wav_lengths = np.zeros(len(items), np.int32)
        for i, w in enumerate(wavs):
            wav_batch[i, :len(w)] = w
            wav_lengths[i] = len(w)

        # batched device-side features (ONE mel call for the whole batch)
        mel = self.mel_fn(wav_batch)
        f0, energy, _ = self.f0_fn(wav_batch)
        T = mel.shape[1]
        frame_lengths = np.minimum(
            wav_lengths // self.cfg.audio.hop_length + 1, T).astype(np.int32)
        frame_mask = (np.arange(T)[None, :] < frame_lengths[:, None])

        if self.cfg.spec_augment and self.cfg.augment:
            mel = spec_augment(np.asarray(mel), rng)

        max_text = bucket_length(max(it["text_length"] for it in items),
                                 self.cfg.bucket_text)
        text_ids = np.zeros((len(items), max_text), np.int32)
        text_mask = np.zeros((len(items), max_text), bool)
        for i, it in enumerate(items):
            n = it["text_length"]
            text_ids[i, :n] = it["text_ids"]
            text_mask[i, :n] = True

        ftype = np.float16 if self.cfg.half else np.float32
        batch = {
            "wav": wav_batch[..., None].astype(ftype),
            "wav_length": wav_lengths,
            "mel": np.asarray(mel, ftype),
            "f0": np.asarray(f0, ftype),
            "energy": np.asarray(energy, ftype),
            "frame_length": frame_lengths,
            "frame_mask": frame_mask,
            "text_ids": text_ids,
            "text_mask": text_mask,
            "text_length": np.asarray([it["text_length"] for it in items],
                                      np.int32),
            "text_emb": np.stack([it["text_emb"] for it in items]).astype(ftype),
            "speaker_id": np.asarray([it["speaker_id"] for it in items],
                                     np.int32),
            "domain_id": np.asarray([it["domain_id"] for it in items],
                                    np.int32),
            "style_id": np.asarray([it["style_id"] for it in items],
                                   np.int32),
            "transcripts": [it["transcript"] for it in items],
            "collate_time": time.perf_counter() - t0,
        }
        return batch
