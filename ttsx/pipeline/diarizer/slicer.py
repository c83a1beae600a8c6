"""Dynamic VAD slicer.

Re-designs hyper_diarizer/slicer.py:26-99: hybrid VAD probability fusion,
noise-amplitude estimate from non-speech gaps, duration filter 1.5-6 s &
prob > 0.5, speaker-aware gap merge < 0.2 s, +-0.1 s padding.

The reference fuses Silero (torch.hub) + WebRTC 30 ms frames; both are
external native deps (SURVEY §2.9). Here the probability comes from a
fused energy + spectral-flatness VAD computed with the JAX DSP frontend
(batched, jit); a learned VAD can be plugged in via `prob_fn`.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from ttsx.core.config import AudioConfig


def vad_probabilities(wav: np.ndarray, au: AudioConfig) -> np.ndarray:
    """Fused speech probability per frame from energy + spectral flatness."""
    import jax.numpy as jnp
    from ttsx.dsp import stft_magnitude
    mag = np.asarray(stft_magnitude(jnp.asarray(wav[None]), au.n_fft,
                                    au.hop_length))[0]  # [T, bins]
    energy = mag.sum(axis=1)
    e_ref = np.percentile(energy, 95) + 1e-8
    p_energy = np.clip(energy / (0.15 * e_ref), 0.0, 1.0)
    # spectral flatness: low for voiced speech, ~1 for noise/silence
    geo = np.exp(np.mean(np.log(mag + 1e-8), axis=1))
    arith = mag.mean(axis=1) + 1e-8
    flatness = geo / arith
    p_tonal = np.clip(1.0 - flatness * 2.0, 0.0, 1.0)
    return 0.6 * p_energy + 0.4 * p_tonal  # probability fusion


def estimate_noise_amplitude(wav: np.ndarray, probs: np.ndarray,
                             au: AudioConfig) -> float:
    """RMS over non-speech gaps (slicer.py noise estimate)."""
    hop = au.hop_length
    mask = probs < 0.3
    if not mask.any():
        return 0.0
    idx = np.where(mask)[0]
    samples = np.concatenate([wav[i * hop:(i + 1) * hop] for i in idx[:200]])
    return float(np.sqrt(np.mean(samples ** 2) + 1e-12))


def dynamic_slice(wav: np.ndarray, au: AudioConfig,
                  min_dur: float = 1.5, max_dur: float = 6.0,
                  prob_thresh: float = 0.5, merge_gap: float = 0.2,
                  pad: float = 0.1,
                  prob_fn: Optional[Callable] = None,
                  speaker_embs: Optional[np.ndarray] = None,
                  emb_sim_thresh: float = 0.6,
                  snap_edges: bool = True
                  ) -> Tuple[List[Tuple[float, float]], dict]:
    """Returns ([(start_s, end_s)...], stats)."""
    probs = (prob_fn or vad_probabilities)(wav, au)
    hop_s = au.hop_length / au.sample_rate
    speech = probs > prob_thresh

    # raw regions
    regions: List[List[float]] = []
    start = None
    for i, on in enumerate(speech):
        if on and start is None:
            start = i
        elif not on and start is not None:
            regions.append([start * hop_s, i * hop_s,
                            float(probs[start:i].mean())])
            start = None
    if start is not None:
        regions.append([start * hop_s, len(speech) * hop_s,
                        float(probs[start:].mean())])

    # gap merge < merge_gap (speaker-aware when embeddings given)
    merged: List[List[float]] = []
    for r in regions:
        if merged and r[0] - merged[-1][1] < merge_gap:
            same_speaker = True
            if speaker_embs is not None and len(merged) - 1 < len(speaker_embs) \
                    and len(merged) < len(speaker_embs):
                a = speaker_embs[len(merged) - 1]
                b = speaker_embs[len(merged)]
                same_speaker = float(np.dot(a, b) / (
                    np.linalg.norm(a) * np.linalg.norm(b) + 1e-8)) \
                    > emb_sim_thresh
            if same_speaker:
                merged[-1][1] = r[1]
                merged[-1][2] = max(merged[-1][2], r[2])
                continue
        merged.append(list(r))

    # duration filter + max-dur split + padding
    total_s = len(wav) / au.sample_rate
    slices: List[Tuple[float, float]] = []
    for s, e, p in merged:
        if p <= prob_thresh:
            continue
        seg = e - s
        if seg < min_dur:
            continue
        while seg > max_dur:
            slices.append((max(0.0, s - pad), min(total_s, s + max_dur + pad)))
            s += max_dur
            seg = e - s
        if seg >= min_dur:
            slices.append((max(0.0, s - pad), min(total_s, e + pad)))

    if snap_edges:
        slices = _snap_edges(slices, probs, hop_s, total_s,
                             lo=0.5 * prob_thresh)

    stats = {
        "n_raw_regions": len(regions),
        "n_slices": len(slices),
        "noise_amplitude": estimate_noise_amplitude(wav, probs, au),
        "mean_prob": float(probs.mean()),
    }
    return slices, stats


def _snap_edges(slices: List[Tuple[float, float]], probs: np.ndarray,
                hop_s: float, total_s: float,
                lo: float = 0.25) -> List[Tuple[float, float]]:
    """Shrink each padded slice to its outermost frame with prob > lo.

    The reference pads every slice by a blind ±0.1 s (slicer.py) to avoid
    clipping soft onsets the hard VAD threshold misses. Padding into true
    silence, however, is pure false-alarm time: on the 12-turn tone-corpus
    dialogue it accounts for the ENTIRE strict-DER remainder (0.166 ≈
    12 slices × 0.2 s / total speech; 0.00 DER with the 0.25 s collar).
    Hysteresis snapping keeps the soft-onset robustness — frames above
    the lower threshold survive — while silence pads are dropped. The
    slice core (frames > prob_thresh > lo) is always preserved."""
    out: List[Tuple[float, float]] = []
    n = len(probs)
    for s, e in slices:
        si = max(0, int(np.floor(s / hop_s)))
        ei = min(n, int(np.ceil(e / hop_s)))
        active = probs[si:ei] > lo
        if not active.any():
            out.append((s, e))
            continue
        first = si + int(np.argmax(active))
        last = si + len(active) - 1 - int(np.argmax(active[::-1]))
        out.append((max(s, first * hop_s), min(e, (last + 1) * hop_s,
                                               total_s)))
    return out
