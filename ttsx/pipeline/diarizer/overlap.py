"""Overlap detection.

Re-designs hyper_diarizer/overlap.py:40-88: per-slice spectral-flux screen
plus inter-slice gap-energy vs per-speaker median and low cross-similarity
-> overlap tuples (start, end, spk1, spk2, confidence). The reference's
tiny CNN gate (overlap.py:18-33 — shipped with a RANDOM-init fallback) has
a TRAINED jax counterpart in overlap_net.py; pass it as `screen=` to use
it, or leave None for the weight-free flux+energy heuristic.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ttsx.core.config import AudioConfig


def spectral_flux(wav: np.ndarray, au: AudioConfig) -> np.ndarray:
    import jax.numpy as jnp
    from ttsx.dsp import stft_magnitude
    mag = np.asarray(stft_magnitude(jnp.asarray(wav[None]), au.n_fft,
                                    au.hop_length))[0]
    d = np.diff(mag, axis=0, prepend=mag[:1])
    return np.sqrt((np.maximum(d, 0) ** 2).sum(axis=1))


def detect_overlaps(wav: np.ndarray, au: AudioConfig,
                    slices: List[Tuple[float, float]],
                    labels: np.ndarray, embs: np.ndarray,
                    flux_z: float = 1.5, sim_thresh: float = 0.5,
                    screen=None, screen_thresh: float = 0.5
                    ) -> List[Tuple[float, float, int, int, float]]:
    """Returns [(start_s, end_s, label_a, label_b, confidence)...].

    `screen`: optional learned classifier (overlap_net.OverlapScreen,
    wav window -> P(overlap)) replacing the reference's OverlapClassifier
    CNN gate (hyper_diarizer/overlap.py:18-33). When given, each adjacent
    different-speaker junction is decided by the screen's probability on
    a window centered at the junction; the flux+energy heuristic below
    is the no-weights fallback."""
    if len(slices) < 2:
        return []
    sr_ = au.sample_rate
    if screen is not None:
        out = []
        half = int(0.25 * sr_)
        for i in range(len(slices) - 1):
            a_end, b_start = slices[i][1], slices[i + 1][0]
            la, lb = int(labels[i]), int(labels[i + 1])
            if la == lb or b_start - a_end > 0.5:
                continue
            mid = int(0.5 * (a_end + b_start) * sr_)
            win = wav[max(mid - half, 0):mid + half]
            if not len(win):
                continue
            prob = float(screen(win))
            if prob > screen_thresh:
                out.append((round(min(a_end, b_start) - 0.05, 3),
                            round(max(a_end, b_start) + 0.05, 3),
                            la, lb, round(prob, 3)))
        return out
    sr = au.sample_rate
    flux = spectral_flux(wav, au)
    hop_s = au.hop_length / sr
    fz = (flux - flux.mean()) / (flux.std() + 1e-8)

    # per-speaker median gap energy
    energies: Dict[int, List[float]] = {}
    for (s, e), l in zip(slices, labels):
        seg = wav[int(s * sr):int(e * sr)]
        if len(seg):
            energies.setdefault(int(l), []).append(
                float(np.sqrt(np.mean(seg ** 2))))
    med = {l: np.median(v) for l, v in energies.items()}

    e_norm = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    overlaps = []
    for i in range(len(slices) - 1):
        a_end = slices[i][1]
        b_start = slices[i + 1][0]
        la, lb = int(labels[i]), int(labels[i + 1])
        if la == lb or b_start - a_end > 0.5:
            continue
        gap_lo = int(min(a_end, b_start) * sr)
        gap_hi = int(max(a_end, b_start) * sr) + int(0.1 * sr)
        gap = wav[gap_lo:gap_hi]
        if not len(gap):
            continue
        gap_energy = float(np.sqrt(np.mean(gap ** 2)))
        ref = 0.5 * (med.get(la, 0) + med.get(lb, 0)) + 1e-8
        f_lo = int(gap_lo / au.hop_length / sr * sr)
        f_hi = max(f_lo + 1, int(gap_hi / au.hop_length / sr * sr))
        flux_hit = fz[min(f_lo, len(fz) - 1):min(f_hi, len(fz))].max() \
            if len(fz) else 0.0
        cross_sim = float(e_norm[i] @ e_norm[i + 1])
        if gap_energy > 0.8 * ref and cross_sim < sim_thresh:
            conf = float(np.clip(
                0.5 * (gap_energy / ref - 0.8)
                + 0.3 * max(flux_hit / flux_z, 0)
                + 0.2 * (sim_thresh - cross_sim), 0.0, 1.0))
            overlaps.append((round(min(a_end, b_start) - 0.05, 3),
                             round(max(a_end, b_start) + 0.05, 3),
                             la, lb, round(conf, 3)))
    return overlaps
