"""All training losses across the five stages.

Reconstructs the reference's loss surface with the placeholder bugs fixed:
  * ArcFace / GE2E              (reference_encoder/loss.py:5-63)
  * ProsodyLoss                 (prosody3/prosody_loss.py:10-57)
  * CompositeLoss (acoustic)    (intent of the corrupted acoustic4/losses.py,
                                 weights used at train_acoutic.py:29,59)
  * GAN hinge/adv + feature-matching + R1  (vocoder7/losses.py:8-64, with
    real logits actually wired in and FM comparing fake-vs-real, fixing the
    placeholder empty `all_real` at losses.py:32 and self-comparison at
    losses.py:43-51)
  * refiner denoising L1        (sde_refiner5/trainer.py:9-74)
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# speaker-encoder losses
# ---------------------------------------------------------------------------
def arcface_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                 weight: jnp.ndarray, margin: float = 0.3,
                 scale: float = 30.0) -> jnp.ndarray:
    """weight: [num_classes, D] (a trainable param owned by the train state).
    Margin applied to the target logit only (loss.py:27-35)."""
    emb = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-8)
    w = weight / jnp.maximum(
        jnp.linalg.norm(weight, axis=-1, keepdims=True), 1e-8)
    cos = emb @ w.T
    one_hot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    logits = (cos - one_hot * margin) * scale
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def ge2e_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
              w: jnp.ndarray, b: jnp.ndarray,
              n_speakers: int, m_utts: int) -> jnp.ndarray:
    """Centroid-excluding-self similarity loss (loss.py:37-63).

    Requires the batch to be [n_speakers * m_utts] grouped by speaker, as
    the SpeakerBalancedSampler produces. labels must be 0..n_speakers-1
    repeated m_utts times.
    """
    d = embeddings.shape[-1]
    e = embeddings.reshape(n_speakers, m_utts, d)
    c = (jnp.sum(e, axis=1, keepdims=True) - e) / (m_utts - 1)  # excl. self
    e_n = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)
    c_n = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-8)
    # cross-speaker centroids (mean over all utts)
    cent = jnp.mean(e, axis=1)
    cent_n = cent / jnp.maximum(
        jnp.linalg.norm(cent, axis=-1, keepdims=True), 1e-8)
    # sim[i, j, k] = cos(e[i, j], centroid_k), self-centroid excl. own utt
    sim = jnp.einsum("imd,kd->imk", e_n, cent_n)
    own = jnp.einsum("imd,imd->im", e_n, c_n)
    idx = jnp.arange(n_speakers)
    sim = sim.at[idx, :, idx].set(own)
    logits = (jnp.abs(w) * sim + b).reshape(n_speakers * m_utts, n_speakers)
    labels_flat = jnp.repeat(idx, m_utts)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels_flat))


# ---------------------------------------------------------------------------
# prosody loss (prosody3/prosody_loss.py)
# ---------------------------------------------------------------------------
def _smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)


def prosody_loss(pred: Dict[str, jnp.ndarray], target: Dict[str, jnp.ndarray],
                 weights: Dict[str, float] | None = None,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted SmoothL1 across the 6 feature groups with optional [B, T]
    mask on the per-frame groups (prosody_loss.py:10-57)."""
    weights = weights or {}
    total = 0.0
    for key in ("f0", "energy", "pitch_var"):
        l = _smooth_l1(pred[key], target[key])
        if mask is not None:
            m = mask.astype(l.dtype)
            l = jnp.sum(l * m) / jnp.maximum(jnp.sum(m), 1.0)
        else:
            l = jnp.mean(l)
        total = total + weights.get(key, 1.0) * l
    for key in ("speech_rate", "pause_dur", "mfcc"):
        total = total + weights.get(key, 1.0) * jnp.mean(
            _smooth_l1(pred[key], target[key]))
    return total


# ---------------------------------------------------------------------------
# acoustic composite loss (intended acoustic4/losses.py)
# ---------------------------------------------------------------------------
def composite_acoustic_loss(out, target_mel: jnp.ndarray,
                            w_mel=1.0, w_mse=1.0, w_disc=0.5, w_diff=1.0,
                            w_emo=0.1, emotion_pred=None, emotion_target=None,
                            mask: jnp.ndarray | None = None):
    """mel L1 + frame MSE + adversarial (in-model mel disc) + diffusion
    noise-pred + optional emotion. Returns (loss, dict of parts)."""
    if mask is not None:
        m = mask[..., None].astype(target_mel.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0) * target_mel.shape[-1]
        mel_l1 = jnp.sum(jnp.abs(out.mel - target_mel) * m) / denom
        mel_mse = jnp.sum(((out.mel - target_mel) ** 2) * m) / denom
    else:
        mel_l1 = jnp.mean(jnp.abs(out.mel - target_mel))
        mel_mse = jnp.mean((out.mel - target_mel) ** 2)
    adv = 0.0
    for fl in out.fake_logits:
        adv = adv + jnp.mean((fl - 1.0) ** 2)  # LSGAN on fake-as-real
    adv = adv / max(len(out.fake_logits), 1)
    diff = jnp.mean(out.noise_pred ** 2)
    parts = {"mel_l1": mel_l1, "mel_mse": mel_mse, "adv": adv, "diff": diff}
    loss = w_mel * mel_l1 + w_mse * mel_mse + w_disc * adv + w_diff * diff
    if emotion_pred is not None and emotion_target is not None:
        emo = jnp.mean((emotion_pred - emotion_target) ** 2)
        parts["emo"] = emo
        loss = loss + w_emo * emo
    return loss, parts


# ---------------------------------------------------------------------------
# GAN losses (vocoder7/losses.py, fixed)
# ---------------------------------------------------------------------------
def hinge_d_loss(real_logits: Sequence[jnp.ndarray],
                 fake_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    d = 0.0
    for r, f in zip(real_logits, fake_logits):
        d = d + jnp.mean(nn_relu(1.0 - r)) + jnp.mean(nn_relu(1.0 + f))
    return d / max(len(real_logits), 1)


def hinge_g_loss(fake_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    g = 0.0
    for f in fake_logits:
        g = g - jnp.mean(f)
    return g / max(len(fake_logits), 1)


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def log_rms_energy_loss(wav_fake: jnp.ndarray, wav_real: jnp.ndarray,
                        eps: float = 1e-6) -> jnp.ndarray:
    """L1 between per-utterance log-RMS energies, [B, N, 1] waveforms.

    The multi-res STFT objective is log-magnitude per bin, so a generator
    that reproduces spectral SHAPE at ~0.7x amplitude pays little — the
    observed rms_ratio plateau (~0.65-0.68 at 24-48k steps on the tone
    corpus). An explicit scale term closes exactly that gap; log domain
    makes the gradient symmetric in over/under-estimation."""
    rms_f = jnp.sqrt(jnp.mean(jnp.square(wav_fake), axis=(1, 2)) + eps)
    rms_r = jnp.sqrt(jnp.mean(jnp.square(wav_real), axis=(1, 2)) + eps)
    return jnp.mean(jnp.abs(jnp.log(rms_f) - jnp.log(rms_r)))


def feature_matching_loss(fake_features: Sequence[Sequence[jnp.ndarray]],
                          real_features: Sequence[Sequence[jnp.ndarray]]):
    """L1 between fake and REAL features (fixes losses.py:43-51 which
    compared fake features against themselves)."""
    fm = 0.0
    n = 0
    for ff, rf in zip(fake_features, real_features):
        for f, r in zip(ff, rf):
            fm = fm + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
            n += 1
    return fm / max(n, 1)


def adversarial_warmup(step: jnp.ndarray, r1_interval: int) -> jnp.ndarray:
    """min(1, step / (r1_interval*10)) (losses.py:37)."""
    return jnp.minimum(1.0, step / (r1_interval * 10.0))


def r1_penalty(disc_apply, params, wav_real: jnp.ndarray) -> jnp.ndarray:
    """R1 gradient penalty on real waveforms (vocoder7/config.py r1_gamma;
    the reference notes it 'to be implemented in trainer' — here it is)."""
    def scalar_out(w):
        logits, _ = disc_apply(params, w)
        return sum(jnp.sum(l) for l in logits)
    g = jax.grad(scalar_out)(wav_real)
    return jnp.mean(jnp.sum(g ** 2, axis=tuple(range(1, g.ndim))))


# ---------------------------------------------------------------------------
# refiner denoising loss (sde_refiner5/trainer.py:9-74)
# ---------------------------------------------------------------------------
def refiner_loss(mel_ref: jnp.ndarray, mel_target: jnp.ndarray,
                 vq_loss: jnp.ndarray, l1_weight: float = 1.0,
                 sde_weight: float = 0.0, score=None, noise=None):
    l1 = jnp.mean(jnp.abs(mel_ref - mel_target))
    loss = l1_weight * l1 + vq_loss
    parts = {"l1": l1, "vq": vq_loss}
    if score is not None and noise is not None:
        sde = jnp.mean((score + noise) ** 2)  # score matching vs injected eps
        parts["sde"] = sde
        loss = loss + sde_weight * sde
    return loss, parts
