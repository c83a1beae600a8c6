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


def make_corpus(kind: str = "tone", **kw):
    """Corpus factory shared by every parity experiment.

    "tone" = narrowband additive harmonics (fast learnability checks);
    "formant" = wideband source-filter speech-shaped audio
    (ttsx/data/formantcorpus.py); "formant_rich" = same plus per-speaker
    voice-quality cues (breathiness, spectral tilt, vibrato) for the
    speaker-EER contingency. CLI: --arg corpus='"formant"'."""
    from ttsx.data.tonecorpus import ToneCorpus
    if kind == "tone":
        return ToneCorpus(**kw)
    if kind in ("formant", "formant_rich"):
        from ttsx.data.formantcorpus import FormantCorpus
        if kind == "formant_rich":
            kw["speaker_cues"] = "rich"
        return FormantCorpus(**kw)
    raise ValueError(f"unknown corpus kind {kind!r} (expected 'tone', "
                     "'formant' or 'formant_rich')")


def mel_energy_gain(wav: np.ndarray, mel_req: np.ndarray,
                    audio: AudioConfig) -> np.ndarray:
    """Per-utterance scalar gain matching the re-analyzed mel ENERGY of
    `wav` [B, N] to a requested raw (natural-log, unnormalized) mel
    [B, T, M] — input-only loudness normalization for the vocoder.

    The generator's conditioning carries no absolute-scale cue (input mel
    is per-utterance normalized, the prosody energy channel is z-scored,
    cepstra exclude c0), so trained generators plateau at rms_ratio
    0.65-0.70. The gain must be matched in the LINEAR energy domain
    (sqrt of summed exp(2*mel)): the log-mel MEAN goes the wrong way,
    because the under-loud generator simultaneously over-produces
    noise-floor bins, which dominate a log-domain average (measured:
    mean-log gains 0.44-0.97 vs energy gains 0.99-2.25 on the same
    utterances; energy matching reaches rms_ratio 0.986 vs an oracle RMS
    match at 1.0)."""
    import jax.numpy as jnp
    from ttsx.dsp import mel_spectrogram

    mel_gen = np.asarray(mel_spectrogram(jnp.asarray(wav), audio))
    t = min(mel_gen.shape[1], mel_req.shape[1])
    e_req = np.exp(2.0 * mel_req[:, :t]).mean(axis=(1, 2))
    e_gen = np.exp(2.0 * mel_gen[:, :t]).mean(axis=(1, 2))
    return np.sqrt(e_req / np.maximum(e_gen, 1e-20))


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
    # absolute-scale conditioning channel (VocoderConfig.scale_cond):
    # [mean || std] per utterance, [B, 2M]. Input-only — the stats come
    # from the requested mel, which IS the model input at copy-synthesis
    # time (same argument as mel_energy_gain below). Kept in model
    # batches; blocks ignore it unless scale_cond is on.
    out["mel_scale"] = np.concatenate(
        [mean[:, 0, :], std[:, 0, :]], axis=-1).astype(np.float32)
    return out


def _model_batch(d: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip eval-only stats keys from a features dict."""
    return {k: v for k, v in d.items() if k not in _STATS_KEYS}


def _denorm_mcd(pred_norm: np.ndarray, data: Dict[str, np.ndarray],
                j: int, mcd_fn) -> float:
    """MCD dB between a normalized prediction and the raw target mel."""
    raw = pred_norm * data["mel_std"][j] + data["mel_mean"][j]
    return mcd_fn(raw, data["mel_raw"][j])


def _acoustic_preds(a_block, a_state, data: Dict[str, np.ndarray],
                    batch: int):
    """Batched acoustic val_step over a features dict; returns
    (mel_pred [N, T, C], data truncated to the N full batches)."""
    import jax.numpy as jnp

    preds = []
    mb_all = _model_batch(data)
    for i in range(0, len(data["mel"]), batch):
        mb = {k: jnp.asarray(v[i:i + batch]) for k, v in mb_all.items()}
        if mb["mel"].shape[0] < batch:
            break
        preds.append(np.asarray(
            a_block.val_step(a_state.params, mb)["mel_pred"]))
    n = len(preds) * batch
    return np.concatenate(preds), {k: v[:n] for k, v in data.items()}


def _batch_sampler(feats: Dict[str, np.ndarray], batch: int, seed: int):
    rng = np.random.default_rng(seed)
    n = len(feats["mel"])
    while True:
        idx = rng.integers(0, n, batch)
        yield {k: v[idx] for k, v in feats.items()}


_STFT_RES = ((512, 128), (1024, 256), (2048, 512))


# natural-log-mel drop corresponding to 40 dB below the utterance peak.
# The raw MCD on narrowband audio is dominated by bins near the log_eps
# floor: an inaudible -70 dB broadband noise floor added to a PERFECT
# copy of the eval tones scores ~91 dB raw MCD (measured), on the order
# of the trained vocoder's whole reading, because quiet-bin log ratios
# are unbounded. Clamping both spectra 40 dB below the reference peak
# before the cepstral transform keeps audible structure (waveshaping
# distortion still scores ~78 dB) while bounding the floor term — the
# readout comparable across noise-floor differences.
_MCD_DR40 = 40.0 * np.log(10.0) / 10.0


def _wav_quality(wav_fake: np.ndarray, wav_real: np.ndarray) -> Dict:
    """WAV-domain quality: re-analysis mel MCD + multi-res STFT log-L1.

    Both inputs [B, N] float32 in [-1, 1].
    """
    import jax.numpy as jnp
    from ttsx.dsp import mel_spectrogram
    from ttsx.dsp.stft import stft_magnitude
    from ttsx.eval.metrics import mel_cepstral_distortion

    mel_f = np.asarray(mel_spectrogram(jnp.asarray(wav_fake), AUDIO))
    mel_r = np.asarray(mel_spectrogram(jnp.asarray(wav_real), AUDIO))
    mcds = [mel_cepstral_distortion(mel_f[i], mel_r[i])
            for i in range(mel_f.shape[0])]
    mcds_dr = []
    for i in range(mel_f.shape[0]):
        t = min(len(mel_f[i]), len(mel_r[i]))
        floor = mel_r[i][:t].max() - _MCD_DR40  # reference-anchored
        mcds_dr.append(mel_cepstral_distortion(
            np.maximum(mel_f[i][:t], floor), np.maximum(mel_r[i][:t], floor)))
    # voiced-only MCD: silent-gap frames (gated/real speech corpora)
    # trivially match and dilute the number; mask ground-truth frames in
    # the lower ~third of the per-utterance frame-loudness range (0.35
    # recovers the true duty cycle on gated tones, where the midpoint
    # over-prunes transition frames). A relative threshold only makes
    # sense when the distribution IS bimodal: if the loudness range is
    # small (continuously-voiced audio, no silent gaps — the current
    # ToneCorpus eval set, range ~0.9) every frame is voiced and
    # wav_mcd_voiced_db == wav_mcd_db.
    mcds_v, voiced = [], []
    for i in range(mel_f.shape[0]):
        t = min(len(mel_f[i]), len(mel_r[i]))
        # log of mean LINEAR energy: mean log-mel is a geometric mean, which
        # scores a pure tone (energy in few bins) below broadband edge
        # frames; total energy is the actual voiced/silent separator
        loud = np.log(np.mean(np.exp(mel_r[i][:t]), axis=-1) + 1e-12)
        rng_ = loud.max() - loud.min()
        if rng_ < 3.0:  # log-mel units; silence sits >> 3 below signal
            mask = np.ones(t, dtype=bool)
        else:
            mask = loud > loud.min() + 0.35 * rng_
        if mask.sum() >= 2:
            mcds_v.append(mel_cepstral_distortion(
                mel_f[i][:t][mask], mel_r[i][:t][mask]))
            voiced.append(float(mask.mean()))
    stft_l1_utt = 0.0  # [B] per-utterance accumulator across resolutions
    for n_fft, hop in _STFT_RES:
        mf = np.asarray(stft_magnitude(jnp.asarray(wav_fake), n_fft, hop))
        mr = np.asarray(stft_magnitude(jnp.asarray(wav_real), n_fft, hop))
        stft_l1_utt = stft_l1_utt + np.mean(
            np.abs(np.log(mf + 1e-5) - np.log(mr + 1e-5)), axis=(1, 2))
    stft_l1_utt = stft_l1_utt / len(_STFT_RES)
    rms = lambda w, ax=None: np.sqrt(np.mean(np.square(w), axis=ax) + 1e-12)
    rms_utt = rms(wav_fake, ax=1) / rms(wav_real, ax=1)  # per-utterance
    # per-utterance ±std on every headline readout (VERDICT r2 #10:
    # curve deltas of ~1 dB need error bars to be readable as signal)
    out = {"wav_mcd_db": float(np.mean(mcds)),
           "wav_mcd_db_std": float(np.std(mcds)),
           "wav_mcd_dr40_db": float(np.mean(mcds_dr)),
           "wav_mcd_dr40_db_std": float(np.std(mcds_dr)),
           "stft_log_l1": float(np.mean(stft_l1_utt)),
           "stft_log_l1_std": float(np.std(stft_l1_utt)),
           # amplitude sanity: ~1.0 when the generator reproduces energy
           "rms_ratio": float(rms(wav_fake) / rms(wav_real)),
           "rms_ratio_utt_std": float(np.std(rms_utt))}
    if mcds_v:
        out["wav_mcd_voiced_db"] = float(np.mean(mcds_v))
        out["voiced_frac"] = float(np.mean(voiced))
    return out
