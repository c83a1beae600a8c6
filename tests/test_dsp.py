import numpy as np
import jax.numpy as jnp

from ttsx.core.config import AudioConfig
from ttsx.dsp import (
    mel_spectrogram, stft_magnitude, mel_filterbank, extract_f0_energy,
    energy_vad, mfcc)

CFG = AudioConfig(sample_rate=16000, n_fft=512, win_length=512,
                  hop_length=128, n_mels=40, mel_normalize=False)


def _sine(freq, seconds, sr):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_stft_matches_numpy():
    wav = _sine(440.0, 0.2, CFG.sample_rate)[None]
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), CFG.n_fft,
                                    CFG.hop_length))
    # numpy reference: same framing (centered, reflect) + periodic hann
    pad = np.pad(wav[0], CFG.n_fft // 2, mode="reflect")
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(CFG.n_fft) / CFG.n_fft))
    frames = []
    for start in range(0, len(pad) - CFG.n_fft + 1, CFG.hop_length):
        frames.append(pad[start:start + CFG.n_fft] * win)
    ref = np.abs(np.fft.rfft(np.stack(frames), axis=-1))
    assert mag.shape[1] == len(frames)
    np.testing.assert_allclose(mag[0], ref, atol=1e-3)


def test_stft_peak_bin():
    wav = _sine(1000.0, 0.2, CFG.sample_rate)[None]
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), CFG.n_fft,
                                    CFG.hop_length))
    peak = mag[0, 10].argmax()
    expected = round(1000.0 * CFG.n_fft / CFG.sample_rate)
    assert abs(int(peak) - expected) <= 1


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    assert fb.sum(axis=0).min() > 0  # every mel bin gets energy


def test_mel_spectrogram_shape():
    wav = jnp.asarray(_sine(440.0, 0.3, CFG.sample_rate)[None])
    mel = mel_spectrogram(wav, CFG)
    assert mel.shape[0] == 1 and mel.shape[2] == CFG.n_mels
    assert np.isfinite(np.asarray(mel)).all()


def test_f0_tracking_sine():
    wav = jnp.asarray(_sine(220.0, 0.5, CFG.sample_rate)[None])
    f0, energy, voiced = extract_f0_energy(wav, CFG)
    f0 = np.asarray(f0)[0]
    voiced = np.asarray(voiced)[0]
    assert voiced.mean() > 0.8
    est = np.median(f0[voiced])
    assert abs(est - 220.0) < 10.0


def test_vad_silence_vs_speech():
    sr = CFG.sample_rate
    sil = np.zeros(sr // 4, np.float32)
    tone = _sine(300.0, 0.25, sr)
    wav = jnp.asarray(np.concatenate([sil, tone])[None])
    v = np.asarray(energy_vad(wav, CFG))[0]
    half = len(v) // 2
    assert v[:half - 2].mean() < 0.2
    assert v[half + 2:].mean() > 0.8


def test_mfcc_shape():
    wav = jnp.asarray(_sine(440.0, 0.2, CFG.sample_rate)[None])
    m = mfcc(wav, CFG, 13)
    assert m.shape[-1] == 13
