"""Golden-statistic regression tests: fixed-seed output moments.

Guards future refactors (round 2+) against silent numerical drift in the
five model forwards. Tolerances are loose enough to survive XLA version
bumps but catch semantic changes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ttsx.core.config import S4Config, AudioConfig
from ttsx.nn.s4 import ssm_kernel, fft_dw_conv
from ttsx.dsp import mel_spectrogram, extract_f0_energy
from ttsx.pipeline.sentiment import polarity_scores
from ttsx.pipeline.drift import savgol_smooth


def test_ssm_kernel_golden():
    a = jnp.asarray([[-0.5, -1.0]])
    b = jnp.ones((1, 2))
    c = jnp.asarray([[[1.0], [1.0]]])  # H=1, d=2, e=1
    k = np.asarray(ssm_kernel(a, b, c, 4))[0]
    expected = np.exp(-0.5 * np.arange(4)) + np.exp(-1.0 * np.arange(4))
    np.testing.assert_allclose(k, expected, rtol=1e-5)


def test_fft_conv_golden_impulse():
    # impulse input -> output equals the kernel itself
    x = jnp.zeros((1, 8, 1)).at[0, 0, 0].set(1.0)
    w = jnp.asarray(np.arange(1.0, 9.0)[None, :], jnp.float32)
    y = np.asarray(fft_dw_conv(x, w, causal=True))[0, :, 0]
    np.testing.assert_allclose(y, np.arange(1.0, 9.0), atol=1e-4)


def test_mel_frontend_golden_sine():
    cfg = AudioConfig(sample_rate=16000, n_fft=512, win_length=512,
                      hop_length=128, n_mels=40, mel_normalize=False)
    t = np.arange(8000) / 16000
    wav = jnp.asarray(np.sin(2 * np.pi * 440 * t, dtype=np.float32))[None]
    mel = np.asarray(mel_spectrogram(wav, cfg))
    # peak mel bin for 440 Hz with HTK filterbank at these settings
    # (f_max defaults to 8000: 40 triangles over 0-8 kHz mel scale)
    peak = int(mel[0, 30].argmax())
    assert peak == 7, f"peak mel bin moved: {peak}"
    assert abs(float(mel.mean()) - (-4.855)) < 0.3


def test_f0_golden_sine():
    cfg = AudioConfig(sample_rate=16000, n_fft=512, win_length=512,
                      hop_length=128, n_mels=40)
    t = np.arange(16000) / 16000
    wav = jnp.asarray(np.sin(2 * np.pi * 173 * t, dtype=np.float32))[None]
    f0, _, voiced = extract_f0_energy(wav, cfg)
    med = float(np.median(np.asarray(f0)[np.asarray(voiced)]))
    assert abs(med - 173.0) < 6.0


def test_sentiment_golden():
    s = polarity_scores("I love this wonderful day")
    assert abs(s["compound"] - 0.87) < 0.08
    s2 = polarity_scores("I hate this terrible awful pain")
    assert s2["compound"] < -0.8


def test_savgol_golden():
    x = np.zeros(11)
    x[5] = 1.0
    sm = savgol_smooth(x, window=5, order=2)
    # quadratic SavGol center coefficient for w=5 is 17/35
    assert abs(sm[5] - 17.0 / 35.0) < 1e-6


def test_model_forward_moments():
    """Fixed-seed forward moments for the tiny pipeline."""
    from tests.test_serve import tiny_cfg
    from ttsx.models.pipeline import TTSPipeline
    cfg = tiny_cfg()
    pipe = TTSPipeline(cfg)
    k = jax.random.PRNGKey(1234)
    params = pipe.init_params(k, batch=1, frames=8)
    ks = jax.random.split(k, 4)
    out = pipe.synthesize(
        params,
        jax.random.normal(ks[0], (1, 8, 16)),
        jax.random.normal(ks[1], (1, 8, 18)),
        jnp.full((1, 6), 1 / 6),
        jax.random.normal(ks[2], (1, 8)),
        jnp.zeros((1,), jnp.int32))
    wav_std = float(jnp.std(out.wav))
    mel_std = float(jnp.std(out.mel0))
    # wav_std 0.0116 re-recorded 2026-08-17 after the zero-init-FiLM +
    # cond-LayerNorm change (the untrained generator is deliberately
    # quieter now — round-1 value was 0.02); loose guard band
    assert 0.5 * 0.0116 < wav_std < 5.0, wav_std
    assert np.isfinite(mel_std) and mel_std > 0
