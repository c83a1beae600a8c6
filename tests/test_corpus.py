"""Synthetic parity corpora: ToneCorpus (narrowband harmonics) and
FormantCorpus (wideband source-filter speech-shaped audio)."""
import numpy as np
import pytest

from ttsx.core.config import AudioConfig
from ttsx.data.formantcorpus import FormantCorpus
from ttsx.data.tonecorpus import ToneCorpus
from ttsx.eval.parity_common import make_corpus

AU = AudioConfig()
_DR40 = 40.0 * np.log(10.0) / 10.0


def test_make_corpus_factory():
    assert isinstance(make_corpus("tone", n_speakers=2, audio=AU),
                      ToneCorpus)
    c = make_corpus("formant", n_speakers=2, audio=AU)
    assert isinstance(c, FormantCorpus)
    with pytest.raises(ValueError):
        make_corpus("speech")


def test_formant_deterministic():
    a = FormantCorpus(n_speakers=2, audio=AU, seed=3)
    b = FormantCorpus(n_speakers=2, audio=AU, seed=3)
    ua = a.utterance(1, 32, np.random.default_rng(7))
    ub = b.utterance(1, 32, np.random.default_rng(7))
    np.testing.assert_array_equal(ua.wav, ub.wav)
    np.testing.assert_array_equal(ua.phoneme_ids, ub.phoneme_ids)


def test_formant_features_contract_and_broadband():
    c = FormantCorpus(n_speakers=3, audio=AU, seed=0)
    utts = c.utterances(2, 48, seed=1)
    f = c.features(utts)
    T = f["mel"].shape[1]
    assert f["wav"].shape == (6, 48 * AU.hop_length, 1)
    assert f["mel"].shape == (6, T, 80) and T <= 48
    assert f["prosody"].shape == (6, T, 18)
    assert np.isfinite(f["wav"]).all() and np.isfinite(f["mel"]).all()
    # wideband: vast majority of mel bins within 40 dB of the utterance
    # peak (the tone corpus sits ~2/3 BELOW that floor) — the property
    # that makes raw MCD readouts comparable on this corpus
    dr = f["mel"].max(axis=(1, 2), keepdims=True) - f["mel"]
    assert (dr < _DR40).mean() > 0.9


def test_formant_f0_tracked():
    c = FormantCorpus(n_speakers=2, audio=AU, seed=0)
    rng = np.random.default_rng(0)
    u = c.utterance(0, 64, rng)
    f = c.features([u])
    f0 = f["f0"][0]
    med = np.median(f0[f0 > 0])
    # declination spans 1.05->0.92 around the base
    assert 0.9 * u.f0_hz < med < 1.07 * u.f0_hz


def test_formant_speakers_differ_in_timbre():
    """Same f0 group, different vocal-tract scale -> different spectral
    envelope (the property the EER experiment learns)."""
    c = FormantCorpus(n_speakers=4, audio=AU, seed=0, n_f0_groups=1)
    rng = np.random.default_rng(2)
    mels = []
    for spk in range(4):
        f = c.features([c.utterance(spk, 48, rng) for _ in range(2)])
        mels.append(f["mel"].mean(axis=(0, 1)))  # [80] mean log-mel
    mels = np.stack(mels)
    mels -= mels.mean(axis=1, keepdims=True)
    sim = np.corrcoef(mels)
    off = sim[~np.eye(4, dtype=bool)]
    # envelopes correlate far less across speakers than with themselves
    assert off.max() < 0.995 and off.mean() < 0.9


def test_formant_dialogue_inherited():
    c = FormantCorpus(n_speakers=3, audio=AU, seed=0)
    wav, segs = c.dialogue([0, 1], n_turns=4, turn_frames=(20, 30), seed=0)
    assert wav.ndim == 1 and len(segs) == 4
    assert segs[0][2] == "spk0" and segs[1][2] == "spk1"
    assert np.isfinite(wav).all()


def test_mel_energy_gain_recovers_scale():
    """A 0.5x-attenuated waveform vs the full-scale mel must yield a ~2x
    gain; a matched pair yields ~1. (Input-only loudness normalization —
    parity_common.mel_energy_gain.)"""
    from ttsx.eval.parity_common import AUDIO as PA, mel_energy_gain
    import jax.numpy as jnp
    from ttsx.dsp import mel_spectrogram

    sr = PA.sample_rate
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.1 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[None]
    mel_req = np.asarray(mel_spectrogram(jnp.asarray(wav), PA))
    g = mel_energy_gain(0.5 * wav, mel_req, PA)
    np.testing.assert_allclose(g, 2.0, rtol=0.05)
    g1 = mel_energy_gain(wav, mel_req, PA)
    np.testing.assert_allclose(g1, 1.0, rtol=0.02)


def test_dialogue_hard_overlaps_and_truth():
    from ttsx.data.tonecorpus import ToneCorpus
    c = ToneCorpus(n_speakers=6)
    wav, segs, ov = c.dialogue_hard(list(range(6)), n_turns=16,
                                    turn_frames=(20, 40),
                                    overlap_prob=0.5, noise_db=12.0,
                                    seed=0)
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()
    assert len(segs) == 16
    # overlapped onsets requested at p=0.5 over 15 junctions: some must
    # exist, and every region must be a genuine two-turn intersection
    assert len(ov) >= 2
    for (s, e) in ov:
        assert e > s
        covering = [seg for seg in segs if seg[0] < e and seg[1] > s]
        assert len(covering) >= 2
    # no immediate same-speaker repeats
    spks = [s[2] for s in segs]
    assert all(a != b for a, b in zip(spks, spks[1:]))


def test_formant_rich_speaker_cues():
    """'rich' adds stationary per-speaker voice-quality cues; 'vtl'
    (default) stays bit-identical to the round-2 corpus."""
    from ttsx.data.formantcorpus import FormantCorpus
    from ttsx.eval.parity_common import make_corpus
    base = FormantCorpus(n_speakers=4, seed=0)
    vtl = make_corpus("formant", n_speakers=4, seed=0)
    rich = make_corpus("formant_rich", n_speakers=4, seed=0)
    rng = np.random.default_rng(3)
    w_base = base.utterance(1, 32, np.random.default_rng(3)).wav
    w_vtl = vtl.utterance(1, 32, np.random.default_rng(3)).wav
    np.testing.assert_array_equal(w_base, w_vtl)
    w_rich = rich.utterance(1, 32, np.random.default_rng(3)).wav
    assert not np.array_equal(w_base, w_rich)
    # cues are per-speaker distinct
    assert len(set(np.round(rich.spk_tilt, 6))) == 4
    assert len(set(np.round(rich.spk_breath_mul, 6))) == 4
    import pytest
    with pytest.raises(ValueError):
        FormantCorpus(n_speakers=4, speaker_cues="nope")
