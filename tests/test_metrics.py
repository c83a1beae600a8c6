import numpy as np

from ttsx.eval import (
    compute_eer, all_pairs_eer, mel_cepstral_distortion,
    diarization_error_rate, cluster_purity, silhouette_score)


def test_eer_separable():
    scores = np.array([0.9, 0.8, 0.85, 0.1, 0.2, 0.15])
    labels = np.array([1, 1, 1, 0, 0, 0])
    assert compute_eer(scores, labels) == 0.0


def test_eer_random_is_half():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=4000)
    labels = rng.integers(0, 2, size=4000)
    assert abs(compute_eer(scores, labels) - 0.5) < 0.05


def test_eer_degenerate_inf():
    assert compute_eer(np.array([0.5, 0.6]), np.array([1, 1])) == float("inf")


def test_all_pairs_eer_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 8)) * 0.05 + np.array([1.0] + [0.0] * 7)
    b = rng.normal(size=(20, 8)) * 0.05 + np.array([0.0, 1.0] + [0.0] * 6)
    emb = np.concatenate([a, b])
    ids = np.array([0] * 20 + [1] * 20)
    assert all_pairs_eer(emb, ids) < 0.05


def test_mcd_identity_zero():
    mel = np.random.default_rng(0).normal(size=(50, 80))
    assert mel_cepstral_distortion(mel, mel) == 0.0
    noisy = mel + np.random.default_rng(1).normal(size=mel.shape) * 0.1
    assert mel_cepstral_distortion(mel, noisy) > 0.0


def test_mcd_gain_invariant():
    # a constant per-frame offset only moves c0, which standard MCD excludes
    mel = np.random.default_rng(0).normal(size=(50, 80))
    assert mel_cepstral_distortion(mel, mel + 3.0) < 1e-9


def test_mcd_hand_computed():
    # perturb along the orthonormal DCT-II k=1 basis row: the cepstral
    # difference is exactly `a` in c1 and zero elsewhere, so
    # MCD = 10/ln10 * sqrt(2) * |a|
    M, a = 80, 0.7
    m_idx = np.arange(M)
    basis_k1 = np.cos(np.pi * (m_idx + 0.5) / M) * np.sqrt(2.0 / M)
    mel = np.random.default_rng(0).normal(size=(20, M))
    mel_b = mel + a * basis_k1[None, :]
    expect = 10.0 / np.log(10.0) * np.sqrt(2.0) * a
    got = mel_cepstral_distortion(mel, mel_b)
    assert abs(got - expect) < 1e-9


def test_mcd_dtw_alignment():
    # time-shifted copy: index pairing sees a big distortion, DTW ~none
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(60, 80)).cumsum(axis=0) * 0.1
    shifted = mel[5:]
    raw = mel_cepstral_distortion(mel, shifted)
    aligned = mel_cepstral_distortion(mel, shifted, align=True)
    assert aligned < raw * 0.5


def test_der_perfect():
    ref = [(0.0, 1.0, "A"), (1.0, 2.0, "B")]
    assert diarization_error_rate(ref, ref) < 0.01


def test_der_swapped_labels_ok():
    ref = [(0.0, 1.0, "A"), (1.0, 2.0, "B")]
    hyp = [(0.0, 1.0, "X"), (1.0, 2.0, "Y")]
    assert diarization_error_rate(ref, hyp) < 0.01


def test_der_wrong():
    ref = [(0.0, 2.0, "A")]
    hyp = [(0.0, 2.0, "X"), (0.0, 0.0, "Y")]
    # one speaker covering everything -> perfect after mapping
    assert diarization_error_rate(ref, hyp) < 0.01
    hyp2 = []
    assert diarization_error_rate(ref, hyp2) > 0.9


def test_der_collar_forgives_boundary_jitter():
    ref = [(0.0, 1.0, "A"), (1.35, 2.35, "B")]
    # hyp boundaries jittered by 0.1 s and padded into the gap
    hyp = [(0.0, 1.1, "X"), (1.25, 2.35, "Y")]
    strict = diarization_error_rate(ref, hyp)
    forgiving = diarization_error_rate(ref, hyp, collar=0.25)
    assert strict > 0.05          # padding scores as false alarm
    assert forgiving < 0.01       # collar excludes the boundary zone
    # collar must not hide a genuine mid-segment confusion
    hyp_conf = [(0.0, 1.0, "X"), (1.35, 2.35, "X")]
    assert diarization_error_rate(ref, hyp_conf, collar=0.25) > 0.3


def test_purity():
    assert cluster_purity(np.array([0, 0, 1, 1]),
                          np.array([5, 5, 7, 7])) == 1.0
    assert cluster_purity(np.array([0, 0, 0, 0]),
                          np.array([5, 5, 7, 7])) == 0.5


def test_silhouette():
    a = np.zeros((10, 2)) + [0, 0]
    b = np.zeros((10, 2)) + [10, 10]
    x = np.concatenate([a, b]) + np.random.default_rng(0).normal(
        size=(20, 2)) * 0.1
    labels = np.array([0] * 10 + [1] * 10)
    assert silhouette_score(x, labels) > 0.8


def test_wav_quality_voiced_mask():
    """Voiced-only MCD excludes the silent-gap frames that dilute the
    overall number (both signals silent -> trivially-matched cepstra)."""
    from ttsx.eval.parity_e2e import _wav_quality
    sr = 22050
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 220 * t)
    gate = (np.sin(2 * np.pi * 2 * t) > 0).astype(np.float32)
    real = (tone * gate).astype(np.float32)[None]
    fake = (0.7 * tone * gate).astype(np.float32)[None]
    q = _wav_quality(fake, real)
    assert np.isfinite(q["wav_mcd_voiced_db"])
    # mask recovers roughly the 50% duty cycle of the gating
    assert 0.4 < q["voiced_frac"] < 0.75
    # identical signals -> both MCDs ~0
    q0 = _wav_quality(real, real)
    assert q0["wav_mcd_db"] < 1e-3 and q0["wav_mcd_voiced_db"] < 1e-3


def test_wav_quality_dr40_floor():
    """The 40 dB dynamic-range-floored MCD must discriminate an inaudible
    noise floor (perfect copy + -70 dB broadband noise: quiet-bin log
    ratios blow up the raw MCD) from audible distortion (waveshaping),
    which the raw readout scores nearly identically."""
    from ttsx.eval.parity_e2e import _wav_quality
    sr = 22050
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    real = (0.5 * (np.sin(2 * np.pi * 220 * t)
                   + 0.3 * np.sin(2 * np.pi * 440 * t))).astype(
        np.float32)[None]
    noise = rng.normal(size=real.shape).astype(np.float32)
    noise *= (np.sqrt((real ** 2).mean())
              / np.sqrt((noise ** 2).mean())) * 10 ** (-70 / 20)
    inaudible = real + noise
    distorted = (np.tanh(3 * real) / 3 * 1.4).astype(np.float32)
    q_noise = _wav_quality(inaudible, real)
    q_dist = _wav_quality(distorted, real)
    # raw MCD can NOT separate the two regimes ...
    assert q_noise["wav_mcd_db"] > 0.5 * q_dist["wav_mcd_db"]
    # ... the floored readout separates them by a wide margin
    assert q_noise["wav_mcd_dr40_db"] < 0.35 * q_dist["wav_mcd_dr40_db"]
    # and a perfect copy still scores ~0
    q0 = _wav_quality(real, real)
    assert q0["wav_mcd_dr40_db"] < 1e-3


def test_wav_quality_continuous_voiced():
    """A continuously-voiced signal (no silent gaps) must count ~all frames
    as voiced: the relative loudness threshold only applies when the
    distribution is actually bimodal, and loudness is total (linear-domain)
    energy, not mean log-mel (which under-scores pure tones vs broadband
    edge frames)."""
    from ttsx.eval.parity_e2e import _wav_quality
    sr = 22050
    t = np.arange(sr) / sr
    real = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    q = _wav_quality(real, real)
    assert q["voiced_frac"] > 0.9, q


def test_der_overlap_aware():
    """NIST-style set scoring: an overlapped frame needs BOTH reference
    speakers in the hypothesis for full credit; matching one of two is
    half an error (miss), and a both-speaker hypothesis scores 0."""
    ref = [(0.0, 2.0, "a"), (1.5, 3.5, "b")]  # 1.5-2.0 overlapped
    # total ref speaker time = 1.5 + 2*0.5 + 1.5 = 4.0 s
    hyp_a = [(0.0, 2.0, "x"), (2.0, 3.5, "y")]  # overlap region -> a only
    hyp_b = [(0.0, 1.5, "x"), (1.5, 3.5, "y")]  # overlap region -> b only
    # 0.5 s of single-speaker miss on 4.0 s -> 0.125
    assert abs(diarization_error_rate(ref, hyp_a) - 0.125) < 0.01
    assert abs(diarization_error_rate(ref, hyp_b) - 0.125) < 0.01
    # emitting BOTH speakers over the overlap region is exact
    hyp_both = [(0.0, 2.0, "x"), (1.5, 3.5, "y")]
    assert diarization_error_rate(ref, hyp_both) < 0.01
    # non-overlapping behavior unchanged: wrong-speaker still errors
    hyp_bad = [(0.0, 3.5, "x")]
    assert diarization_error_rate(ref, hyp_bad) > 0.3
    # spurious extra overlap speaker is a false alarm, not free
    hyp_fa = [(0.0, 2.0, "x"), (1.5, 3.5, "y"), (0.0, 1.5, "z")]
    assert diarization_error_rate(ref, hyp_fa) > 0.3
