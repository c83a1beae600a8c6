import numpy as np
import pytest

from ttsx.core.config import AudioConfig
from ttsx.data import (
    TTSDataset, TTSDatasetConfig, PhonemeFrontend, TextEncoder,
    SpeakerBalancedSampler, load_file_list, read_wav, write_wav,
    TTSCollator, CollatorConfig, AugmentationPipeline, add_noise,
    add_reverb, speed_perturb, spec_augment, mixup, bucket_length,
    synthetic_batch)

AU = AudioConfig(sample_rate=16000, n_fft=512, win_length=512,
                 hop_length=128, n_mels=40)


@pytest.fixture()
def audio_tree(tmp_path):
    rng = np.random.default_rng(0)
    for spk in ("alice", "bob"):
        for dom, sty in (("news", "calm"), ("story", "excited")):
            d = tmp_path / spk / dom / sty
            d.mkdir(parents=True)
            for i in range(2):
                wav = rng.normal(size=8000).astype(np.float32) * 0.1
                write_wav(d / f"utt{i}.wav", wav, 16000)
                (d / f"utt{i}.txt").write_text(f"hello world {spk} {i}")
    return tmp_path


def test_dataset_discovery(audio_tree):
    ds = TTSDataset(TTSDatasetConfig(audio_root=str(audio_tree), audio=AU))
    assert len(ds) == 8
    item = ds[0]
    assert item["wav"].dtype == np.float32
    assert item["text_ids"][0] == PhonemeFrontend.BOS
    assert item["text_emb"].shape == (384,)
    assert set(ds.spk2id) == {"alice", "bob"}
    assert set(ds.dom2id) == {"news", "story"}


def test_dataset_speaker_filter(audio_tree):
    ds = TTSDataset(TTSDatasetConfig(audio_root=str(audio_tree), audio=AU,
                                     include_speakers=["alice"]))
    assert len(ds) == 4


def test_dataset_max_frames(audio_tree):
    ds = TTSDataset(TTSDatasetConfig(audio_root=str(audio_tree), audio=AU,
                                     max_frames=10))
    assert len(ds[0]["wav"]) <= 10 * AU.hop_length


def test_wav_roundtrip(tmp_path):
    wav = np.sin(np.linspace(0, 100, 4000)).astype(np.float32) * 0.5
    write_wav(tmp_path / "a.wav", wav, 16000)
    back, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1e-3)
    resampled, sr2 = read_wav(tmp_path / "a.wav", target_sr=8000)
    assert sr2 == 8000 and abs(len(resampled) - 2000) < 3


def test_frontend_and_text_encoder():
    fe = PhonemeFrontend()
    ids = fe("Hello, world!")
    assert ids[0] == fe.BOS and ids[-1] == fe.EOS
    te = TextEncoder(64)
    v1, v2 = te("hello world"), te("hello world")
    np.testing.assert_allclose(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    assert not np.allclose(te("hello world"), te("goodbye moon"))


def test_load_file_list(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("a.wav\tspk1\nb.wav\tspk2\n# comment\nc.wav spk3\n")
    fl = load_file_list(p)
    assert fl == [("a.wav", "spk1"), ("b.wav", "spk2"), ("c.wav", "spk3")]


def test_speaker_balanced_sampler():
    ids = [0] * 6 + [1] * 6 + [2] * 2  # speaker 2 lacks utterances
    s = SpeakerBalancedSampler(ids, spk_per_batch=2, utts_per_spk=3, seed=0)
    batch = next(iter(s))
    assert len(batch) == 6
    spk = [0 if i < 6 else 1 for i in batch]
    assert spk.count(0) == 3 and spk.count(1) == 3


def test_augments_shapes():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=4000).astype(np.float32) * 0.1
    assert add_noise(wav, rng).shape == wav.shape
    assert add_reverb(wav, rng).shape == wav.shape
    sp = speed_perturb(wav, rng)
    assert abs(len(sp) - len(wav)) > 100  # speed changed the length


def test_spec_augment_masks():
    mel = np.ones((1, 50, 40), np.float32)
    out = spec_augment(mel, np.random.default_rng(3), freq_mask=10,
                       time_mask=10)
    assert (out == 0).any()
    assert mel.sum() == 50 * 40  # input untouched


def test_mixup():
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(4, 10, 8)).astype(np.float32)
    labels = np.arange(4)
    mixed, l1, l2, lam = mixup(mel, labels, rng)
    assert mixed.shape == mel.shape and 0 <= lam <= 1


def test_collator_contract(audio_tree):
    ds = TTSDataset(TTSDatasetConfig(audio_root=str(audio_tree), audio=AU))
    coll = TTSCollator(CollatorConfig(audio=AU, augment=False,
                                      bucket_wav=1024, bucket_text=16))
    batch = coll([ds[i] for i in range(4)])
    expected = {"wav", "wav_length", "mel", "f0", "energy", "frame_length",
                "frame_mask", "text_ids", "text_mask", "text_length",
                "text_emb", "speaker_id", "domain_id", "style_id",
                "transcripts", "collate_time"}
    assert expected <= set(batch)
    assert batch["mel"].shape[0] == 4 and batch["mel"].shape[2] == AU.n_mels
    assert batch["wav"].shape[1] % 1024 == 0  # bucketed
    assert batch["frame_mask"].dtype == bool
    assert batch["collate_time"] > 0


def test_collator_cache_and_reproducibility(audio_tree):
    ds = TTSDataset(TTSDatasetConfig(audio_root=str(audio_tree), audio=AU))
    coll = TTSCollator(CollatorConfig(audio=AU, augment=True,
                                      bucket_wav=1024, bucket_text=16,
                                      cache_features=True, seed=7))
    b1 = coll([ds[0], ds[1]], epoch=0, batch_idx=0)
    b2 = coll([ds[0], ds[1]], epoch=0, batch_idx=0)
    np.testing.assert_allclose(b1["wav"], b2["wav"])  # cache hit


def test_collator_to_trainer_adapter(audio_tree):
    from ttsx.data import collator_to_trainer_batch
    from ttsx.core.config import TTSXConfig, AcousticConfig
    ds = TTSDataset(TTSDatasetConfig(audio_root=str(audio_tree), audio=AU,
                                     text_emb_dim=32))
    coll = TTSCollator(CollatorConfig(audio=AU, augment=False,
                                      bucket_wav=1024, bucket_text=16))
    raw = coll([ds[0], ds[1]])
    cfg = TTSXConfig(acoustic=AcousticConfig(text_emb_dim=32,
                                             speaker_dim=8))
    b = collator_to_trainer_batch(raw, cfg)
    B, T, _ = b["mel"].shape
    assert b["prosody"].shape == (B, T, 18)
    assert b["text_emb"].shape == (B, T, 32)
    assert b["speaker"].shape == (B, 8)
    assert b["emotion_probs"].shape == (B, 6)
    assert b["wav"].ndim == 3
    assert np.isfinite(b["prosody"]).all()


def test_native_wavio_matches_scipy_path(tmp_path):
    """The C decoder (ttsx/native/wavio.c) must be bit-compatible with the
    scipy+numpy fallback across encodings, channel mixes and resampling."""
    import struct
    from scipy.io import wavfile
    from ttsx.native import wavio
    if wavio is None:
        import pytest
        pytest.skip("no C toolchain: native extension unavailable")

    sr = 16000
    t = np.arange(sr) / sr
    ref = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    p16 = tmp_path / "m16.wav"
    wavfile.write(p16, sr, (ref * 32767).astype(np.int16))
    d, s = wavio.read_wav(str(p16))
    assert s == sr and d.dtype == np.float32
    np.testing.assert_allclose(
        d, (ref * 32767).astype(np.int16) / 32768.0, atol=1e-7)

    # stereo float32 -> mono mix
    pst = tmp_path / "st.wav"
    stereo = np.stack([ref, -0.5 * ref], axis=1)
    wavfile.write(pst, sr, stereo)
    d, _ = wavio.read_wav(str(pst))
    np.testing.assert_allclose(d, stereo.mean(axis=1), atol=1e-6)

    # 24-bit PCM (no scipy writer: hand-rolled RIFF)
    p24 = tmp_path / "a24.wav"
    s24 = (ref * 8388607).astype(np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in s24)
    with open(p24, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3,
                                      3, 24))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)
    d, _ = wavio.read_wav(str(p24))
    np.testing.assert_allclose(d, s24 / 8388608.0, atol=1e-6)

    # linear-resample parity with the numpy fallback formula
    d, s = wavio.read_wav(str(p16), 8000)
    x = (ref * 32767).astype(np.int16) / 32768.0
    n = int(round(len(x) * 8000 / sr))
    expect = np.interp(np.linspace(0, len(x) - 1, n),
                       np.arange(len(x)), x).astype(np.float32)
    assert s == 8000
    np.testing.assert_allclose(d, expect, atol=2e-6)

    # read_wav() facade prefers the native path and agrees with it
    d2, s2 = read_wav(p16, target_sr=8000)
    np.testing.assert_allclose(d2, d, atol=0)

    # corrupt file raises ValueError, not a crash
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVEjunk")
    import pytest
    with pytest.raises(ValueError):
        wavio.read_wav(str(bad))


@pytest.mark.parametrize("native", [True, False])
def test_wav_batch_loader(tmp_path, native):
    """Prefetch executor (native pthreads pool + Python-thread fallback):
    batch shapes, label/content alignment, clean shutdown."""
    from ttsx.data import WavBatchLoader
    from ttsx import native as native_pkg

    if native and native_pkg.prefetch is None:
        pytest.skip("no C toolchain")
    items = []
    for i in range(5):
        wav = np.full(3000 + 200 * i, (i + 1) / 10.0, np.float32)
        p = tmp_path / f"f{i}.wav"
        write_wav(p, wav, 16000)
        items.append((str(p), i))
    with WavBatchLoader(items, crop=2048, batch=3, workers=2, depth=2,
                        seed=7, native=native) as loader:
        assert loader.is_native == native
        for wav, lab in zip(loader, range(4)):
            pass
        wav, lab = loader.next()
        assert wav.shape == (3, 2048) and wav.dtype == np.float32
        assert lab.shape == (3,) and lab.dtype == np.int32
        for b in range(3):
            # constant-amplitude files: crop content identifies the file
            assert abs(wav[b].max() - (lab[b] + 1) / 10.0) < 2e-2
        if native:
            produced, consumed, errors = loader.stats()
            assert produced >= consumed and errors == 0


def test_native_prefetch_seed_deterministic_and_full_crop_range(tmp_path):
    """Round-2 review regressions: (a) the native pool must honor `seed`
    (worker RNGs were keyed on pthread_self, so identical seeds gave
    different batches every launch); (b) random-crop must be able to pick
    the last valid offset n-crop (the modulo excluded it)."""
    from ttsx import native as native_pkg

    if native_pkg.prefetch is None:
        pytest.skip("no C toolchain")
    P = native_pkg.prefetch.Prefetcher
    rng = np.random.default_rng(0)
    paths, labels = [], []
    for i in range(3):
        p = tmp_path / f"r{i}.wav"
        write_wav(p, rng.standard_normal(3000).astype(np.float32) * 0.3,
                  16000)
        paths.append(str(p))
        labels.append(i)

    def first(seed):
        pf = P(paths, labels, 1024, 4, workers=1, seed=seed)
        try:
            return pf.next()
        finally:
            pf.close()

    w1, l1 = first(7)
    w2, l2 = first(7)
    assert np.array_equal(w1, w2) and np.array_equal(l1, l2)

    # n = crop + 1: offsets {0, 1} must BOTH occur across seeds
    single = [paths[0]]
    starts = set()
    for s in range(24):
        pf = P(single, [0], 2999, 2, workers=1, seed=s)
        try:
            wav, _ = pf.next()
        finally:
            pf.close()
        starts.add(float(wav[0, 0]))
    assert len(starts) == 2


def test_wav_batch_loader_pads_short_files(tmp_path):
    from ttsx.data import WavBatchLoader

    p = tmp_path / "short.wav"
    write_wav(p, np.full(500, 0.5, np.float32), 16000)
    with WavBatchLoader([(str(p), 0)], crop=2048, batch=2,
                        workers=1, depth=1, native=None) as loader:
        wav, lab = loader.next()
        assert wav.shape == (2, 2048)
        # first 500 samples data, rest zero-padded
        assert abs(wav[0, :500].max() - 0.5) < 2e-2
        assert np.all(wav[:, 600:] == 0.0)


def test_native_wavio_rejects_malformed_float_bits(tmp_path):
    """A wav claiming IEEE-float with bits=16 must be rejected, not
    decoded: the float path reads 4/8 bytes per sample, so trusting the
    claimed 2-byte stride would read past the file buffer."""
    from ttsx import native
    if native.wavio is None:
        pytest.skip("no C toolchain")
    import struct
    data = np.zeros(64, np.int16).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000,
                                   32000, 2, 16)  # fmt=3 float, bits=16
           + b"data" + struct.pack("<I", len(data)) + data)
    p = tmp_path / "bad_float.wav"
    p.write_bytes(hdr)
    with pytest.raises(ValueError):
        native.wavio.read_wav(str(p))
