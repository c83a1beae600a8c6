"""Observer pipeline tests: stages, diarizer, and one end-to-end job."""
import json
import time

import numpy as np
import pytest

from ttsx.core.config import AudioConfig
from ttsx.pipeline import (
    polarity_scores, detect_drift, DriftStage, Tier1Stage, Tier2Stage,
    AnomalyStage, FingerprintStage, ArcStage, PlotMapStage,
    DynamicLearningStage, GitSyncStage, ObserverPipeline, ReviewSession,
    write_json_atomic, read_json, JobQueue, TriggerWatcher, Worker,
    emotion_utils)
from ttsx.pipeline.diarizer import (
    dynamic_slice, time_aware_sim, temporal_cluster, ReIDMemory,
    DiarizerController)
from ttsx.data.dataset import write_wav

AU = AudioConfig(sample_rate=16000, n_fft=512, win_length=512,
                 hop_length=128, n_mels=40)


def two_speaker_wav(seconds=8.0, sr=16000):
    """Alternating 2 s voiced segments: 'speakers' at 120 Hz and 300 Hz
    with distinct harmonics, separated by 0.5 s silences."""
    rng = np.random.default_rng(0)
    out = np.zeros(int(seconds * sr), np.float32)
    t = 0.0
    spk = 0
    truth = []
    while t + 2.0 <= seconds:
        n0, n1 = int(t * sr), int((t + 2.0) * sr)
        tt = np.arange(n1 - n0) / sr
        f0 = 120.0 if spk == 0 else 300.0
        sig = sum(np.sin(2 * np.pi * f0 * k * tt) / k for k in (1, 2, 3))
        env = np.minimum(1, np.minimum(tt, (n1 - n0) / sr - tt) * 20)
        out[n0:n1] = 0.4 * sig * env + 0.005 * rng.normal(size=n1 - n0)
        truth.append((t, t + 2.0, f"S{spk}"))
        t += 2.5
        spk = 1 - spk
    return out, truth


def test_sentiment_scores():
    pos = polarity_scores("I love this wonderful amazing day!")
    neg = polarity_scores("I hate this terrible awful pain")
    neu = polarity_scores("the table has four legs")
    assert pos["compound"] > 0.5
    assert neg["compound"] < -0.5
    assert neu["neu"] > 0.9
    assert abs(pos["pos"] + pos["neg"] + pos["neu"] - 1.0) < 0.01


def test_sentiment_negation():
    a = polarity_scores("this is good")
    b = polarity_scores("this is not good")
    assert a["compound"] > 0 > b["compound"]


def test_emotion_rules():
    f = emotion_utils.Features(pos=0.7, energy=0.8)
    assert emotion_utils.classify(f).label == "Happiness"
    f = emotion_utils.Features(neg=0.6, pitch=1.0)
    assert emotion_utils.classify(f).label == "Anger"
    f = emotion_utils.Features(neu=1.0)
    assert emotion_utils.classify(f).label in ("Calm", "Neutral")
    assert len(emotion_utils.RULES) == 31
    assert set(emotion_utils.GROUP_MAP.values()) == {
        "Positive", "Negative", "Neutral"}


# the reference's exact 31-label vocabulary + group routing
# (/root/reference/reference_encoder/modules/utils/emotion_utils.py:5-107)
REFERENCE_EMOTIONS = {
    "Anger": "Negative", "Anxiety": "Negative", "Contempt": "Negative",
    "Despair": "Negative", "Disgust": "Negative", "Fear": "Negative",
    "Frustration": "Negative", "Guilt": "Negative",
    "Irritation": "Negative", "Jealousy": "Negative",
    "Loneliness": "Negative", "Negative Surprise": "Negative",
    "Sadness": "Negative",
    "Boredom": "Neutral", "Calm": "Neutral", "Concentration": "Neutral",
    "Flat narration": "Neutral", "Hesitant": "Neutral",
    "Matter-of-fact Informational tone": "Neutral", "Neutral": "Neutral",
    "Tired": "Neutral",
    "Amusement": "Positive", "Enthusiasm": "Positive",
    "Gratitude": "Positive", "Happiness": "Positive", "Hope": "Positive",
    "Inspiration": "Positive", "Love": "Positive", "Pleasant": "Positive",
    "Relief": "Positive", "Surprise": "Positive",
}


def test_emotion_vocabulary_matches_reference():
    """tier2_tags.json / learned_rules.json must be drop-in comparable with
    reference output: same 31 label names, same GROUP_MAP routing."""
    assert set(emotion_utils.EMOTION_LABELS) == set(REFERENCE_EMOTIONS)
    assert emotion_utils.GROUP_MAP == REFERENCE_EMOTIONS


def test_every_emotion_rule_reachable():
    """No rule may be dead or fully shadowed by an earlier first-match rule."""
    # derived from the Rule data — keyword edits cannot desync this test
    kws = sorted(set().union(*(r.keywords for r in emotion_utils.RULES)))
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(60000):
        s = rng.dirichlet([1, 1, 1])
        f = emotion_utils.Features(
            pos=s[0], neg=s[1], neu=s[2],
            pitch=rng.normal(), energy=rng.normal(),
            speech_rate=rng.normal(), pause=rng.normal(),
            pitch_var=rng.normal(), energy_var=rng.normal(),
            keywords=frozenset(rng.choice(kws, size=rng.integers(0, 4))))
        rule = emotion_utils.classify(f)
        if rule is not None:  # None = fall through to the tier-1 base tag
            seen.add(rule.label)
    assert seen == set(emotion_utils.EMOTION_LABELS)


def test_detect_drift_events():
    x = np.zeros(200)
    x[80:100] = 3.0  # a sustained drift
    det = detect_drift(x, window=30)
    assert len(det["events"]) >= 1
    ev = det["events"][0]
    assert 70 <= ev["start"] <= 90


def test_dynamic_slice_and_cluster():
    wav, truth = two_speaker_wav()
    slices, stats = dynamic_slice(wav, AU, min_dur=1.0, max_dur=3.0)
    assert len(slices) >= 2
    assert stats["n_slices"] == len(slices)
    # cluster with toy embeddings built from mean spectral centroid
    embs = []
    for s, e in slices:
        seg = wav[int(s * AU.sample_rate):int(e * AU.sample_rate)]
        spec = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), 1 / AU.sample_rate)
        c = (spec * freqs).sum() / spec.sum()
        embs.append([c / 1000, 1.0])
    embs = np.asarray(embs)
    starts = np.asarray([s for s, _ in slices])
    labels = temporal_cluster(embs, starts, method="kmeans")
    assert len(labels) == len(slices)


def test_reid_memory_match_and_new():
    m = ReIDMemory(match_threshold=0.6)
    e1 = np.array([1.0, 0.0, 0.0])
    mapping, cert = m.re_id({0: e1[None]})
    spk1 = mapping[0]
    # same embedding again -> same speaker
    mapping2, cert2 = m.re_id({0: e1[None]})
    assert mapping2[0] == spk1
    assert cert2[0] > 0.9
    # orthogonal embedding -> new speaker
    e2 = np.array([0.0, 1.0, 0.0])
    mapping3, _ = m.re_id({0: e2[None]})
    assert mapping3[0] != spk1


def test_reid_snapshot_roundtrip(tmp_path):
    m = ReIDMemory()
    m.update("alice", np.array([1.0, 0.0]))
    p = str(tmp_path / "mem.pkl")
    m.snapshot(p)
    m2 = ReIDMemory()
    m2.load_snapshot(p)
    assert "alice" in m2.prototypes


@pytest.fixture()
def tagged_context(tmp_path):
    """Synthetic per-speaker artifacts to drive the JSON-dataflow stages."""
    ctx = {"job_id": "job1", "output_dir": str(tmp_path),
           "speaker_ids": ["spkA"], "step_times": {}}
    d = tmp_path / "emotion_tags" / "spkA"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    f0 = np.concatenate([np.full(60, 120.0), np.full(60, 180.0)])
    f0 += rng.normal(size=120)
    write_json_atomic(d / "prosody_trend.json", {
        "f0": f0.tolist(), "energy": (np.abs(rng.normal(size=120)) * 0.1
                                      ).tolist(), "voiced_ratio": 0.9})
    segments = [
        {"start": 0.0, "end": 2.0, "text": "I love this wonderful day"},
        {"start": 2.0, "end": 4.0, "text": "this is terrible I hate it"},
        {"start": 4.0, "end": 6.0, "text": "the meeting is at noon"},
        {"start": 6.0, "end": 8.0, "text": "I am so happy and excited!"},
    ]
    write_json_atomic(d / "transcript.json", {"segments": segments})
    return ctx


def test_stage_chain(tagged_context, tmp_path):
    ctx = tagged_context
    d = tmp_path / "emotion_tags" / "spkA"
    assert DriftStage()(ctx)["status"] == "ok"
    assert (d / "drift_vector.json").exists()
    assert Tier1Stage()(ctx)["status"] == "ok"
    t1 = read_json(d / "tier1_tags.json")["tags"]
    assert len(t1) == 4
    labels = [t["label"] for t in t1]
    assert labels[0] == "positive" and labels[1] == "negative"
    assert Tier2Stage()(ctx)["status"] == "ok"
    t2 = read_json(d / "tier2_tags.json")["tags"]
    # rule hits carry "R<nn>"; "base" = tier-1 tag kept (reference
    # tier2.py:126-136 label = base_tag when no rule fires)
    assert all(t["rule_id"].startswith("R") or t["rule_id"] == "base"
               for t in t2)
    assert all(t["group"] in ("Positive", "Negative", "Neutral")
               for t in t2)
    assert AnomalyStage()(ctx)["status"] == "ok"
    log = read_json(d / "drift_log.json")
    assert "emotion_entropy" in log and "confidence_slope" in log
    assert FingerprintStage()(ctx)["status"] == "ok"
    fp = read_json(d / "fingerprint.json")
    assert fp["n_tags"] == 4 and fp["dominant_tags"]
    arc_out = ArcStage()(ctx)
    assert arc_out["status"] == "ok"
    arc = read_json(tmp_path / "arc_classification.json")
    assert "pattern" in arc
    assert PlotMapStage()(ctx)["status"] == "ok"
    pm = read_json(tmp_path / "plot_map.json")
    assert pm["n_beats"] >= 1
    assert DynamicLearningStage()(ctx)["status"] == "ok"
    assert (tmp_path / "validation_set.json").exists()
    assert GitSyncStage()(ctx)["status"] == "ok"
    manifest = read_json(tmp_path / "job_manifest.json")
    assert manifest["totals"]["tags"] == 4


def test_tier2_empty_trend_uses_drift_fallback(tagged_context, tmp_path):
    """A prosody_trend.json that exists but has empty series must behave
    exactly like a missing one: drift-delta z fallback, not zeroed
    pitch/energy features (round-2 review regression)."""
    from ttsx.pipeline.tiers import _trend_usable
    assert not _trend_usable({})
    assert not _trend_usable({"f0": [], "energy": []})
    assert not _trend_usable({"f0": [1.0], "energy": []})
    assert not _trend_usable({"f0": None, "energy": [1.0]})
    assert _trend_usable({"f0": [1.0, 2.0], "energy": [0.1, 0.2]})

    ctx = tagged_context
    d = tmp_path / "emotion_tags" / "spkA"
    DriftStage()(ctx)
    Tier1Stage()(ctx)
    # (a) trend missing entirely
    (d / "prosody_trend.json").unlink()
    Tier2Stage()(ctx)
    tags_missing = read_json(d / "tier2_tags.json")["tags"]
    # (b) trend present but unusable -> identical output
    write_json_atomic(d / "prosody_trend.json", {"f0": [], "energy": []})
    Tier2Stage()(ctx)
    tags_empty = read_json(d / "tier2_tags.json")["tags"]
    assert tags_empty == tags_missing


def test_review_session(tagged_context, tmp_path):
    ctx = tagged_context
    DriftStage()(ctx)
    Tier1Stage()(ctx)
    Tier2Stage()(ctx)
    sess = ReviewSession(str(tmp_path))
    assert sess.speakers() == ["spkA"]
    sess.correct("spkA", 0.0, "Happiness", notes="clearly joyful")
    rules = read_json(tmp_path / "learned_rules.json")
    assert rules["spkA"]["0.0"]["label"] == "Happiness"
    with pytest.raises(ValueError):
        sess.correct("spkA", 0.0, "not-an-emotion")
    html = sess.html_report(str(tmp_path / "report.html"))
    assert "spkA" in html


def test_diarizer_end_to_end(tmp_path):
    wav, truth = two_speaker_wav()
    wav_path = tmp_path / "meeting.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0)
    res = ctl.diarize_single(str(wav_path), str(tmp_path / "out"))
    assert res, "diarization returned empty"
    out = tmp_path / "out"
    assert (out / "speaker_mapping.json").exists()
    assert (out / "similarity_matrix.npy").exists()
    assert (out / "step_times.json").exists()
    assert (out / "meeting.rttm").exists()
    assert (out / "speakers").exists()
    log = read_json(out / "diarization_log.json")
    assert log["status"] == "ok"
    assert log["n_slices"] >= 2


def test_diarizer_der_eval(tmp_path):
    from ttsx.pipeline.diarizer.rebuilder import write_rttm
    ref = [(0.0, 2.0, "A"), (2.5, 4.5, "B")]
    write_rttm(tmp_path / "ref.rttm", "job", ref)
    write_rttm(tmp_path / "hyp.rttm", "job", ref)
    m = DiarizerController.evaluate(str(tmp_path / "ref.rttm"),
                                    str(tmp_path / "hyp.rttm"))
    assert m["der"] < 0.01 and m["purity"] > 0.99


def test_trigger_watcher_and_worker(tmp_path):
    q = JobQueue()
    done = []

    def process(job):
        done.append(job["job_id"])
        return {"status": "ok"}

    watcher = TriggerWatcher(str(tmp_path), q, poll_s=0.05)
    worker = Worker(q, process)
    watcher.start()
    worker.start()
    (tmp_path / "utt1.wav").write_bytes(b"")
    (tmp_path / "utt1.wav.ready").write_text("")
    deadline = time.time() + 5
    while time.time() < deadline and q.get_status("utt1") != "done":
        time.sleep(0.05)
    watcher.stop()
    worker.stop()
    assert done == ["utt1"]
    assert q.get_status("utt1") == "done"


def test_observer_pipeline_end_to_end(tmp_path):
    wav, truth = two_speaker_wav()
    wav_path = tmp_path / "job.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    pipe = ObserverPipeline(au=AU,
                            diarizer=DiarizerController(AU, min_dur=1.0,
                                                        max_dur=3.0))
    summary = pipe.run_job(str(wav_path), str(tmp_path / "out"))
    assert summary["status"] in ("done", "partial-failure")
    out = tmp_path / "out"
    assert (out / "job_summary.json").exists()
    assert (out / "step_times.json").exists()
    if summary["speakers"]:
        spk = summary["speakers"][0]
        d = out / "emotion_tags" / spk
        assert (d / "prosody_trend.json").exists()
        assert (d / "drift_vector.json").exists()
    assert (out / "observer_report.html").exists()


def test_diarizer_separates_alternating_speakers(tmp_path):
    """Two alternating synthetic voices must yield 2+ speakers with the
    turn structure preserved (regression for the round-1 embedder fix)."""
    wav, truth = two_speaker_wav(seconds=12.0)
    wav_path = tmp_path / "alt.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0)
    res = ctl.diarize_single(str(wav_path), str(tmp_path / "out"))
    assert res
    speakers = res["speakers"]
    assert len(set(speakers)) >= 2
    # consecutive slices must not be all one speaker
    changes = sum(1 for a, b in zip(speakers, speakers[1:]) if a != b)
    assert changes >= 2


def test_trim_cross_speaker_overlaps():
    """Padded-edge trimming: adjacent different-speaker slices split the
    overlap at the midpoint; same-speaker and non-overlapping pairs are
    untouched (the strict-DER remainder of the round-2 measurement)."""
    from ttsx.pipeline.diarizer.controller import trim_cross_speaker_overlaps
    slices = [(0.0, 2.1), (1.9, 4.1), (3.9, 5.0), (6.0, 7.0)]
    speakers = ["a", "b", "b", "a"]
    out = trim_cross_speaker_overlaps(slices, speakers)
    assert out[0] == (0.0, 2.0) and out[1][0] == 2.0   # a|b split at mid
    assert out[1][1] == 4.1 and out[2][0] == 3.9       # b|b kept
    assert out[3] == (6.0, 7.0)                        # gap kept
    # unsorted input: trimming follows chronological adjacency
    out2 = trim_cross_speaker_overlaps([slices[1], slices[0]], ["b", "a"])
    assert out2[1][1] == 2.0 and out2[0][0] == 2.0


def test_slice_embedder_adaptive_fusion_weight():
    """Dual-source fusion default: the handcrafted voiceprint dominates
    only when no trained checkpoint is supplied (a trained encoder's
    same-vs-diff cosine margin is ~0.97 alone; raw mel stats drag it
    negative — the round-2 spk-split regression)."""
    from ttsx.pipeline.diarizer.embedding import SliceEmbedder
    assert SliceEmbedder(AU).spec_weight == 2.0
    assert SliceEmbedder(AU, params={"w": 0}).spec_weight == 0.5
    # explicit value always wins
    assert SliceEmbedder(AU, params={"w": 0},
                         spec_weight=1.5).spec_weight == 1.5


def test_slice_prosody_features():
    from ttsx.pipeline.tiers import slice_prosody_features
    fr = 86.13
    n = int(6.0 * fr)
    f0 = np.zeros(n)
    en = np.full(n, 0.01)
    # slice A: high pitch/energy; slice B: low pitch/energy
    a0, a1 = int(0.0 * fr), int(2.0 * fr)
    b0, b1 = int(3.0 * fr), int(5.0 * fr)
    f0[a0:a1], en[a0:a1] = 220.0, 0.2
    f0[b0:b1], en[b0:b1] = 120.0, 0.05
    tags = [{"start": 0.0, "end": 2.0, "text": "a b c"},
            {"start": 3.0, "end": 5.0, "text": "d"}]
    rows = slice_prosody_features({"f0": f0.tolist(),
                                   "energy": en.tolist()}, tags, fr)
    assert rows[0]["pitch"] > 0 > rows[1]["pitch"]
    assert rows[0]["energy"] > rows[1]["energy"]
    # out-of-range slice yields zeros, not a crash
    rows = slice_prosody_features({"f0": [], "energy": []}, tags, fr)
    assert rows[0]["pitch"] == 0.0


def test_tier2_base_tag_fallback(tmp_path):
    """No rule fires (weak sentiment, no prosody) -> tier-1 label kept
    (reference tier2.py:126-136 label = base_tag)."""
    from ttsx.pipeline.contracts import speaker_dir, write_json_atomic, read_json
    from ttsx.pipeline.tiers import Tier1Stage, Tier2Stage
    ctx = {"job_id": "t2f", "output_dir": str(tmp_path),
           "speaker_ids": ["s"]}
    d = speaker_dir(ctx, "s")
    write_json_atomic(d / "transcript.json", {"segments": [
        {"start": 0.0, "end": 1.0,
         "text": "this is very bad awful terrible horrible news"}]})
    Tier1Stage().run(ctx)
    Tier2Stage().run(ctx)
    tags = read_json(d / "tier2_tags.json")["tags"]
    # strongly negative text with zero prosody: no prosody-gated rule can
    # fire, so the tier-1 "negative" tag must survive as the label
    assert tags[0]["rule_id"] == "base"
    assert tags[0]["label"] == "negative"
    assert tags[0]["group"] == "Negative"


def test_rule_calibration_harness(tmp_path):
    from ttsx.eval.rule_calibration import rule_stability, tier_accuracy
    acc = tier_accuracy(n_segments=120, seed=1, work_dir=str(tmp_path))
    assert acc["group_accuracy"] > 0.8
    assert acc["ece"] < 0.15
    stab = rule_stability(samples_per_rule=40, sigmas=(0.25,),
                          max_draws=60_000)
    assert stab["aggregate"]["rules_reachable"] == 31
    assert stab["aggregate"]["mean_group_retention@0.25"] > 0.75
    # recalibration artifact in the learned_confidences.json shape
    import json as _json
    lc = _json.loads((tmp_path / "learned_confidences.json").read_text())
    assert "bins" in lc and "ece" in lc


def test_gnn_triplet_training_improves_separation():
    """train() must do true gradient descent on the triplet loss: after
    refinement, same-label GAT outputs are closer than different-label
    ones by a wider margin, and the loss it returns decreases."""
    from ttsx.pipeline.diarizer import GNNClusterer

    rng = np.random.default_rng(3)
    # two heavily overlapping speaker clouds in 16-d
    c0, c1 = rng.normal(size=(2, 16))
    embs = np.concatenate([
        c0 + 1.5 * rng.normal(size=(12, 16)),
        c1 + 1.5 * rng.normal(size=(12, 16))]).astype(np.float32)
    labels = np.asarray([0] * 12 + [1] * 12)

    def margin_of(cl):
        e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
        adj = (e @ e.T) > cl.sim_threshold
        np.fill_diagonal(adj, True)
        h = cl._forward(e, adj)
        d = ((h[:, None] - h[None]) ** 2).sum(-1)
        same = labels[:, None] == labels[None]
        np.fill_diagonal(same, False)
        return d[~same & ~np.eye(len(h), dtype=bool)].mean() - d[same].mean()

    cl = GNNClusterer(dim=16, seed=0, lr=0.05)
    cl.cluster_embeddings(embs)  # initialize weights
    before = margin_of(cl)
    l_first = cl.train(embs, labels, margin=1.0, steps=1)
    l_last = cl.train(embs, labels, margin=1.0, steps=40)
    after = margin_of(cl)
    assert np.isfinite(l_last)
    assert l_last < l_first
    assert after > before + 0.5


def test_negation_guard_survives_punctuation():
    """invert_if_negated must tokenize like polarity_scores: a negation
    already handled by the scorer's 3-word window must not be re-flipped
    just because the sentiment word carries sentence punctuation."""
    from ttsx.pipeline import polarity_scores
    from ttsx.pipeline.tiers import invert_if_negated

    for text in ("we are not safe.", "we are not safe"):
        scores = polarity_scores(text)
        out = invert_if_negated(text, scores)
        assert out == scores, text  # scorer already inverted; no re-flip
        assert out["compound"] < 0, text  # and the result reads negative


def test_overlap_net_learns_and_screens():
    """The trained overlap screen (reference overlap.py:18-33 analog —
    which ships RANDOM weights) must actually separate two-speaker
    mixtures from single-speaker windows."""
    from ttsx.data.tonecorpus import ToneCorpus
    from ttsx.eval.parity_common import AUDIO
    from ttsx.pipeline.diarizer.overlap_net import (OverlapScreen,
                                                    train_overlap_net)
    corpus = ToneCorpus(n_speakers=6, audio=AUDIO)
    net = train_overlap_net(corpus, AUDIO, steps=120, n_train=96, seed=0)
    assert net["eval"]["acc"] > 0.8, net["eval"]
    screen = OverlapScreen(AUDIO, net["params"])
    rng = np.random.default_rng(0)
    solo = corpus.utterance(0, 32, rng).wav
    duo = solo + corpus.utterance(3, 32, rng).wav
    assert screen(duo) > screen(solo)


def test_detect_overlaps_screen_path():
    """With a screen, the sliding stream scan decides: a screen firing
    only inside slice 1 yields hits labeled with that slice's speaker
    (+ nearest other), an always-low screen yields nothing."""
    from ttsx.core.config import AudioConfig
    from ttsx.pipeline.diarizer.overlap import detect_overlaps
    au = AudioConfig()
    sr = au.sample_rate
    wav = np.random.default_rng(0).normal(
        size=sr * 4).astype(np.float32) * 0.1
    slices = [(0.0, 1.0), (1.1, 2.0), (2.05, 3.0)]
    labels = np.asarray([0, 1, 0])
    embs = np.eye(3, 8, dtype=np.float32)
    # screen keyed on window energy: mark 1.2-1.8 s (inside slice 1)
    wav[int(1.2 * sr):int(1.8 * sr)] *= 10.0
    screen = lambda w: 0.9 if float(np.std(w)) > 0.5 else 0.2
    hits = detect_overlaps(wav, au, slices, labels, embs, screen=screen)
    assert hits, "sliding screen missed the in-slice hot region"
    for (s, e, la, lb, p) in hits:
        # peak-window emission: ±0.25 s around the argmax-prob window
        # center, which sits within a window radius of the hot zone
        assert 0.85 <= s < e < 2.3
        assert (e - s) <= 0.5 + 1e-6
        assert {la, lb} == {0, 1}
        assert p == 0.9
    none = detect_overlaps(wav, au, slices, labels, embs,
                           screen=lambda w: 0.1)
    assert none == []


def test_split_slices_at_overlaps():
    from ttsx.pipeline.diarizer.overlap import split_slices_at_overlaps
    slices = [(0.0, 3.0), (3.5, 4.2)]
    regions = [(1.4, 1.6, 0.9),   # inside slice 0 -> cut at 1.5
               (2.95, 3.05, 0.8),  # midpoint 3.0 at the edge -> no cut
               (3.6, 3.7, 0.7)]    # inside slice 1 but parts < min_len*2
    out = split_slices_at_overlaps(slices, regions, min_len=0.4)
    assert (0.0, 1.5) in out and (1.5, 3.0) in out
    assert (3.5, 4.2) in out
    assert len(out) == 3
    # no regions -> unchanged
    assert split_slices_at_overlaps(slices, []) == \
        [(0.0, 3.0), (3.5, 4.2)]


def test_plot_map_pivot_split(tmp_path):
    """An arc pivot strictly inside a beat splits it into pre/post halves
    (reference plot_map.py:432-443): post half gets beat_id '<id>.5'."""
    ctx = {"job_id": "job1", "output_dir": str(tmp_path),
           "speaker_ids": ["spkA"], "step_times": {}}
    d = tmp_path / "emotion_tags" / "spkA"
    d.mkdir(parents=True)
    tags = [{"start": t, "end": t + 1.0, "text": f"utt {t}",
             "label": "joy" if t < 5 else "anger", "confidence": 0.9}
            for t in [0.0, 2.0, 4.0, 6.0, 8.0]]
    write_json_atomic(d / "tier2_tags.json", {"tags": tags})
    write_json_atomic(d / "drift_vector.json", {"deltas": []})
    # one 0-10s arc segment -> beats at [0,10/3), [10/3,20/3), [20/3,10);
    # pivot at 5.0 falls strictly inside beat 1
    write_json_atomic(tmp_path / "arc_classification.json", {
        "segments": [{"start": 0.0, "end": 10.0,
                      "dominant_emotion": "joy", "group": "Positive",
                      "n_tags": 5}],
        "pivots": [5.0], "pattern": "flat"})
    out = PlotMapStage(beats_per_arc=3)(ctx)
    assert out["status"] == "ok"
    pm = read_json(tmp_path / "plot_map.json")
    assert pm["n_beats"] == 4              # 3 beats, one split into 2
    ids = [b["beat_id"] for b in pm["beats"]]
    assert "1.5" in [str(i) for i in ids]
    halves = [b for b in pm["beats"]
              if str(b["beat_id"]) in ("1", "1.5")]
    assert halves[0]["end"] == 5.0 and halves[1]["start"] == 5.0
    assert "(pre-pivot)" in halves[0]["title"]
    assert "(post-pivot)" in halves[1]["title"]
    # beat boundaries stay contiguous and back-annotation still resolves
    drift = read_json(d / "drift_vector.json")
    assert len(drift["beat_ids"]) == 5
    assert all(str(b) != "-1" for b in drift["beat_ids"])


def test_arc_pivots_are_times(tagged_context, tmp_path):
    """ArcStage pivots are TIMES (ref arc.py:113), inside the tag span."""
    ctx = tagged_context
    DriftStage()(ctx)
    Tier1Stage()(ctx)
    Tier2Stage()(ctx)
    ArcStage()(ctx)
    arc = read_json(tmp_path / "arc_classification.json")
    end = 8.0  # tagged_context transcript spans 0-8s
    assert all(0.0 <= p <= end for p in arc["pivots"])


def test_diarizer_run_visualization(tmp_path):
    """diarize_single writes timeline.html (ref cli.py:46-55
    visualize_results: sim-matrix + slice-timeline figures)."""
    wav, truth = two_speaker_wav()
    wav_path = tmp_path / "m.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0)
    res = ctl.diarize_single(str(wav_path), str(tmp_path / "out"),
                             rebuild=False)
    assert res
    html = (tmp_path / "out" / "timeline.html").read_text()
    assert html.count("<svg") == 2       # heatmap + timeline
    for spk in set(res["speakers"]):
        assert spk in html


def test_merge_clusters_fixes_fragmentation():
    """Prototype-cosine agglomerative merge rejoins fragments of the
    same speaker without fusing distinct speakers."""
    from ttsx.pipeline.diarizer.cluster import merge_clusters
    rng = np.random.default_rng(0)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    embs = np.concatenate([
        a + 0.05 * rng.normal(size=(10, 3)),
        b + 0.05 * rng.normal(size=(10, 3))])
    # over-fragmented: speaker A split into clusters 0/1, B into 2/3
    labels = np.array([0] * 5 + [1] * 5 + [2] * 5 + [3] * 5)
    merged = merge_clusters(embs, labels, thresh=0.75)
    assert len(np.unique(merged)) == 2
    assert len(set(merged[:10])) == 1 and len(set(merged[10:])) == 1
    assert merged[0] != merged[10]
    # an unreachable threshold keeps all 4 fragments
    kept = merge_clusters(embs, labels, thresh=1.01)
    assert len(np.unique(kept)) == 4
    # empty input is fine
    assert merge_clusters(np.zeros((0, 3)), np.zeros(0, int)).size == 0


def test_diarizer_overlap_speakers_mapped(tmp_path):
    """diarize_single returns overlap_speakers with MAPPED speaker names
    and the RTTM grows multi-label rows for uncovered overlap spans."""
    from ttsx.pipeline.diarizer.rebuilder import write_rttm, reconstruct_audio
    wav, truth = two_speaker_wav()
    wav_path = tmp_path / "m.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0)
    res = ctl.diarize_single(str(wav_path), str(tmp_path / "out"))
    assert "overlap_speakers" in res
    names = set(res["speakers"])
    for s, e, sa, sb, conf in res["overlap_speakers"]:
        assert sa in names and sb in names
    # rebuilder emits one extra RTTM row per uncovered overlap speaker
    out2 = tmp_path / "rb"
    out2.mkdir()
    reconstruct_audio(wav, AU, out2, "job", [(0.0, 2.0), (2.5, 4.5)],
                      ["A", "B"],
                      overlaps=[(1.8, 2.6, 0, 1, 0.9)],
                      overlap_speakers=[(1.8, 2.6, "A", "B", 0.9)])
    rows = (out2 / "job.rttm").read_text().strip().splitlines()
    # A covers (0,2) not (1.8,2.6) -> extra A row; B doesn't cover it
    # fully either -> extra B row
    assert len(rows) == 4


def test_spectral_cluster_eigengap():
    """spectral_cluster finds the true cluster count via the eigengap
    (the hard-stream speaker-count fix, VERDICT r3 weak #4: modularity
    over-counted 9-11 hyp for 6 true)."""
    from ttsx.pipeline.diarizer.cluster import spectral_cluster
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 16)) * 3
    embs = np.concatenate([c + 0.2 * rng.normal(size=(20, 16))
                           for c in centers])
    labels = spectral_cluster(embs)
    assert len(np.unique(labels)) == 4
    for i in range(4):  # each blob is pure
        assert len(np.unique(labels[i * 20:(i + 1) * 20])) == 1
    # explicit k and degenerate sizes
    assert len(np.unique(spectral_cluster(embs, k=2))) == 2
    assert spectral_cluster(embs[:1]).tolist() == [0]
    assert spectral_cluster(embs[:0]).size == 0


def test_stitch_segments_inverts_subsegmentation():
    from ttsx.pipeline.diarizer.cluster import stitch_segments
    sl = [(0.0, 1.0), (1.0, 2.0), (2.1, 3.0), (4.0, 5.0)]
    lab = np.array([0, 0, 1, 0])
    em = np.eye(4, 8, dtype=np.float32)
    segs, slab, sembs = stitch_segments(sl, lab, em)
    assert segs == [(0.0, 2.0), (2.1, 3.0), (4.0, 5.0)]
    assert slab.tolist() == [0, 1, 0]
    assert sembs.shape == (3, 8)
    # merged segment's emb is the normalized mean of its members
    m = (em[0] + em[1]) / 2
    np.testing.assert_allclose(sembs[0], m / np.linalg.norm(m),
                               atol=1e-6)


def test_diarizer_subsegment_spectral_end_to_end(tmp_path):
    """Full controller pass at window granularity + spectral clustering
    (the production first-pass config used by the hard benchmark):
    sub-second windows are stitched back to segment-level output."""
    wav, truth = two_speaker_wav()
    wav_path = tmp_path / "meeting.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0,
                             cluster_method="spectral",
                             subsegment_s=1.0)
    res = ctl.diarize_single(str(wav_path), str(tmp_path / "out"))
    assert res, "diarization returned empty"
    assert len(set(res["speakers"])) == 2
    # stitched output: every segment is >= one window long and sorted
    sl = res["slices"]
    assert all(e > s for s, e in sl)
    # window labels agree with the alternating truth: map each truth
    # turn to the hyp speaker covering its midpoint; the two truth
    # speakers must map to the two distinct hyp speakers
    def covering(tmid):
        for (s, e), spk in zip(sl, res["speakers"]):
            if s <= tmid <= e:
                return spk
    got = {spk: covering(0.5 * (s + e)) for s, e, spk in truth}
    assert None not in got.values()
    assert got["S0"] != got["S1"]


def test_speech_mask_and_clip_segments():
    """2-means log-RMS speech mask: finds the gaps a saturating VAD
    probability misses at 12 dB SNR, and clip_segments removes the
    non-speech (false-alarm) time from labeled segments."""
    from ttsx.pipeline.diarizer.slicer import clip_segments, speech_mask
    sr = AU.sample_rate
    rng = np.random.default_rng(0)
    wav = rng.normal(size=6 * sr).astype(np.float32) * 0.02  # noise floor
    speech = [(0.5, 2.0), (2.6, 4.1), (4.8, 5.7)]
    for s, e in speech:
        tt = np.arange(int((e - s) * sr)) / sr
        wav[int(s * sr):int(s * sr) + len(tt)] += 0.4 * np.sin(
            2 * np.pi * 220 * tt).astype(np.float32)
    runs = speech_mask(wav, AU)
    assert len(runs) == 3
    for (rs, re), (s, e) in zip(runs, speech):
        assert abs(rs - s) < 0.1 and abs(re - e) < 0.1
    segs, labs = clip_segments([(0.0, 2.3), (2.3, 6.0)], ["a", "b"], runs)
    assert labs == ["a", "b", "b"]
    for s, e in segs:  # every piece sits inside a speech run
        assert any(rs - 1e-6 <= s and e <= re + 1e-6 for rs, re in runs)
    # continuous speech (no silence): mask must pass-through, not bisect
    tt = np.arange(6 * sr) / sr
    cont = (0.3 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    assert speech_mask(cont, AU) == [(0.0, 6.0)]


def test_controller_mask_clip_removes_silence_padding(tmp_path):
    """With mask_clip (default), output segments exclude inter-turn
    silences even when VAD slices spanned them."""
    wav, truth = two_speaker_wav()
    wav_path = tmp_path / "m.wav"
    write_wav(wav_path, wav, AU.sample_rate)
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0,
                             cluster_method="spectral", subsegment_s=1.0)
    res = ctl.diarize_single(str(wav_path), str(tmp_path / "out"))
    assert res
    # truth has 0.5 s silences at 2.0-2.5, 4.5-5.0, 7.0-7.5: no hyp
    # segment may cover a silence midpoint
    for gap_mid in (2.25, 4.75):
        assert not any(s <= gap_mid <= e for s, e in res["slices"]), (
            gap_mid, res["slices"])
    no_clip = DiarizerController(AU, min_dur=1.0, max_dur=3.0,
                                 cluster_method="spectral",
                                 subsegment_s=1.0, mask_clip=False)
    res2 = no_clip.diarize_single(str(wav_path), str(tmp_path / "out2"))
    assert res2, "mask_clip=False path broke"


def test_diarize_batch_parallel_and_rotating_log(tmp_path):
    """Thread-pooled batch mode (ref cli.py:204-210 multiprocessing.Pool)
    + bounded rotating run log (ref cli.py:33-36)."""
    wav, _ = two_speaker_wav(seconds=6.0)
    paths = []
    for i in range(3):
        p = tmp_path / f"job{i}.wav"
        write_wav(p, wav, AU.sample_rate)
        paths.append(str(p))
    ctl = DiarizerController(AU, min_dur=1.0, max_dur=3.0)
    res = ctl.diarize_batch(paths, str(tmp_path / "out"), workers=3)
    assert set(res) == {"job0", "job1", "job2"}
    for job in res:
        assert res[job], f"{job} empty"
        assert (tmp_path / "out" / job / "speaker_mapping.json").exists()
    assert (tmp_path / "out" / "diarizer.log").stat().st_size > 0
    # idempotent handler attach: re-running must not stack handlers
    import logging
    from ttsx.utils.logs import attach_rotating_handler
    lg = logging.getLogger("ttsx.diarizer")
    n0 = len(lg.handlers)
    attach_rotating_handler(lg, tmp_path / "out" / "diarizer.log")
    assert len(lg.handlers) == n0


def test_rotating_log_bounds_size(tmp_path):
    """The handler actually rotates: total on-disk log bytes stay within
    max_bytes * (backup_count + 1)."""
    import logging
    from ttsx.utils.logs import attach_rotating_handler
    lg = logging.getLogger("ttsx.test_rotate")
    lg.propagate = False
    attach_rotating_handler(lg, tmp_path / "r.log", max_bytes=2000,
                            backup_count=2)
    for i in range(500):
        lg.info("filler line %04d %s", i, "x" * 80)
    files = list(tmp_path.glob("r.log*"))
    assert len(files) <= 3
    assert sum(f.stat().st_size for f in files) <= 2000 * 3 + 200


def test_screened_overlap_emission_boundary_anchored():
    """Screened overlap rows anchor at the cross-speaker segment
    boundary inside each region and self-gate when a region contains no
    handover (VERDICT r4 #6: midpoint emission cost +0.065 strict DER
    even with oracle labels on the hard-stream dump)."""
    from ttsx.pipeline.diarizer.overlap import detect_overlaps

    au = AU
    sr = au.sample_rate
    wav = np.random.default_rng(0).normal(
        size=int(8.0 * sr)).astype(np.float32) * 0.1
    # two speakers with a handover at t=3.0; same-speaker join at 6.0
    slices = [(0.5, 3.0), (3.0, 6.0), (6.0, 7.5)]
    labels = np.asarray([0, 1, 1])
    embs = np.eye(3, 8, dtype=np.float32)
    always_on = lambda win: 1.0  # saturated screen, like the real one
    ovs = detect_overlaps(wav, au, slices, labels, embs,
                          screen=always_on)
    assert ovs, "no rows emitted despite a cross-speaker boundary"
    for s, e, la, lb, p in ovs:
        assert la != lb
        # every row straddles the 3.0 s handover, not window midpoints
        assert s <= 3.0 <= e or abs(0.5 * (s + e) - 3.0) < 0.16, (s, e)
        assert (e - s) <= 0.31
    # single-speaker stream: saturated screen but NO handover -> no rows
    ovs2 = detect_overlaps(wav, au, [(0.5, 3.0), (3.0, 6.0)],
                           np.asarray([0, 0]), embs[:2],
                           screen=always_on)
    assert ovs2 == []
