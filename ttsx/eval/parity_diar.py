"""Hard diarization benchmark: many speakers, noise, OVERLAPPED turns.

Round-2's easy stream (3 speakers, clean, gapped) was solved untrained —
trained-vs-untrained DER was identical to 15 decimals, so the learned
components (slice-encoder training, GNN triplet refinement) had no
benchmark where they could matter. This stream is built to separate
them: 6 speakers, 12 dB SNR noise, 30% overlapped turn onsets, 48 turns
(VERDICT r2 weak #6 / next #7), plus the overlap screen's first
accuracy numbers (learned OverlapNet vs the flux+energy heuristic vs
ground-truth overlap regions).

Run: python -m ttsx.eval.parity_aux --exp diarizer_hard \
       --out eval_results/parity_diar.json
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ttsx.data.tonecorpus import ToneCorpus
from ttsx.eval.parity_common import AUDIO, make_corpus


def _interval_pr(dets: List[Tuple[float, float]],
                 truth: List[Tuple[float, float]]) -> Dict:
    """Interval-level precision/recall: a detection scores if it
    intersects any true overlap region, a truth region is recalled if
    any detection intersects it."""
    hit = lambda a, b: min(a[1], b[1]) > max(a[0], b[0])
    tp_d = sum(any(hit(d, t) for t in truth) for d in dets)
    tp_t = sum(any(hit(d, t) for d in dets) for t in truth)
    return {"precision": tp_d / max(len(dets), 1),
            "recall": tp_t / max(len(truth), 1),
            "n_detected": len(dets), "n_true": len(truth)}


def _train_slice_encoder(corpus: ToneCorpus, frames: int = 128,
                         utts: int = 12, steps: int = 400,
                         batch: int = 16, seed: int = 0,
                         noise_db: Optional[float] = None,
                         export_slim: str = ""):
    """Train a diarizer-sized ReferenceEncoder on the corpus speakers;
    returns (cfg, model-params) for SliceEmbedder.

    `noise_db`: when the target stream is noisy (dialogue_hard), train
    on matching additive noise at per-sample random SNR in
    [noise_db-4, noise_db+8] dB — an encoder trained clean is OOD at
    12 dB SNR and collapses every noisy slice to one cluster (measured:
    hard-stream trained DER 0.95 w/ 1 hyp speaker vs 0.80 untrained)."""
    import jax
    import jax.numpy as jnp
    from ttsx.core.config import RefEncConfig
    from ttsx.train.refenc_trainer import RefEncTrainer

    cfg = RefEncConfig(audio=AUDIO, speaker_dim=192, ecapa_channels=256,
                       num_speakers=corpus.n_speakers, warmup_steps=50,
                       total_steps=steps, eval_every=0)
    us = corpus.utterances(utts, frames, seed=seed)
    if noise_db is not None:
        from dataclasses import replace as _dc_replace
        rng_n = np.random.default_rng(seed + 17)
        noisy = []
        for u in us:
            snr = 10.0 ** (rng_n.uniform(noise_db - 4, noise_db + 8) / 20.0)
            w = u.wav + rng_n.normal(size=len(u.wav)).astype(np.float32) \
                * (np.std(u.wav) / snr)
            noisy.append(_dc_replace(u, wav=w.astype(np.float32)))
        us = noisy
    feats = corpus.features(us)
    trainer = RefEncTrainer(cfg)
    rng = np.random.default_rng(seed)
    state = trainer.init_state(jax.random.PRNGKey(seed),
                               jnp.asarray(feats["mel"][:batch]))
    for _ in range(steps):
        idx = rng.integers(0, len(feats["mel"]), batch)
        state, _ = trainer.train_step(state,
                                      jnp.asarray(feats["mel"][idx]),
                                      jnp.asarray(feats["speaker_id"][idx]))
    if export_slim:
        # zoo export so a fresh clone re-derives diarizer embeddings
        # from the TRAINED encoder without TPU retraining (VERDICT r4
        # #5); meta records the non-default cfg the params require
        from ttsx.train.slim_export import save_slim
        save_slim(export_slim, {
            "refenc": jax.device_get(state.params["model"]),
            "_meta": {"speaker_dim": 192, "ecapa_channels": 256,
                      "num_speakers": corpus.n_speakers,
                      "steps": steps,
                      "noise_db": -1.0 if noise_db is None
                      else float(noise_db)}})
    return cfg, state.params["model"]


def diarizer_hard(n_speakers: int = 6, n_turns: int = 48,
                  noise_db: float = 12.0, overlap_prob: float = 0.3,
                  train_steps: int = 800, screen_steps: int = 300,
                  seed: int = 0, out_dir: Optional[str] = None,
                  corpus: str = "tone", export_slim: str = "") -> Dict:
    """Trained-vs-untrained DER on the hard stream + overlap screen
    precision/recall (learned vs heuristic)."""
    import tempfile

    from ttsx.data.dataset import write_wav
    from ttsx.eval.metrics import diarization_error_rate
    from ttsx.pipeline.diarizer.controller import DiarizerController
    from ttsx.pipeline.diarizer.embedding import SliceEmbedder
    from ttsx.pipeline.diarizer.overlap_net import (OverlapScreen,
                                                    train_overlap_net)

    corpus_kind = corpus
    corpus = make_corpus(corpus, n_speakers=max(n_speakers, 4),
                         audio=AUDIO, seed=seed)
    wav, truth, ov_truth = corpus.dialogue_hard(
        list(range(n_speakers)), n_turns, noise_db=noise_db,
        overlap_prob=overlap_prob, seed=seed)
    out = Path(out_dir or tempfile.mkdtemp())
    wav_path = out / "dialogue_hard.wav"
    write_wav(wav_path, wav.astype(np.float32), AUDIO.sample_rate)

    def run(embedder, screen, tag, merge_thresh=0.75):
        # production first-pass config (round 4): 1 s uniform windows +
        # spectral clustering w/ eigengap count (cluster.spectral_cluster)
        # — VAD slices span turns on this stream (27 slices / 48 turns),
        # so slice-granularity labeling was capped near chance.
        ctl = DiarizerController(AUDIO, embedder=embedder,
                                 min_dur=0.8, max_dur=3.0,
                                 overlap_screen=screen,
                                 cluster_merge_thresh=merge_thresh,
                                 cluster_method="spectral",
                                 subsegment_s=1.0)
        res = ctl.diarize_single(str(wav_path), str(out / f"diar_{tag}"))
        hyp = [(s, e, spk) for (s, e), spk in
               zip(res.get("slices", []), res.get("speakers", []))]
        # overlap regions are multi-label: both detected speakers enter
        # the hypothesis (the NIST-style DER needs both for full credit)
        hyp += [(s, e, spk) for s, e, sa, sb, _c in
                res.get("overlap_speakers", []) for spk in (sa, sb)]
        return res, {
            "der": float(diarization_error_rate(truth, hyp)),
            "der_collar_250ms": float(diarization_error_rate(
                truth, hyp, collar=0.25)),
            "n_hyp_speakers": len(set(res.get("speakers", []))),
            "n_slices": len(res.get("slices", []))}

    res_u, der_u = run(None, None, "untrained")

    # trained slice encoder (same recipe as the easy benchmark, more
    # steps — the stream is harder)
    cfg, params = _train_slice_encoder(corpus, steps=train_steps,
                                       seed=seed, noise_db=noise_db,
                                       export_slim=export_slim)
    emb = SliceEmbedder(AUDIO, cfg=cfg, params=params)
    res_t, der_t = run(emb, None, "trained")

    # learned overlap screen: window-level accuracy from its own held-out
    # eval, then stream-level precision/recall vs the true overlap
    # regions, compared against the weight-free heuristic
    net = train_overlap_net(corpus, AUDIO, steps=screen_steps, seed=seed)
    screen = OverlapScreen(AUDIO, net["params"])
    res_s, der_s = run(emb, screen, "screened")

    # prototype-merge threshold sweep on the full trained+screened stack
    # (reuses the trained nets; each pass is one diarize run)
    merge_sweep = {}
    for th in (0.0, 0.65, 0.85):
        _, d = run(emb, screen, f"screened_m{int(th * 100)}",
                   merge_thresh=th)
        merge_sweep[f"{th:.2f}"] = d

    ov = lambda res: [(s, e) for (s, e, *_rest) in res.get("overlaps", [])]
    return {"exp": "diarizer_hard", "corpus": corpus_kind,
            "n_true_speakers": n_speakers, "n_turns": n_turns,
            "noise_db_snr": noise_db, "overlap_prob": overlap_prob,
            "n_true_overlaps": len(ov_truth),
            "untrained": der_u, "trained": der_t,
            "trained_screened": der_s,
            "merge_thresh_sweep": merge_sweep,
            "train_steps": train_steps,
            "overlap_window_eval": net["eval"],
            "overlap_stream_heuristic": _interval_pr(ov(res_t), ov_truth),
            "overlap_stream_learned": _interval_pr(ov(res_s), ov_truth)}
