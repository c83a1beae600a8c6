"""Parity-number harness: trained EER / MCD / DER on the tone corpus.

BASELINE.md's metric axis (speaker EER parity, MCD, diarization DER) needs
numbers from TRAINED checkpoints, not random weights (VERDICT r1 missing
#2). The container ships no speech data, so each experiment trains on
ttsx/data/tonecorpus.py — a synthetic corpus with real learnable speaker/
phoneme structure — and reports a held-out metric:

  * refenc:   train ReferenceEncoder (ArcFace) -> all-pairs cosine EER on
              held-out utterances (verify_eer.py:11-42 semantics).
  * acoustic: train AcousticBlock text->mel -> MCD dB on held-out
              utterances (log-mel, standard DCT-cepstra MCD).
  * refiner:  train ScoreSDERefiner on the trained acoustic's outputs at
              levels in {2, 3} -> MCD after refinement (VERDICT #9 depth
              decision data).
  * vocoder:  500-step GAN smoke at reference-capacity discriminators ->
              D/G loss band (VERDICT #4 done-criterion).
  * diarizer: synthetic multi-speaker dialogue -> DER/purity vs ground
              truth (hyper_diarizer/cli.py:179-188 semantics).

Run: python -m ttsx.eval.parity_aux --exp refenc|acoustic|refiner|vocoder|
diarizer|all [--out results.json]. Heavy experiments are TPU-sized; the
diarizer one is host-side.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ttsx.core.config import (AcousticConfig, RefEncConfig,
                              RefinerConfig, S4Config, TTSXConfig,
                              TrainConfig, VocoderConfig)
from ttsx.data.tonecorpus import ToneCorpus

from ttsx.eval.parity_common import (AUDIO, _batch_sampler,
                                     _denorm_mcd, _model_batch,
                                     _normalize_mels, _speaker_vec,
                                     make_corpus)


# ---------------------------------------------------------------------------
# 2. acoustic -> MCD (and mel_pred handoff for the refiner experiment)
# ---------------------------------------------------------------------------
def _tts_cfg(levels: int = 2) -> TTSXConfig:
    return TTSXConfig(
        acoustic=AcousticConfig(text_emb_dim=256, speaker_dim=16),
        refiner=RefinerConfig(
            levels=levels,
            s4=S4Config(heads=4, l_max=1024, causal=True, norm_groups=4,
                        dropout=0.1)),
        vocoder=VocoderConfig(),
        train=TrainConfig(warmup_steps=100, max_steps=100_000, lr=2e-4),
    )


def _acoustic_data(n_speakers: int, utts_train: int, utts_eval: int,
                   frames: int, seed: int, cfg: TTSXConfig,
                   corpus: str = "tone"):
    corpus = make_corpus(corpus, n_speakers=n_speakers,
                         text_dim=cfg.acoustic.text_emb_dim,
                         audio=AUDIO, seed=seed)
    tr = _normalize_mels(
        corpus.features(corpus.utterances(utts_train, frames, seed=seed)))
    ev = _normalize_mels(
        corpus.features(corpus.utterances(utts_eval, frames,
                                          seed=seed + 1)))
    for d in (tr, ev):
        d["speaker"] = _speaker_vec(d["speaker_id"],
                                    cfg.acoustic.speaker_dim, n_speakers)
    return corpus, tr, ev


def acoustic_parity(n_speakers: int = 8, utts_train: int = 24,
                    utts_eval: int = 8, frames: int = 128,
                    steps: int = 4000, batch: int = 16, seed: int = 0,
                    return_states: bool = False,
                    corpus: str = "tone",
                    save_dir: Optional[str] = None) -> Dict:
    import jax
    import jax.numpy as jnp
    from ttsx.train.blocks import AcousticBlock
    from ttsx.eval.metrics import mel_cepstral_distortion

    cfg = _tts_cfg()
    corpus, tr, ev = _acoustic_data(n_speakers, utts_train, utts_eval,
                                    frames, seed, cfg, corpus=corpus)
    block = AcousticBlock(cfg)
    sampler = _batch_sampler(_model_batch(tr), batch, seed)
    first = next(sampler)
    state = block.init_state(jax.random.PRNGKey(seed),
                             {k: jnp.asarray(v) for k, v in first.items()})

    def eval_mcd(params, data):
        mcds, preds = [], []
        mb_all = _model_batch(data)
        for i in range(0, len(data["mel"]), batch):
            mb = {k: jnp.asarray(v[i:i + batch])
                  for k, v in mb_all.items()}
            if mb["mel"].shape[0] < batch:
                break
            out = block.val_step(params, mb)
            pred = np.asarray(out["mel_pred"])
            preds.append(pred)
            for j in range(pred.shape[0]):
                mcds.append(_denorm_mcd(pred[j], data, i + j,
                                        mel_cepstral_distortion))
        return float(np.mean(mcds)), preds

    mcd_random, _ = eval_mcd(state.params, ev)
    # resumable training (same contract as _train_vocoder): an e2e leg
    # killed by its wall-clock budget keeps the acoustic's progress
    start = 0
    if save_dir is not None:
        from ttsx.train.checkpoint import restore_checkpoint
        got = restore_checkpoint(save_dir, "acoustic", state)
        if got is not None:
            state, start, _ = got
            start = min(int(start), steps)
    t0 = time.perf_counter()
    loss = float("nan")
    for step in range(steps - start):
        mb = {k: jnp.asarray(v) for k, v in next(sampler).items()}
        state, out = block.train_step(state, mb)
        loss = float(out["metrics"]["loss"])
        done = start + step + 1
        if save_dir is not None and done < steps and done % 1000 == 0:
            from ttsx.train.checkpoint import save_checkpoint
            save_checkpoint(save_dir, "acoustic", state, done)
    if save_dir is not None and steps > start:
        from ttsx.train.checkpoint import save_checkpoint
        save_checkpoint(save_dir, "acoustic", state, steps)
    train_s = time.perf_counter() - t0
    mcd, _ = eval_mcd(state.params, ev)
    res = {"exp": "acoustic", "mcd_db": mcd,
           "mcd_random_weights_db": mcd_random, "final_loss": loss,
           "steps": steps, "train_seconds": train_s,
           "space": "trained on per-utterance-normalized log-mel; MCD "
                    "measured on de-normalized (raw log-mel) frames",
           "eval_utts": len(ev["mel"])}
    if return_states:
        res["_state"] = state
        res["_block"] = block
        res["_data"] = (corpus, tr, ev)
        res["_cfg"] = cfg
    return res


# ---------------------------------------------------------------------------
# 3. refiner depth comparison -> MCD at levels 2 vs 3
# ---------------------------------------------------------------------------
def refiner_parity(levels: Sequence[int] = (2, 3), steps: int = 2400,
                   acoustic_steps: int = 4000, batch: int = 8,
                   frames: int = 128, seed: int = 0,
                   corpus: str = "tone") -> Dict:
    import jax
    import jax.numpy as jnp
    from ttsx.train.blocks import RefinerBlock
    from ttsx.eval.metrics import mel_cepstral_distortion

    base = acoustic_parity(steps=acoustic_steps, batch=16, frames=frames,
                           seed=seed, return_states=True, corpus=corpus)
    a_state, a_block = base["_state"], base["_block"]
    corpus, tr, ev = base["_data"]

    from ttsx.eval.parity_common import _acoustic_preds
    tr_pred, tr_cut = _acoustic_preds(a_block, a_state, tr, batch)
    ev_pred, ev_cut = _acoustic_preds(a_block, a_state, ev, batch)

    out: Dict = {"exp": "refiner", "acoustic_mcd_db": base["mcd_db"],
                 "space": base["space"], "levels": {},
                 # full acoustic experiment record (shares the training run)
                 "acoustic": {k: v for k, v in base.items()
                              if not k.startswith("_")}}
    for lv in levels:
        cfg = _tts_cfg(levels=lv)
        block = RefinerBlock(cfg)
        rng = np.random.default_rng(seed)
        tr_model = _model_batch(tr_cut)
        ev_model = _model_batch(ev_cut)
        first = {k: jnp.asarray(v[:batch]) for k, v in tr_model.items()}
        state = block.init_state(jax.random.PRNGKey(seed), first)
        t0 = time.perf_counter()
        for step in range(steps):
            idx = rng.integers(0, len(tr_pred), batch)
            mb = {k: jnp.asarray(v[idx]) for k, v in tr_model.items()}
            state, m = block.train_step(
                state, mb, jnp.asarray(tr_pred[idx]),
                jnp.asarray(0.3, jnp.float32), jnp.asarray(0.9, jnp.float32))
        train_s = time.perf_counter() - t0
        mcds = []
        for i in range(0, len(ev_pred), batch):
            mb = {k: jnp.asarray(v[i:i + batch])
                  for k, v in ev_model.items()}
            if mb["mel"].shape[0] < batch:
                break
            r = block.val_step(state.params, mb,
                               jnp.asarray(ev_pred[i:i + batch]))
            ref = np.asarray(r["mel_ref"])
            for j in range(ref.shape[0]):
                mcds.append(_denorm_mcd(ref[j], ev_cut, i + j,
                                        mel_cepstral_distortion))
        out["levels"][str(lv)] = {
            "mcd_db": float(np.mean(mcds)),
            "final_loss": float(m["metrics"]["loss"]),
            "steps": steps, "train_seconds": train_s}
    return out


