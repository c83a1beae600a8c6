"""Parity harness part 3: trained vocoder waveform quality + the full
text->waveform end-to-end quality chain.

Closes the last quality gap in the metric axis: rounds 1-2 measured EER
(refenc), MCD (acoustic, refiner) and DER (diarizer) from trained
checkpoints, but the vocoder only had a GAN-stability smoke. Here:

  * vocoder_parity: train the real VocoderBlock (G+GST vs MPD/MSD/MBD,
    reference-capacity discriminators) on the tone corpus, then measure
    WAV-domain quality on held-out utterances: MCD between the log-mel of
    the generated waveform and of the ground-truth waveform (the standard
    vocoder "re-analysis" metric), plus multi-resolution STFT log-mag L1
    (vocoder7/stft.py:9-54 objective, measured not trained).
  * e2e_parity: chain the trained acoustic -> trained refiner -> trained
    vocoder on held-out text and report text->waveform MCD — the number
    the reference never produced (it has no synthesize() entry point,
    SURVEY §3.4).

Run: python -m ttsx.eval.parity_aux --exp vocoder_quality|e2e
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from ttsx.core.config import TTSXConfig
from ttsx.data.tonecorpus import ToneCorpus
from ttsx.eval.parity import _tts_cfg, acoustic_parity
from ttsx.eval.parity_common import (AUDIO, _batch_sampler, _model_batch,
                                     make_corpus, mel_energy_gain,
                                     _normalize_mels, _wav_quality)


def _train_vocoder(cfg: TTSXConfig, feats: Dict[str, np.ndarray],
                   steps: int, batch: int, seed: int,
                   save_dir: Optional[str] = None):
    """Adversarial training of the real VocoderBlock; returns
    (block, states, seconds, tail-metrics).

    `steps` is the CUMULATIVE step target: with `save_dir`, a previous
    run's Orbax checkpoint is restored and only the remaining steps are
    trained, so quality-curve points (2k/6k/12k/24k/...) extend each
    other instead of retraining from scratch."""
    import os

    import jax
    import jax.numpy as jnp
    from ttsx.train.blocks import VocoderBlock
    from ttsx.train.checkpoint import restore_checkpoint, save_checkpoint
    from ttsx.train.slim_export import load_vocoder_slim, save_vocoder_slim

    block = VocoderBlock(cfg)
    sampler = _batch_sampler(feats, batch, seed)
    first = {k: jnp.asarray(v) for k, v in next(sampler).items()}
    states = block.init_state(jax.random.PRNGKey(seed), first)
    start = 0
    if save_dir is not None:
        got = restore_checkpoint(save_dir, "vocoder_quality", states)
        if got is not None:
            states, start, _ = got
            start = min(int(start), steps)
        elif os.path.exists(f"{save_dir}_slim.npz") and steps > 0:
            # the full Orbax tree is gitignored and dies with the clone at
            # round boundaries; warm-start G+GST from the tracked slim
            # export (discriminators/opts re-init, so step count restarts)
            states = load_vocoder_slim(f"{save_dir}_slim.npz", states)
    d_hist, g_hist = [], []
    parts_hist = {"stft": [], "adv": [], "fm": []}
    t0 = time.perf_counter()
    for _ in range(steps - start):
        mb = {k: jnp.asarray(v) for k, v in next(sampler).items()}
        states, dm = block.disc_step(states, mb)
        states, gm = block.gen_step(states, mb)
        d_hist.append(float(dm["d_loss"]))
        g_hist.append(float(gm["g_loss"]))
        for k in parts_hist:
            if k in gm:
                parts_hist[k].append(float(gm[k]))
    secs = time.perf_counter() - t0
    if save_dir is not None and steps > start:
        save_checkpoint(save_dir, "vocoder_quality", states, steps,
                        extra={"seed": seed, "batch": batch})
        save_vocoder_slim(f"{save_dir}_slim.npz", states,
                          meta={"steps": steps})
    tail = {}
    if d_hist:
        tail = {"d_loss_tail_mean": float(np.mean(d_hist[-100:])),
                "g_loss_tail_mean": float(np.mean(g_hist[-100:])),
                "stable": bool(np.isfinite(d_hist).all()
                               and np.isfinite(g_hist).all())}
        tail.update({f"{k}_tail_mean": float(np.mean(v[-100:]))
                     for k, v in parts_hist.items() if v})
    return block, states, secs, tail


def _synth_wav(block, states, mel_norm: np.ndarray,
               feats: Dict[str, np.ndarray], batch: int,
               use_ema: bool = True) -> np.ndarray:
    """Deterministic mel->wav through the trained generator ([B, N]).

    Runs at matmul precision "highest": TPU default precision computes
    f32 convs with bf16 multiplies, and the resulting broadband noise
    dominates the quality readout of a well-trained generator — the same
    84k checkpoint measures 0.90 STFT log-L1 / 67.5 dB raw MCD at default
    precision vs 0.61 / 55.3 at full f32 (measured, round 2). Training is
    left at default precision (GAN dynamics + speed); this is the
    serve-at-best-quality path."""
    import jax
    import jax.numpy as jnp

    gen_params = (states.gen.ema_params
                  if use_ema and states.gen.ema_params is not None
                  else states.gen.params)
    outs = []
    with jax.default_matmul_precision("highest"):
        for i in range(0, mel_norm.shape[0], batch):
            mb = {"mel_ref": jnp.asarray(mel_norm[i:i + batch]),
                  "prosody": jnp.asarray(feats["prosody"][i:i + batch]),
                  "emotion_probs": jnp.asarray(
                      feats["emotion_probs"][i:i + batch])}
            if "mel_scale" in feats:  # absolute-scale cue (scale_cond)
                mb["mel_scale"] = jnp.asarray(
                    feats["mel_scale"][i:i + batch])
            if mb["mel_ref"].shape[0] < batch:
                break
            wav = block._synthesize(gen_params, states.gst.params, mb,
                                    rng=None, train=False)
            outs.append(np.asarray(wav)[..., 0])
    return np.concatenate(outs)


def vocoder_parity(steps: int = 2000, frames: int = 64, batch: int = 4,
                   n_speakers: int = 4, utts_train: int = 8,
                   utts_eval: int = 3, seed: int = 0,
                   return_states: bool = False,
                   save_dir: Optional[str] = None,
                   vocoder_overrides: Optional[Dict] = None,
                   corpus: str = "tone") -> Dict:
    """Train the GAN vocoder on tones; report held-out wav-domain quality
    (trained vs random weights).

    `vocoder_overrides` replaces fields on the VocoderConfig (e.g.
    {"lambda_energy": 0.1}) — the hook for loss-ablation legs that resume
    a forked checkpoint under a different `save_dir`."""
    import dataclasses

    import jax

    cfg = _tts_cfg()
    if vocoder_overrides:
        cfg = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder,
                                             **vocoder_overrides))
    hop = int(np.prod(cfg.vocoder.upsample_factors))
    corpus_kind = corpus
    corpus = make_corpus(corpus, n_speakers=n_speakers, audio=AUDIO,
                         seed=seed)

    def prep(utts):
        full = _normalize_mels(corpus.features(utts))
        f = _model_batch(full)
        T = f["mel"].shape[1]
        f["wav"] = f["wav"][:, :T * hop]
        return f, full["mel_raw"][:, :T]

    tr, _ = prep(corpus.utterances(utts_train, frames, seed=seed))
    ev, ev_mel_raw = prep(corpus.utterances(utts_eval, frames,
                                            seed=seed + 1))

    # random-weight baseline from a fresh init (same seed)
    block, states, _, _ = _train_vocoder(cfg, tr, 0, batch, seed)
    wav_rand = _synth_wav(block, states, ev["mel"], ev, batch,
                          use_ema=False)
    q_rand = _wav_quality(wav_rand, ev["wav"][:len(wav_rand), :, 0])

    block, states, secs, tail = _train_vocoder(cfg, tr, steps, batch, seed,
                                               save_dir=save_dir)
    # live params are the honest read for short runs: at decay 0.999 the
    # EMA still carries 0.999^steps of the random init (13.5% @ 2k steps)
    wav_fake = _synth_wav(block, states, ev["mel"], ev, batch,
                          use_ema=False)
    q = _wav_quality(wav_fake, ev["wav"][:len(wav_fake), :, 0])
    wav_ema = _synth_wav(block, states, ev["mel"], ev, batch, use_ema=True)
    q_ema = _wav_quality(wav_ema, ev["wav"][:len(wav_ema), :, 0])
    # input-only loudness normalization (parity_common.mel_energy_gain):
    # the requested raw mel is model INPUT at copy-synthesis time, so the
    # gain uses no target-waveform information
    g = mel_energy_gain(wav_ema, ev_mel_raw[:len(wav_ema)], AUDIO)
    q_gm = _wav_quality(wav_ema * g[:, None],
                        ev["wav"][:len(wav_ema), :, 0])

    res: Dict = {"exp": "vocoder_quality", "steps": steps,
                 "corpus": corpus_kind,
                 "train_seconds": secs, "eval_utts": int(len(wav_fake)),
                 "space": "generator input is per-utterance-normalized "
                          "log-mel; quality measured on raw waveforms",
                 **{k: v for k, v in q.items()},
                 **{f"{k}_ema": v for k, v in q_ema.items()},
                 **{f"{k}_gm_ema": v for k, v in q_gm.items()},
                 "gain_match_mean": float(g.mean()),
                 **{f"{k}_random_weights": v for k, v in q_rand.items()},
                 **tail}
    if return_states:
        res["_block"], res["_states"] = block, states
        res["_corpus"] = corpus
    return res


def e2e_parity(acoustic_steps: int = 4000, refiner_steps: int = 2400,
               vocoder_steps: int = 2000, frames: int = 128,
               batch: int = 8, seed: int = 0,
               vocoder_save_dir: Optional[str] = None,
               zoo_dir: Optional[str] = None,
               corpus: str = "tone") -> Dict:
    """Text -> mel0 -> mel_ref -> waveform with every stage trained; the
    full-chain quality number (held-out utterances).

    With `zoo_dir`, the trained acoustic/refiner/vocoder parameters are
    exported as git-trackable slim npz files (ttsx.zoo loads them back
    into a TTSPipeline)."""
    import jax
    import jax.numpy as jnp
    from ttsx.train.blocks import RefinerBlock

    corpus_kind = corpus
    base = acoustic_parity(steps=acoustic_steps, batch=16, frames=frames,
                           seed=seed, return_states=True, corpus=corpus)
    a_state, a_block = base["_state"], base["_block"]
    corpus, tr, ev = base["_data"]
    cfg: TTSXConfig = base["_cfg"]
    hop = int(np.prod(cfg.vocoder.upsample_factors))

    from ttsx.eval.parity_common import _acoustic_preds
    tr_pred, tr_cut = _acoustic_preds(a_block, a_state, tr, batch)
    ev_pred, ev_cut = _acoustic_preds(a_block, a_state, ev, batch)

    # refiner trained on the acoustic's own outputs (flagship levels=2)
    r_block = RefinerBlock(cfg)
    rng = np.random.default_rng(seed)
    tr_model = _model_batch(tr_cut)
    first = {k: jnp.asarray(v[:batch]) for k, v in tr_model.items()}
    r_state = r_block.init_state(jax.random.PRNGKey(seed), first)
    for _ in range(refiner_steps):
        idx = rng.integers(0, len(tr_pred), batch)
        mb = {k: jnp.asarray(v[idx]) for k, v in tr_model.items()}
        r_state, _ = r_block.train_step(
            r_state, mb, jnp.asarray(tr_pred[idx]),
            jnp.asarray(0.3, jnp.float32), jnp.asarray(0.9, jnp.float32))
    ev_model = _model_batch(ev_cut)
    refined = []
    for i in range(0, len(ev_pred), batch):
        mb = {k: jnp.asarray(v[i:i + batch]) for k, v in ev_model.items()}
        refined.append(np.asarray(r_block.val_step(
            r_state.params, mb, jnp.asarray(ev_pred[i:i + batch]))
            ["mel_ref"]))
    mel_ref = np.concatenate(refined)

    # vocoder trained on ground-truth mels of the same corpus; with
    # vocoder_save_dir, the cumulative-step checkpoint of a previous
    # vocoder_quality run is reused instead of retraining from scratch
    voc = vocoder_parity(steps=vocoder_steps, frames=64, batch=4,
                         n_speakers=corpus.n_speakers, seed=seed,
                         return_states=True, save_dir=vocoder_save_dir,
                         corpus=corpus_kind)
    v_block, v_states = voc.pop("_block"), voc.pop("_states")
    voc.pop("_corpus", None)

    if zoo_dir is not None:
        from pathlib import Path

        from ttsx.train.slim_export import save_slim, save_vocoder_slim
        zd = Path(zoo_dir)
        zd.mkdir(parents=True, exist_ok=True)
        save_slim(str(zd / "acoustic.npz"),
                  {"acoustic": a_state.params})
        save_slim(str(zd / "refiner.npz"), {"refiner": r_state.params})
        save_vocoder_slim(str(zd / "vocoder.npz"), v_states,
                          meta={"steps": vocoder_steps})
        (zd / "zoo.json").write_text(__import__("json").dumps(
            {"steps": {"acoustic": acoustic_steps,
                       "refiner": refiner_steps,
                       "vocoder": vocoder_steps},
             "config": "ttsx.eval.parity._tts_cfg()",
             "corpus": f"{type(corpus).__name__}"
                       f"(n_speakers={corpus.n_speakers})",
             "seed": seed}, indent=1))

    wav_real = ev_cut["wav"][:, :frames * hop, 0]
    wav_e2e = _synth_wav(v_block, v_states, mel_ref, ev_model, 4,
                         use_ema=False)
    wav_copy = _synth_wav(v_block, v_states, ev_model["mel"], ev_model, 4,
                          use_ema=False)
    # EMA generator is the better read once steps >> 1/(1-decay)
    wav_e2e_ema = _synth_wav(v_block, v_states, mel_ref, ev_model, 4,
                             use_ema=True)
    n = len(wav_e2e)
    return {"exp": "e2e",
            "acoustic_mcd_db": base["mcd_db"],
            "copy_synthesis": _wav_quality(wav_copy, wav_real[:len(wav_copy)]),
            "text_to_wav": _wav_quality(wav_e2e, wav_real[:n]),
            "text_to_wav_ema": _wav_quality(wav_e2e_ema, wav_real[:n]),
            "eval_utts": int(n),
            "steps": {"acoustic": acoustic_steps,
                      "refiner": refiner_steps,
                      "vocoder": vocoder_steps},
            "vocoder": {k: v for k, v in voc.items()
                        if not k.startswith("_")}}
