"""Vocoder half of the waveform-quality parity harness: cumulative GAN
training with checkpoint/slim resume, deterministic synthesis at eval
precision, and the copy-synthesis quality experiment.

Split out of parity_e2e.py (which keeps the text->wav chain experiment)
to respect the per-directory LoC gate. Run:
python -m ttsx.eval.parity_aux --exp vocoder_quality
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from ttsx.core.config import TTSXConfig
from ttsx.eval.parity import _tts_cfg
from ttsx.eval.parity_common import (AUDIO, _batch_sampler, _model_batch,
                                     make_corpus, mel_energy_gain,
                                     _normalize_mels, _wav_quality)


def _train_vocoder(cfg: TTSXConfig, feats: Dict[str, np.ndarray],
                   steps: int, batch: int, seed: int,
                   save_dir: Optional[str] = None,
                   save_every: int = 2000):
    """Adversarial training of the real VocoderBlock; returns
    (block, states, seconds, tail-metrics).

    `steps` is the CUMULATIVE step target: with `save_dir`, a previous
    run's Orbax checkpoint is restored and only the remaining steps are
    trained, so quality-curve points (2k/6k/12k/24k/...) extend each
    other instead of retraining from scratch. `save_every` checkpoints
    mid-run so a `timeout`-killed leg resumes from its last save instead
    of discarding every trained step (round-4 loss: a 47-min 18k leg
    timed out 2850 s in with nothing written)."""
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
    # effective training already in the params BEFORE this run's counter:
    # a slim warm start restarts the counter at 0 (discs/opts re-init),
    # so the slim meta's cumulative step count carries across rounds and
    # every export records base+counter (VERDICT r4 weak #3: zoo.json
    # said `vocoder: 6000` while serving an 18k-effective checkpoint)
    base_steps = 0
    if save_dir is not None:
        got = restore_checkpoint(save_dir, "vocoder_quality", states)
        if got is not None:
            states, start, extra = got
            base_steps = int(extra.get("base_steps", 0))
            start = min(int(start), steps)
        elif os.path.exists(f"{save_dir}_slim.npz"):
            # NB: also taken at steps=0 — "restore and train nothing",
            # the eval-only read of a tracked slim (the random-weights
            # baseline never passes save_dir, so no conflict)
            # the full Orbax tree is gitignored and dies with the clone at
            # round boundaries; warm-start G+GST from the tracked slim
            # export (discriminators/opts re-init, so step count restarts)
            from ttsx.train.slim_export import load_slim_meta
            base_steps = int(load_slim_meta(
                f"{save_dir}_slim.npz").get("steps", 0))
            states = load_vocoder_slim(f"{save_dir}_slim.npz", states)
    meta = {"steps": steps}
    if "mel_scale" in feats:
        # training-set mean scale vector: the serving-time default
        # for scale_cond models (a text->wav caller has no target
        # utterance to take stats from — serve.py scale_stats)
        meta["mel_scale_mean"] = feats["mel_scale"].mean(axis=0)

    def save(at_step):
        save_checkpoint(save_dir, "vocoder_quality", states, at_step,
                        extra={"seed": seed, "batch": batch,
                               "base_steps": base_steps})
        save_vocoder_slim(f"{save_dir}_slim.npz", states,
                          meta=dict(meta, steps=base_steps + at_step))

    d_hist, g_hist = [], []
    parts_hist = {"stft": [], "adv": [], "fm": []}
    t0 = time.perf_counter()
    for i in range(steps - start):
        mb = {k: jnp.asarray(v) for k, v in next(sampler).items()}
        states, dm = block.disc_step(states, mb)
        states, gm = block.gen_step(states, mb)
        d_hist.append(float(dm["d_loss"]))
        g_hist.append(float(gm["g_loss"]))
        for k in parts_hist:
            if k in gm:
                parts_hist[k].append(float(gm[k]))
        done = start + i + 1
        if (save_dir is not None and save_every > 0 and done < steps
                and (done - start) % save_every == 0):
            save(done)
    secs = time.perf_counter() - t0
    if save_dir is not None and steps > start:
        save(steps)
    tail = {}
    if d_hist:
        tail = {"d_loss_tail_mean": float(np.mean(d_hist[-100:])),
                "g_loss_tail_mean": float(np.mean(g_hist[-100:])),
                "stable": bool(np.isfinite(d_hist).all()
                               and np.isfinite(g_hist).all())}
        tail.update({f"{k}_tail_mean": float(np.mean(v[-100:]))
                     for k, v in parts_hist.items() if v})
    if base_steps:
        tail["effective_steps"] = base_steps + steps
    return block, states, secs, tail


def _synth_wav(block, states, mel_norm: np.ndarray,
               feats: Dict[str, np.ndarray], batch: int,
               use_ema: bool = True,
               scale_override: Optional[np.ndarray] = None) -> np.ndarray:
    """Deterministic mel->wav through the trained generator ([B, N]).

    Runs at matmul precision "highest": TPU default precision computes
    f32 convs with bf16 multiplies, and the resulting broadband noise
    dominates the quality readout of a well-trained generator — the same
    84k checkpoint measures 0.90 STFT log-L1 / 67.5 dB raw MCD at default
    precision vs 0.61 / 55.3 at full f32 (measured, round 2). Training is
    left at default precision (GAN dynamics + speed); this is the
    serve-at-best-quality path.

    `scale_override` replaces the per-utterance mel_scale stats for the
    scale_cond channel ([2*channels] broadcast, or [B, 2*channels]): the
    text->wav chain must NOT see target-utterance loudness stats (they
    don't exist at real serving), so it passes the train-corpus mean
    (ADVICE r2 medium #2); copy-synthesis keeps the per-utterance stats,
    which are model INPUT there."""
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
            if mb["mel_ref"].shape[0] < batch:
                break
            if scale_override is not None:
                mb["mel_scale"] = jnp.broadcast_to(
                    jnp.asarray(scale_override, jnp.float32),
                    (batch, np.shape(scale_override)[-1]))
            elif "mel_scale" in feats:  # absolute-scale cue (scale_cond)
                mb["mel_scale"] = jnp.asarray(
                    feats["mel_scale"][i:i + batch])
            wav = block._synthesize(gen_params, states.gst.params, mb,
                                    rng=None, train=False)
            outs.append(np.asarray(wav)[..., 0])
    return np.concatenate(outs)


def vocoder_parity(steps: int = 2000, frames: int = 64, batch: int = 4,
                   n_speakers: int = 4, utts_train: int = 8,
                   utts_eval: int = 12, seed: int = 0,
                   return_states: bool = False,
                   save_dir: Optional[str] = None,
                   vocoder_overrides: Optional[Dict] = None,
                   corpus: str = "tone") -> Dict:
    """Train the GAN vocoder on tones; report held-out wav-domain quality
    (trained vs random weights).

    The held-out set is utts_eval * n_speakers utterances — 48 at the
    defaults (VERDICT r2 #10 re-anchor; readouts carry per-utterance
    ±std via _wav_quality). `vocoder_overrides` replaces fields on the
    VocoderConfig (e.g. {"scale_cond": True}) — the hook for ablation
    legs that resume a forked checkpoint under a different `save_dir`."""
    import dataclasses

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
