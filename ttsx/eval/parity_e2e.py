"""Parity harness part 3: the full text->waveform end-to-end quality
chain (the number the reference never produced — it has no synthesize()
entry point, SURVEY §3.4).

Chains the trained acoustic -> trained refiner -> trained vocoder on
held-out text and reports text->waveform MCD / multi-res STFT log-L1 /
rms_ratio, for BOTH refiner paths:

  * deterministic (`val_step`, use_sde=False — the serving default), and
  * the 8-step Euler–Maruyama SDE sampler (models/refiner.py sde_sample,
    the loop the reference defers at sde_refiner5/model.py:196-198) —
    so the stochastic sampler has a QUALITY number, not just an RTF one
    (VERDICT r2 missing #2).

The vocoder half (cumulative GAN training + copy-synthesis quality)
lives in ttsx/eval/parity_vocoder.py.

Run: python -m ttsx.eval.parity_aux --exp e2e
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ttsx.core.config import TTSXConfig
from ttsx.eval.parity import _tts_cfg, acoustic_parity
from ttsx.eval.parity_common import _model_batch, _wav_quality
# back-compat re-exports (tests and older scripts import these from here)
from ttsx.eval.parity_vocoder import (_synth_wav, _train_vocoder,  # noqa: F401
                                      vocoder_parity)


def _refine(r_block, r_state, ev_model, ev_pred, batch: int,
            use_sde: bool, seed: int) -> np.ndarray:
    """Batched refiner inference: deterministic val_step or the scanned
    Euler–Maruyama SDE sampler."""
    import jax
    import jax.numpy as jnp
    from ttsx.models.refiner import sde_sample

    if use_sde:
        sample = jax.jit(lambda p, m, pr, sid, t, r: sde_sample(
            r_block.model, p, m, pr, sid, t, r))
    outs = []
    for i in range(0, len(ev_pred), batch):
        mb = {k: jnp.asarray(v[i:i + batch]) for k, v in ev_model.items()}
        pred = jnp.asarray(ev_pred[i:i + batch])
        if use_sde:
            rng = jax.random.PRNGKey(seed + i)
            outs.append(np.asarray(sample(
                r_state.params, pred, mb["prosody"], mb["style_id"],
                mb["text_emb"], rng)))
        else:
            outs.append(np.asarray(r_block.val_step(
                r_state.params, mb, pred)["mel_ref"]))
    return np.concatenate(outs)


def e2e_parity(acoustic_steps: int = 4000, refiner_steps: int = 2400,
               vocoder_steps: int = 2000, frames: int = 128,
               batch: int = 8, seed: int = 0,
               vocoder_save_dir: Optional[str] = None,
               vocoder_overrides: Optional[Dict] = None,
               zoo_dir: Optional[str] = None,
               corpus: str = "tone",
               stage_ckpt_dir: Optional[str] = None) -> Dict:
    """Text -> mel0 -> mel_ref -> waveform with every stage trained; the
    full-chain quality number (held-out utterances).

    With `zoo_dir`, the trained acoustic/refiner/vocoder parameters are
    exported as git-trackable slim npz files (ttsx.zoo loads them back
    into a TTSPipeline). `stage_ckpt_dir` makes the acoustic/refiner
    training legs resumable (the vocoder already is via
    `vocoder_save_dir`) — a wall-clock-killed e2e leg no longer loses
    its ~30 min of stage training (round-5: two 1800 s e2e legs died
    exactly this way)."""
    import jax
    import jax.numpy as jnp
    from ttsx.train.blocks import RefinerBlock

    corpus_kind = corpus
    base = acoustic_parity(steps=acoustic_steps, batch=16, frames=frames,
                           seed=seed, return_states=True, corpus=corpus,
                           save_dir=stage_ckpt_dir)
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
    r_start = 0
    if stage_ckpt_dir is not None:
        from ttsx.train.checkpoint import (restore_checkpoint,
                                           save_checkpoint)
        got = restore_checkpoint(stage_ckpt_dir, "refiner_e2e", r_state)
        if got is not None:
            r_state, r_start, _ = got
            r_start = min(int(r_start), refiner_steps)
    for it in range(refiner_steps - r_start):
        idx = rng.integers(0, len(tr_pred), batch)
        mb = {k: jnp.asarray(v[idx]) for k, v in tr_model.items()}
        r_state, _ = r_block.train_step(
            r_state, mb, jnp.asarray(tr_pred[idx]),
            jnp.asarray(0.3, jnp.float32), jnp.asarray(0.9, jnp.float32))
        done = r_start + it + 1
        if (stage_ckpt_dir is not None and done < refiner_steps
                and done % 800 == 0):
            save_checkpoint(stage_ckpt_dir, "refiner_e2e", r_state, done)
    if stage_ckpt_dir is not None and refiner_steps > r_start:
        save_checkpoint(stage_ckpt_dir, "refiner_e2e", r_state,
                        refiner_steps)
    ev_model = _model_batch(ev_cut)
    mel_ref = _refine(r_block, r_state, ev_model, ev_pred, batch,
                      use_sde=False, seed=seed)
    mel_sde = _refine(r_block, r_state, ev_model, ev_pred, batch,
                      use_sde=True, seed=seed)

    # vocoder trained on ground-truth mels of the same corpus; with
    # vocoder_save_dir, the cumulative-step checkpoint of a previous
    # vocoder_quality run is reused instead of retraining from scratch
    voc = vocoder_parity(steps=vocoder_steps, frames=64, batch=4,
                         n_speakers=corpus.n_speakers, seed=seed,
                         return_states=True, save_dir=vocoder_save_dir,
                         vocoder_overrides=vocoder_overrides,
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
        # effective steps include slim warm-start lineage (VERDICT r4
        # weak #3: zoo.json must match the best checkpoint's true age)
        voc_eff = int(voc.get("effective_steps", vocoder_steps))
        vmeta = {"steps": voc_eff}
        if "mel_scale" in tr:
            # serving-time default scale vector for scale_cond/scale_gain
            # generators (see serve.SynthesisServer(scale_stats=...))
            vmeta["mel_scale_mean"] = tr["mel_scale"].mean(axis=0)
        save_vocoder_slim(str(zd / "vocoder.npz"), v_states, meta=vmeta)
        # merge (not overwrite): aux-stage entries (refenc/prosody/
        # diar_encoder) are written by their own export legs
        import json as _json
        zj = zd / "zoo.json"
        z = _json.loads(zj.read_text()) if zj.exists() else {}
        z.setdefault("steps", {}).update(
            acoustic=acoustic_steps, refiner=refiner_steps,
            vocoder=voc_eff)
        z.update(config="ttsx.eval.parity._tts_cfg()",
                 vocoder_overrides=vocoder_overrides or {},
                 corpus=f"{type(corpus).__name__}"
                        f"(n_speakers={corpus.n_speakers})",
                 seed=seed)
        zj.write_text(_json.dumps(z, indent=1))

    # text->wav must NOT see the target utterance's loudness stats (they
    # don't exist at real serving) — a scale_cond generator gets the
    # TRAIN-corpus mean scale vector instead (ADVICE r2 medium #2);
    # copy-synthesis keeps per-utterance stats (model input there).
    scale_default = tr["mel_scale"].mean(axis=0)
    wav_real = ev_cut["wav"][:, :frames * hop, 0]
    syn = lambda mel, ema, scale=None: _synth_wav(
        v_block, v_states, mel, ev_model, 4, use_ema=ema,
        scale_override=scale)
    wav_e2e = syn(mel_ref, False, scale_default)
    wav_copy = syn(ev_model["mel"], False)
    # EMA generator is the better read once steps >> 1/(1-decay)
    wav_e2e_ema = syn(mel_ref, True, scale_default)
    wav_sde_ema = syn(mel_sde, True, scale_default)
    n = len(wav_e2e)
    return {"exp": "e2e",
            "acoustic_mcd_db": base["mcd_db"],
            "corpus": corpus_kind,
            "copy_synthesis": _wav_quality(wav_copy, wav_real[:len(wav_copy)]),
            "text_to_wav": _wav_quality(wav_e2e, wav_real[:n]),
            "text_to_wav_ema": _wav_quality(wav_e2e_ema, wav_real[:n]),
            "text_to_wav_sde_ema": _wav_quality(wav_sde_ema, wav_real[:n]),
            "eval_utts": int(n),
            "steps": {"acoustic": acoustic_steps,
                      "refiner": refiner_steps,
                      "vocoder": int(voc.get("effective_steps",
                                             vocoder_steps))},
            "vocoder": {k: v for k, v in voc.items()
                        if not k.startswith("_")}}
