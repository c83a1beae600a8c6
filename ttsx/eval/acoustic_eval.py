"""Acoustic-model evaluation + microbenchmarks.

Re-designs acoustic4/Eval_Acoustic.py:14-78 (validation loss, silhouette
of emotion preds vs speakers, emotion-tag accuracy vs annotations, MOS
placeholder) and acoustic4/microbenchmarks.py:8-44 (20-run forward timers
for the acoustic and prosody models).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ttsx.eval.benchmarks import time_fn
from ttsx.eval.metrics import silhouette_score

MOS_PLACEHOLDER = 4.0  # Eval_Acoustic.py:54-55 ("requires human evaluation")


def evaluate_acoustic(model, params, batches: Iterable[Dict],
                      annotations_path: Optional[str] = None,
                      emotion_probs_fn=None) -> Dict:
    """Validation L1 + silhouette(emotion preds vs speaker ids) + optional
    emotion-tag accuracy vs a validation_annotations.json file."""
    losses = []
    emo_preds = []
    speaker_ids = []
    for batch in batches:
        out = model.apply(params, batch["text_emb"], batch["prosody"],
                          batch["emotion_probs"],
                          target_mel=batch["mel"],
                          speaker=batch.get("speaker"),
                          deterministic=True)
        losses.append(float(jnp.mean(jnp.abs(out.mel - batch["mel"]))))
        emo_preds.append(np.asarray(batch["emotion_probs"]))
        sid = batch.get("speaker_id",
                        np.zeros(batch["mel"].shape[0], np.int64))
        speaker_ids.append(np.asarray(sid))

    result = {
        "val_loss": float(np.mean(losses)) if losses else float("nan"),
        "mos": MOS_PLACEHOLDER,
    }
    if emo_preds:
        x = np.concatenate(emo_preds)
        labels = np.concatenate(speaker_ids)
        result["silhouette"] = silhouette_score(x, labels)

    if annotations_path and Path(annotations_path).exists():
        ann = json.loads(Path(annotations_path).read_text())
        correct = total = 0
        for item in ann.get("items", []):
            total += 1
            if item.get("predicted") == item.get("label"):
                correct += 1
        result["emotion_accuracy"] = correct / total if total else 0.0
    return result


def microbenchmarks(runs: int = 20, frames: int = 128) -> Dict:
    """20-run forward timers for AcousticModel + ProsodyPredictor
    (acoustic4/microbenchmarks.py)."""
    from ttsx.core.config import AcousticConfig, ProsodyConfig
    from ttsx.models import AcousticModel, ProsodyPredictor

    rng = jax.random.PRNGKey(0)
    out: Dict = {}

    ac_cfg = AcousticConfig()
    ac = AcousticModel(ac_cfg)
    text = jnp.zeros((2, frames, ac_cfg.text_emb_dim))
    pros = jnp.zeros((2, frames, 18))
    emo = jnp.full((2, 6), 1 / 6)
    ap = ac.init(rng, text, pros, emo)
    ac_fn = jax.jit(lambda t, p, e: ac.apply(ap, t, p, e).mel)
    out["acoustic"] = time_fn(ac_fn, text, pros, emo, runs=runs)

    pr_cfg = ProsodyConfig()
    pr = ProsodyPredictor(pr_cfg)
    mel = jnp.zeros((2, frames, 80))
    pp = pr.init(rng, mel)
    pr_fn = jax.jit(lambda m: pr.apply(pp, m)["f0"])
    out["prosody"] = time_fn(pr_fn, mel, runs=runs)
    return out
