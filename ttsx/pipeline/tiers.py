"""Tier-1 sentiment tagging and Tier-2 emotion refinement stages.

Re-designs modules/tier1/tier1.py:13-111 and modules/tier2/tier2.py:25-197:
  tier1: per-slice sentiment -> pos/neg/neutral with auto-accept /
         needs-review / force-manual statuses; histogram rebalance caps
         neutral at 50%.
  tier2: negation-aware refinement through the 31-emotion rule table,
         per-slice speaker-embedding running-mean cosine ("ESR") score,
         confidence boost by drift + sentiment amplitude, thresholds
         T2_AUTO .90 / T2_MIN .65, std>.30 forces review.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ttsx.pipeline.contracts import Stage, speaker_dir, write_json_atomic, read_json
from ttsx.pipeline.sentiment import polarity_scores
from ttsx.pipeline import emotion_utils as EU


def _status(conf: float, auto: float, min_t: float) -> str:
    if conf >= auto:
        return "auto-accept"
    if conf >= min_t:
        return "needs-review"
    return "force-manual"


class Tier1Stage(Stage):
    name = "tier1"

    def run(self, context: Dict) -> Dict:
        results = {}
        for spk in context.get("speaker_ids", []):
            d = speaker_dir(context, spk)
            transcript = read_json(d / "transcript.json", {"segments": []})
            tags = []
            for seg in transcript.get("segments", []):
                s = polarity_scores(seg.get("text", ""))
                comp = s["compound"]
                if comp >= 0.05:
                    label = "positive"
                    conf = min(1.0, 0.5 + abs(comp))
                elif comp <= -0.05:
                    label = "negative"
                    conf = min(1.0, 0.5 + abs(comp))
                else:
                    label = "neutral"
                    conf = s["neu"]
                tags.append({
                    "start": seg.get("start", 0.0),
                    "end": seg.get("end", 0.0),
                    "text": seg.get("text", ""),
                    "label": label,
                    "confidence": round(conf, 3),
                    "scores": s,
                    "status": _status(conf, EU.T1_AUTO, EU.T1_MIN),
                })
            tags = self._rebalance(tags)
            write_json_atomic(d / "tier1_tags.json", {"tags": tags})
            results[spk] = {"n": len(tags)}
        return {"speakers": results}

    @staticmethod
    def _rebalance(tags: List[Dict]) -> List[Dict]:
        """Cap neutral at 50%: flip the most polarized neutrals
        (tier1.py histogram rebalance)."""
        if not tags:
            return tags
        neutral = [t for t in tags if t["label"] == "neutral"]
        if len(neutral) <= len(tags) * 0.5:
            return tags
        excess = len(neutral) - int(len(tags) * 0.5)
        neutral.sort(key=lambda t: -abs(t["scores"]["compound"]))
        for t in neutral[:excess]:
            comp = t["scores"]["compound"]
            t["label"] = "positive" if comp > 0 else "negative"
            t["status"] = "needs-review"
        return tags


NEGATION_TOKENS = EU and {"not", "no", "never", "n't", "without", "hardly"}


def invert_if_negated(text: str, scores: Dict) -> Dict:
    """spaCy/negspacy-equivalent heuristic: if a negation token precedes
    the strongest sentiment word, swap pos/neg (tier2.py negation
    inversion)."""
    words = text.lower().split()
    if any(w in NEGATION_TOKENS or w.endswith("n't") for w in words):
        flipped = dict(scores)
        flipped["pos"], flipped["neg"] = scores["neg"], scores["pos"]
        flipped["compound"] = -scores["compound"]
        return flipped
    return scores


def contradiction_score(text: str) -> float:
    """Stanza-equivalent heuristic: 'but/however/although' mid-sentence
    signals a contradiction (tier2.py contradiction check)."""
    words = text.lower().split()
    pivots = sum(1 for w in words if w in
                 ("but", "however", "although", "yet", "except"))
    return min(1.0, pivots * 0.5)


class Tier2Stage(Stage):
    name = "tier2"

    def __init__(self, embed_fn=None, emotion_fn=None):
        # embed_fn(wav_slice | text) -> np.ndarray speaker embedding, used
        # for the running-mean cosine ESR score; None -> ESR neutral 0.5
        self.embed_fn = embed_fn
        # emotion_fn(vader[4], prosody_vec[19]) -> probs[6]: the trained
        # EmotionClassifier + EmotionWeightLearner blend (prosody3/
        # assign_emotion_tags.py); None -> rule table only
        self.emotion_fn = emotion_fn

    def run(self, context: Dict) -> Dict:
        results = {}
        for spk in context.get("speaker_ids", []):
            d = speaker_dir(context, spk)
            t1 = read_json(d / "tier1_tags.json", {"tags": []})["tags"]
            drift = read_json(d / "drift_vector.json", {})
            events = drift.get("events", [])
            drift_conf = (np.mean([e["confidence"] for e in events])
                          if events else 0.0)
            running_emb: Optional[np.ndarray] = None
            out = []
            for i, tag in enumerate(t1):
                scores = invert_if_negated(tag["text"], tag["scores"])
                contra = contradiction_score(tag["text"])
                # prosody z-scores from drift deltas when present
                deltas = np.asarray(drift.get("deltas", []), np.float64)
                z = 0.0
                if len(deltas):
                    j = min(i, len(deltas) - 1)
                    z = float((deltas[j] - deltas.mean())
                              / (deltas.std() + 1e-6))
                feats = EU.Features(
                    pos=scores["pos"], neg=scores["neg"], neu=scores["neu"],
                    pitch=z, energy=z, speech_rate=0.0, pause=0.0,
                    keywords=frozenset(tag["text"].lower().split()))
                rule = EU.classify(feats)
                model_label = None
                if self.emotion_fn is not None:
                    vader = np.asarray([scores["pos"], scores["neg"],
                                        scores["neu"], scores["compound"]])
                    pvec = np.concatenate([[z] * 6,
                                           np.zeros(13)])[:19]
                    probs = np.asarray(self.emotion_fn(vader, pvec))
                    from ttsx.models.prosody import EMOTIONS
                    model_label = EMOTIONS[int(np.argmax(probs))]

                # ESR: cosine of slice embedding vs running mean
                esr = 0.5
                if self.embed_fn is not None:
                    emb = np.asarray(self.embed_fn(tag["text"]), np.float64)
                    emb = emb / (np.linalg.norm(emb) + 1e-8)
                    if running_emb is None:
                        running_emb = emb
                    else:
                        esr = float(np.dot(emb, running_emb)
                                    / (np.linalg.norm(running_emb) + 1e-8))
                        running_emb = 0.9 * running_emb + 0.1 * emb
                        running_emb /= np.linalg.norm(running_emb) + 1e-8

                conf = tag["confidence"]
                conf = conf * (1.0 - 0.3 * contra)
                conf = min(1.0, conf + 0.1 * drift_conf
                           + 0.1 * abs(scores["compound"]))
                entry = {
                    "start": tag["start"], "end": tag["end"],
                    "text": tag["text"],
                    "label": rule.label,
                    "group": EU.GROUP_MAP[rule.label],
                    "rule_id": rule.rule_id,
                    "confidence": round(float(conf), 3),
                    "esr_score": round(float(esr), 3),
                    "status": _status(conf, EU.T2_AUTO, EU.T2_MIN),
                }
                if model_label is not None:
                    entry["model_label"] = model_label
                out.append(entry)
            # high variance forces review (tier2.py std>0.30)
            if out:
                confs = np.asarray([t["confidence"] for t in out])
                if confs.std() > EU.STD_REVIEW:
                    for t in out:
                        if t["status"] == "auto-accept":
                            t["status"] = "needs-review"
            write_json_atomic(d / "tier2_tags.json", {"tags": out})
            results[spk] = {"n": len(out)}
        return {"speakers": results}
