"""Emotion rule table, grouping, and thresholds.

Re-designs modules/utils/emotion_utils.py:5-118: 31 rules over
{pos, neg, neu, pitch, energy, speech_rate, pause, keywords}, a GROUP_MAP
into Negative/Neutral/Positive, and the tier thresholds
T1_AUTO .90 / T1_MIN .80 / T2_AUTO .90 / T2_MIN .65 / STD .30.
"""
from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple

T1_AUTO = 0.90
T1_MIN = 0.80
T2_AUTO = 0.90
T2_MIN = 0.65
STD_REVIEW = 0.30


class Features(NamedTuple):
    pos: float = 0.0
    neg: float = 0.0
    neu: float = 0.0
    pitch: float = 0.0        # z-score
    energy: float = 0.0       # z-score
    speech_rate: float = 0.0  # z-score
    pause: float = 0.0        # z-score
    keywords: frozenset = frozenset()


class Rule(NamedTuple):
    rule_id: str
    label: str
    fn: Callable[[Features], bool]


def _kw(*words):
    return frozenset(words)


# 31-emotion rule table. Each rule fires on a sentiment/prosody/keyword
# pattern; first match wins, later rules are progressively more generic.
RULES: List[Rule] = [
    Rule("R01", "joy", lambda f: f.pos > 0.6 and f.energy > 0.5),
    Rule("R02", "excitement", lambda f: f.pos > 0.5 and f.speech_rate > 1.0),
    Rule("R03", "contentment", lambda f: f.pos > 0.5 and abs(f.energy) < 0.3),
    Rule("R04", "pride", lambda f: f.pos > 0.4 and f.pitch > 0.5
         and bool(f.keywords & _kw("proud", "achieved", "won"))),
    Rule("R05", "amusement", lambda f: f.pos > 0.4
         and bool(f.keywords & _kw("funny", "laugh", "haha", "hilarious"))),
    Rule("R06", "relief", lambda f: f.pos > 0.3 and f.pause > 0.5),
    Rule("R07", "hope", lambda f: f.pos > 0.3
         and bool(f.keywords & _kw("hope", "wish", "maybe", "someday"))),
    Rule("R08", "love", lambda f: f.pos > 0.5
         and bool(f.keywords & _kw("love", "dear", "darling", "heart"))),
    Rule("R09", "gratitude", lambda f: f.pos > 0.4
         and bool(f.keywords & _kw("thank", "thanks", "grateful"))),
    Rule("R10", "anger", lambda f: f.neg > 0.5 and f.energy > 0.8),
    Rule("R11", "rage", lambda f: f.neg > 0.7 and f.energy > 1.2
         and f.pitch > 0.8),
    Rule("R12", "frustration", lambda f: f.neg > 0.4 and f.energy > 0.4
         and f.speech_rate > 0.5),
    Rule("R13", "annoyance", lambda f: f.neg > 0.3 and f.energy > 0.2),
    Rule("R14", "sadness", lambda f: f.neg > 0.5 and f.energy < -0.3),
    Rule("R15", "grief", lambda f: f.neg > 0.6 and f.pause > 0.8
         and f.energy < -0.5),
    Rule("R16", "despair", lambda f: f.neg > 0.7 and f.pitch < -0.5),
    Rule("R17", "disappointment", lambda f: f.neg > 0.4 and f.pitch < -0.2),
    Rule("R18", "fear", lambda f: f.neg > 0.4 and f.pitch > 0.6
         and f.speech_rate > 0.6),
    Rule("R19", "anxiety", lambda f: f.neg > 0.3 and f.speech_rate > 0.8),
    Rule("R20", "dread", lambda f: f.neg > 0.4 and f.pause > 0.6),
    Rule("R21", "disgust", lambda f: f.neg > 0.4
         and bool(f.keywords & _kw("gross", "disgusting", "sick", "awful"))),
    Rule("R22", "contempt", lambda f: f.neg > 0.4
         and bool(f.keywords & _kw("pathetic", "worthless", "beneath"))),
    Rule("R23", "shame", lambda f: f.neg > 0.3 and f.energy < -0.4
         and bool(f.keywords & _kw("sorry", "ashamed", "fault"))),
    Rule("R24", "guilt", lambda f: f.neg > 0.3
         and bool(f.keywords & _kw("guilt", "regret", "blame", "sorry"))),
    Rule("R25", "jealousy", lambda f: f.neg > 0.3
         and bool(f.keywords & _kw("jealous", "envy", "unfair"))),
    Rule("R26", "surprise", lambda f: abs(f.pos - f.neg) < 0.3
         and f.pitch > 0.8),
    Rule("R27", "confusion", lambda f: f.neu > 0.5 and f.pause > 0.4
         and bool(f.keywords & _kw("what", "why", "how", "confused"))),
    Rule("R28", "curiosity", lambda f: f.neu > 0.4 and f.pitch > 0.3
         and bool(f.keywords & _kw("wonder", "curious", "interesting"))),
    Rule("R29", "boredom", lambda f: f.neu > 0.6 and f.energy < -0.3
         and f.speech_rate < -0.3),
    Rule("R30", "calm", lambda f: f.neu > 0.6 and abs(f.energy) < 0.2
         and abs(f.pitch) < 0.2),
    Rule("R31", "neutral", lambda f: True),  # fallback
]

GROUP_MAP: Dict[str, str] = {
    "joy": "Positive", "excitement": "Positive", "contentment": "Positive",
    "pride": "Positive", "amusement": "Positive", "relief": "Positive",
    "hope": "Positive", "love": "Positive", "gratitude": "Positive",
    "anger": "Negative", "rage": "Negative", "frustration": "Negative",
    "annoyance": "Negative", "sadness": "Negative", "grief": "Negative",
    "despair": "Negative", "disappointment": "Negative", "fear": "Negative",
    "anxiety": "Negative", "dread": "Negative", "disgust": "Negative",
    "contempt": "Negative", "shame": "Negative", "guilt": "Negative",
    "jealousy": "Negative",
    "surprise": "Neutral", "confusion": "Neutral", "curiosity": "Neutral",
    "boredom": "Neutral", "calm": "Neutral", "neutral": "Neutral",
}

EMOTION_LABELS = [r.label for r in RULES]


def classify(features: Features) -> Rule:
    """First matching rule (confidence comes from tier logic, not here)."""
    for rule in RULES:
        if rule.fn(features):
            return rule
    return RULES[-1]
