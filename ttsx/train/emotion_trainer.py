"""Emotion classifier trainer (prosody3 stage-2 auxiliary head).

Trains EmotionClassifier (23-d = 4 VADER + 19 prosody -> 6 sigmoid probs)
with BCE against multi-hot emotion targets, and EmotionWeightLearner to
gate the VADER-vs-prosody blend (prosody3/emotion_classifier.py +
assign_emotion_tags.py flow).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ttsx.models.prosody import EmotionClassifier, EmotionWeightLearner
from ttsx.train.optim import make_optimizer
from ttsx.train.state import TrainState


class EmotionTrainer:
    def __init__(self, hidden: int = 64, n_emotions: int = 6,
                 lr: float = 1e-3, warmup: int = 100, total: int = 10_000):
        self.classifier = EmotionClassifier(hidden=hidden,
                                            n_emotions=n_emotions)
        self.weight_learner = EmotionWeightLearner()
        self._opt = (lr, warmup, total)

    def init_state(self, rng: jax.Array) -> TrainState:
        r1, r2, r3 = jax.random.split(rng, 3)
        feats = jnp.zeros((1, 23))
        params = {
            "classifier": self.classifier.init(r1, feats),
            "weights": self.weight_learner.init(
                r2, jnp.zeros((1, 4)), jnp.zeros((1, 19))),
        }
        lr, warmup, total = self._opt
        tx = make_optimizer(lr, warmup, total)
        return TrainState.create(None, params, tx, r3)

    def predict(self, params, vader: jnp.ndarray,
                prosody_vec: jnp.ndarray) -> jnp.ndarray:
        """Blended prediction: gate * vader-features + (1-gate) * prosody
        (assign_emotion_tags.py weight-blend), then classify."""
        gate = self.weight_learner.apply(params["weights"], vader,
                                         prosody_vec)          # [B, 1]
        feats = jnp.concatenate([vader * gate,
                                 prosody_vec * (1.0 - gate)], axis=-1)
        return self.classifier.apply(params["classifier"], feats)

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, vader, prosody_vec, targets):
        def loss_fn(params):
            probs = self.predict(params, vader, prosody_vec)
            eps = 1e-7
            bce = -jnp.mean(targets * jnp.log(probs + eps)
                            + (1 - targets) * jnp.log(1 - probs + eps))
            return bce
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}
