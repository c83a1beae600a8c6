"""Stage-1 speaker-encoder trainer.

Re-designs reference_encoder/train.py:35-192: seeded speaker-balanced
batches, ArcFace or GE2E, AdamW + warmup-cosine, grad-accum (x16 in the
reference) with clip 3.0, per-epoch EER eval, best/final checkpoints with
model/opt/step/best_eer. bf16 replaces AMP+GradScaler; grad accumulation
is a lax.scan over micro-batches so the whole accumulation window is ONE
XLA program.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttsx.core.config import RefEncConfig
from ttsx.models.reference_encoder import ReferenceEncoder
from ttsx.train import losses as L
from ttsx.train.optim import make_optimizer
from ttsx.train.state import TrainState


class RefEncTrainer:
    def __init__(self, cfg: RefEncConfig):
        self.cfg = cfg
        self.model = ReferenceEncoder(cfg)

    # -- state ---------------------------------------------------------
    def init_state(self, rng: jax.Array, mel: jnp.ndarray) -> TrainState:
        cfg = self.cfg
        rng, init_rng, loss_rng = jax.random.split(rng, 3)
        params = {"model": jax.jit(
            lambda r: self.model.init(r, mel))(init_rng)}
        if cfg.loss == "arcface":
            params["arcface_w"] = jax.nn.initializers.glorot_uniform()(
                loss_rng, (cfg.num_speakers, cfg.speaker_dim))
        else:
            params["ge2e_w"] = jnp.asarray(cfg.ge2e_init_w)
            params["ge2e_b"] = jnp.asarray(cfg.ge2e_init_b)
        tx = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps,
                            grad_clip=cfg.grad_clip)
        return TrainState.create(self.model.apply, params, tx, rng)

    # -- loss ------------------------------------------------------------
    def _margin(self, step):
        """Linear margin warmup (reference loss.py:5-35 optional margin
        schedule): 0 -> arcface_margin over arcface_margin_warmup steps."""
        cfg = self.cfg
        if cfg.arcface_margin_warmup <= 0:
            return cfg.arcface_margin
        frac = jnp.minimum(
            step.astype(jnp.float32) / cfg.arcface_margin_warmup, 1.0)
        return cfg.arcface_margin * frac

    def _loss(self, params, mel, labels, mask, step=None,
              labels2=None, alpha=None):
        cfg = self.cfg
        emb = self.model.apply(params["model"], mel, mask)
        if cfg.loss == "arcface":
            margin = (cfg.arcface_margin if step is None
                      else self._margin(step))
            loss = L.arcface_loss(emb, labels, params["arcface_w"],
                                  margin, cfg.arcface_scale)
            if labels2 is not None:
                # mixup pair target (reference dataset.py:71-80 beta-mixup
                # returns (spk, spk2, alpha); convex loss combination)
                loss2 = L.arcface_loss(emb, labels2, params["arcface_w"],
                                       margin, cfg.arcface_scale)
                loss = alpha * loss + (1.0 - alpha) * loss2
            return loss
        n_spk = cfg.micro_batch // 2 if cfg.micro_batch >= 4 else 2
        m_utt = mel.shape[0] // n_spk
        return L.ge2e_loss(emb, labels, params["ge2e_w"],
                           params["ge2e_b"], n_spk, m_utt)

    # -- steps -------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, mel, labels, mask=None):
        loss, grads = jax.value_and_grad(self._loss)(
            state.params, mel, labels, mask, state.step)
        return state.apply_gradients(grads), {"loss": loss}

    @partial(jax.jit, static_argnums=(0,))
    def train_step_mixup(self, state: TrainState, mel, mel2, labels,
                         labels2, alpha):
        """Beta-mixup training step (arcface only): inputs are mixed
        alpha*mel + (1-alpha)*mel2, loss is the convex combination of the
        two speakers' ArcFace losses. alpha: [B] or scalar."""
        a = jnp.reshape(alpha, (-1, 1, 1))
        mixed = a * mel + (1.0 - a) * mel2
        loss, grads = jax.value_and_grad(self._loss)(
            state.params, mixed, labels, None, state.step,
            labels2, jnp.mean(alpha))
        return state.apply_gradients(grads), {"loss": loss}

    @partial(jax.jit, static_argnums=(0,))
    def train_step_accum(self, state: TrainState, mels, labels, masks=None):
        """Grad-accumulation via lax.scan over the leading micro-batch axis
        (train.py:144-159 x16 accumulation as ONE compiled program).

        mels: [A, mb, T, F]; labels: [A, mb].
        """
        def micro(carry, xs):
            g_acc, l_acc = carry
            mel, lab = xs
            loss, grads = jax.value_and_grad(self._loss)(
                state.params, mel, lab, None, state.step)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, loss), _ = jax.lax.scan(micro, (zeros, 0.0), (mels, labels))
        n = mels.shape[0]
        grads = jax.tree_util.tree_map(lambda g: g / n, grads)
        state = state.apply_gradients(grads)
        return state, {"loss": loss / n}

    @partial(jax.jit, static_argnums=(0,))
    def embed(self, params, mel, mask=None):
        return self.model.apply(params["model"], mel, mask)

    # -- eval --------------------------------------------------------------
    def evaluate_eer(self, state: TrainState, eval_batches) -> float:
        """verify_eer.py:11-42 semantics: embed the eval set, all-pairs
        cosine EER."""
        from ttsx.eval.metrics import all_pairs_eer
        embs, spks = [], []
        for mel, labels in eval_batches:
            e = self.embed(state.params, jnp.asarray(mel))
            embs.append(np.asarray(e))
            spks.append(np.asarray(labels))
        if not embs:
            return float("inf")
        return all_pairs_eer(np.concatenate(embs), np.concatenate(spks))

    # -- full loop -----------------------------------------------------------
    def train(self, train_batches: Iterable[Tuple], eval_fn: Optional[Callable]
              = None, max_steps: Optional[int] = None,
              checkpoint_dir: Optional[str] = None,
              rng: Optional[jax.Array] = None) -> Dict:
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        state = None
        best_eer = float("inf")
        step = 0
        for mel, labels in train_batches:
            mel = jnp.asarray(mel)
            labels = jnp.asarray(labels)
            if state is None:
                state = self.init_state(rng, mel)
            state, m = self.train_step(state, mel, labels)
            step += 1
            if max_steps and step >= max_steps:
                break
            if eval_fn and cfg.eval_every and step % cfg.eval_every == 0:
                eer = eval_fn(state)
                if eer < best_eer:
                    best_eer = eer
                    if checkpoint_dir:
                        from ttsx.train.checkpoint import save_checkpoint
                        save_checkpoint(checkpoint_dir, "best",
                                        {"refenc": state}, step,
                                        {"best_eer": best_eer})
        if checkpoint_dir and state is not None:
            from ttsx.train.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_dir, "final", {"refenc": state},
                            step, {"best_eer": best_eer})
        return {"state": state, "steps": step, "best_eer": best_eer}
