"""Optimizers and LR schedules.

Reference schedules: warmup-cosine LambdaLR (reference_encoder/train.py:100-106),
AdamW everywhere, cosine T_max 200k for the vocoder pair (vocoder7/trainer.py),
OneCycle/Cosine per block (train/blocks/*). bf16 on TPU removes the need for
GradScaler (SURVEY §2.10 AMP row).
"""
from __future__ import annotations

import optax


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int,
                  final_scale: float = 0.01) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=lr * final_scale)


def adamw(lr: float | optax.Schedule, weight_decay: float = 1e-2,
          grad_clip: float | None = 1.0, b1: float = 0.9,
          b2: float = 0.999) -> optax.GradientTransformation:
    tx = []
    if grad_clip:
        tx.append(optax.clip_by_global_norm(grad_clip))
    tx.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*tx)


def make_optimizer(lr: float, warmup_steps: int, total_steps: int,
                   weight_decay: float = 1e-2,
                   grad_clip: float | None = 1.0):
    return adamw(warmup_cosine(lr, warmup_steps, total_steps),
                 weight_decay, grad_clip)
