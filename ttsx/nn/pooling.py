"""Temporal pooling heads for the speaker encoder
(reference: reference_encoder/encoder.py:28-52,106-116).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def _masked_moments(x, mask):
    if mask is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1)
    else:
        m = mask[..., None].astype(x.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(x * m, axis=1) / denom
        var = jnp.sum(((x - mean[:, None]) ** 2) * m, axis=1) / denom
    return mean, var


class StatsPooling(nn.Module):
    """[B, T, D] -> [B, 2D] mean||std."""
    @nn.compact
    def __call__(self, x, mask=None):
        mean, var = _masked_moments(x, mask)
        return jnp.concatenate([mean, jnp.sqrt(var + 1e-8)], axis=-1)


class SelfAttentivePooling(nn.Module):
    """[B, T, D] -> [B, D] single-head attentive pooling."""
    hidden: int = 128

    @nn.compact
    def __call__(self, x, mask=None):
        w = nn.Dense(self.hidden)(x)
        w = nn.tanh(w)
        w = nn.Dense(1)(w)  # [B, T, 1]
        if mask is not None:
            w = jnp.where(mask[..., None], w, -1e9)
        w = nn.softmax(w, axis=1)
        return jnp.sum(x * w, axis=1)


class MultiHeadAttentivePooling(nn.Module):
    """[B, T, D] -> [B, D] via H attentive heads fused with a Dense
    (encoder.py:34-52)."""
    dim: int
    heads: int = 4
    hidden: int = 128

    @nn.compact
    def __call__(self, x, mask=None):
        outs = []
        for _ in range(self.heads):
            w = nn.Dense(self.hidden)(x)
            w = nn.tanh(w)
            w = nn.Dense(1)(w)
            if mask is not None:
                w = jnp.where(mask[..., None], w, -1e9)
            w = nn.softmax(w, axis=1)
            outs.append(jnp.sum(x * w, axis=1))
        return nn.Dense(self.dim)(jnp.concatenate(outs, axis=-1))
