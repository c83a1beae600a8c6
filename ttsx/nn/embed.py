"""Positional embeddings: sinusoidal frequency PE and rotary time PE.

Reference: prosody3/freq_pos_embed.py:6-24 (sinusoidal buffer),
acoustic4/model.py:11-26 (simplified rotary).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


def sinusoidal_table(n_pos: int, dim: int) -> np.ndarray:
    """Standard sin/cos table [n_pos, dim] (prosody3/freq_pos_embed.py)."""
    pos = np.arange(n_pos, dtype=np.float32)[:, None]
    i = np.arange(dim, dtype=np.float32)[None, :]
    angle = pos / np.power(10000.0, 2.0 * np.floor(i / 2.0) / dim)
    table = np.zeros((n_pos, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class FreqPosEmbed(nn.Module):
    """Fixed sinusoidal PE, returned as [n_freq, dim]."""
    n_freq: int
    dim: int

    def setup(self):
        self.table = jnp.asarray(sinusoidal_table(self.n_freq, self.dim))

    def __call__(self) -> jnp.ndarray:
        return self.table


def extend_to_length(pe: jnp.ndarray, t: int) -> jnp.ndarray:
    """Crop or tail-extend a [L, D] table to length t
    (prosody3/prosody_predictor.py:135-141 pad-with-last semantics)."""
    L = pe.shape[0]
    if t <= L:
        return pe[:t]
    tail = jnp.broadcast_to(pe[-1:], (t - L, pe.shape[1]))
    return jnp.concatenate([pe, tail], axis=0)


def rotary_mix(x: jnp.ndarray) -> jnp.ndarray:
    """Simplified rotary PE of the reference (acoustic4/model.py:19-26):
    cos(emb) * x + sin(emb) * roll(x, 1, axis=-1), emb = [freqs, freqs].

    x: [B, T, D].
    """
    b, t, d = x.shape
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = jnp.arange(t, dtype=jnp.float32)[:, None] * inv_freq[None, :]  # [T, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [T, d]
    cos = jnp.cos(emb)[None]
    sin = jnp.sin(emb)[None]
    return cos * x + sin * jnp.roll(x, shift=1, axis=-1)
