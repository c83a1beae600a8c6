"""Temporal-Feature transformer block with dual attention
(reference: sde_refiner5/blocks/tf_block.py:6-37) and the harmonic
source-filter blocks (blocks/hsf.py, blocks/source_filter.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ttsx.nn.attention import MHSA
from ttsx.nn.conv import Conv1d


class TFBlock(nn.Module):
    """Dual time-/feature-attention + LN-MLP residual, over [B, T, C]."""
    channels: int
    heads: int = 4
    dim_ff: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # dual attention over [B, T, C]: the reference's t_attn and f_attn
        # both consume the same [B, T, C] permutation (tf_block.py:24-30),
        # so "feature attention" is a second time-attention head bank —
        # kept that way so params stay independent of sequence length.
        t_out = MHSA(self.heads)(x, deterministic=deterministic)
        f_out = MHSA(self.heads)(x, deterministic=deterministic)
        h = t_out + f_out
        y = nn.LayerNorm()(h)
        y = nn.Dense(self.dim_ff)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.channels)(y)
        return x + y


class HSFLayer(nn.Module):
    """Harmonic-source-filter residual conv stack
    (sde_refiner5/blocks/hsf.py). [B, T, C] -> [B, T, C]."""
    channels: int
    hidden: int | None = None
    layers: int = 3
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = self.hidden or self.channels
        y = Conv1d(hid, self.kernel_size)(x)
        y = nn.relu(y)
        for _ in range(max(0, self.layers - 2)):
            y = Conv1d(hid, self.kernel_size)(y)
            y = nn.relu(y)
        return Conv1d(self.channels, self.kernel_size)(y)


class HarmonicSourceFilter(nn.Module):
    """Harmonic/noise branches blended by a sigmoid gate
    (sde_refiner5/blocks/source_filter.py)."""
    channels: int = 80
    filt_ch: int = 64

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        h = Conv1d(self.filt_ch, 3)(mel)
        h = nn.relu(h)
        h = Conv1d(self.channels, 3)(h)
        n = Conv1d(self.filt_ch, 5)(mel)
        n = nn.relu(n)
        n = Conv1d(self.channels, 5)(n)
        gate = nn.sigmoid(h)
        return h * gate + n * (1.0 - gate)
