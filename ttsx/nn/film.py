"""FiLM-conditioned residual conv block, ScaleNorm, and stochastic depth.

Reference: acoustic4/blocks.py:8-71.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ttsx.nn.conv import Conv1d


class ScaleNorm(nn.Module):
    """Normalize to unit L2 norm along channels, scale by learnable gain."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), self.eps)
        return x * (g / norm)


def stochastic_depth(x: jnp.ndarray, p: float, rng, deterministic: bool):
    """Per-sample residual-branch drop (acoustic4/blocks.py:8-13)."""
    if deterministic or p <= 0.0:
        return x
    keep = 1.0 - p
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype) / keep
    return x * mask


class ResidualConvBlock(nn.Module):
    """ScaleNorm -> causal depthwise+pointwise conv -> ScaleNorm+SiLU ->
    FiLM(cond) -> dropout -> LayerScale -> stochastic depth -> residual.

    x: [B, T, C]; cond: [B, T, cond_dim].
    """
    channels: int
    cond_dim: int
    dropout: float = 0.1
    kernel_size: int = 5
    sd_prob: float = 0.0
    ls_init: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        res = x
        y = ScaleNorm()(x)
        y = Conv1d(self.channels, self.kernel_size, groups=self.channels,
                   padding="CAUSAL")(y)
        y = Conv1d(self.channels, 1)(y)
        y = ScaleNorm()(y)
        y = jax.nn.silu(y)
        film = nn.Dense(self.channels)(cond)
        film = jax.nn.silu(film)
        film = nn.Dense(2 * self.channels)(film)
        scale, shift = jnp.split(film, 2, axis=-1)
        y = y * (1.0 + scale) + shift
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.ls_init),
                           (self.channels,))
        y = gamma * y
        if not deterministic and self.sd_prob > 0.0:
            y = stochastic_depth(y, self.sd_prob,
                                 self.make_rng("dropout"), deterministic)
        return res + y
