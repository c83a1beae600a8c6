"""Conformer layer matching the reference's simplified variant
(acoustic4/model.py:28-56): post-norm MHA (with additive pos-emb on q/k),
GLU conv module, ReLU FFN.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ttsx.nn.attention import MHSA
from ttsx.nn.conv import Conv1d


class ConformerLayer(nn.Module):
    d_model: int
    num_heads: int = 4
    ff_dim: int = 512
    kernel_size: int = 5
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray | None = None,
                 mask=None, deterministic: bool = True) -> jnp.ndarray:
        pos = pos_emb if pos_emb is not None else x
        qk = x + pos
        attn = MHSA(self.num_heads, self.dropout)(
            qk, kv=x, mask=mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm()(x)

        # conv module: conv(k) -> GLU -> 1x1 (acoustic4/model.py:32-36)
        c = Conv1d(features=2 * self.d_model, kernel_size=self.kernel_size)(x)
        a, b = jnp.split(c, 2, axis=-1)
        c = a * jax.nn.sigmoid(b)
        c = Conv1d(features=self.d_model, kernel_size=1)(c)
        x = x + c
        x = nn.LayerNorm()(x)

        f = nn.Dense(self.ff_dim)(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        f = nn.Dense(self.d_model)(f)
        x = x + nn.Dropout(self.dropout)(f, deterministic=deterministic)
        return nn.LayerNorm()(x)
