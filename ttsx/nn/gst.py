"""Global Style Tokens (reference: vocoder7/gst.py:8-36)."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ttsx.nn.conv import Conv1d


class GlobalStyleTokens(nn.Module):
    """mel: [B, T, channels] -> style [B, style_dim]."""
    channels: int = 80
    style_dim: int = 128
    num_tokens: int = 10

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        tokens = self.param("tokens", nn.initializers.normal(1.0),
                            (self.num_tokens, self.style_dim))
        h = Conv1d(self.style_dim, kernel_size=3)(mel)
        h = nn.relu(h)
        logits = Conv1d(self.num_tokens, kernel_size=1)(h)  # [B, T, n_tok]
        weights = nn.softmax(logits, axis=1)                # attend over T
        return jnp.einsum("btn,nd->bd", weights, tokens)
