"""Vector quantization: single-layer VQ with straight-through estimator and
a chained hierarchical variant (reference: sde_refiner5/blocks/hier_vq.py).

The nearest-neighbor search is expressed as one dense distance matmul —
codebooks are small (<=512 x 80), so a single [B*T, codes] MXU matmul is the
speed-of-light formulation on TPU (vs. FAISS-style ANN on GPU).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class VectorQuantizer(nn.Module):
    """x: [B, T, C] -> (quantized [B, T, C], loss scalar)."""
    dim: int
    num_codes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.num_codes),
            (self.num_codes, self.dim))
        # uniform(-1/K, 1/K) like the reference init (hier_vq.py:16)
        codebook = codebook - 1.0 / self.num_codes

        b, t, c = x.shape
        flat = x.reshape(-1, c).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        dist = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            - 2.0 * flat @ cb.T
            + jnp.sum(cb ** 2, axis=1)[None, :]
        )
        idx = jnp.argmin(dist, axis=1)
        quant = cb[idx].reshape(b, t, c).astype(x.dtype)

        commit = jnp.mean((jax.lax.stop_gradient(quant) - x) ** 2)
        codebook_loss = jnp.mean((quant - jax.lax.stop_gradient(x)) ** 2)
        loss = commit + codebook_loss
        quantized = x + jax.lax.stop_gradient(quant - x)
        return quantized, loss


class HierVQ(nn.Module):
    """Chained VQ layers (sde_refiner5/blocks/hier_vq.py:41-58)."""
    dims: Sequence[int]
    codes: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert len(self.dims) == len(self.codes)
        total = jnp.asarray(0.0, jnp.float32)
        out = x
        for d, k in zip(self.dims, self.codes):
            out, loss = VectorQuantizer(d, k)(out)
            total = total + loss
        return out, total
