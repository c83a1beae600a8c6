"""Style-conditioned Gumbel-softmax mixture-of-experts
(reference: sde_refiner5/blocks/gumbel_moe.py).

The reference computes all experts densely and blends with soft gates —
no all-to-all needed (SURVEY §2.10 EP row). On TPU we keep that dense
formulation but fold the E experts into a single batched matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class GumbelMoE(nn.Module):
    """x: [B, T, D_in], style: [B, style_dim] -> [B, T, D_out]."""
    input_dim: int
    output_dim: int
    num_experts: int = 4
    style_dim: int = 128
    dropout: float = 0.1
    tau: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        e = self.num_experts
        w = self.param("experts_w", nn.initializers.lecun_normal(),
                       (e, self.input_dim, self.output_dim))
        b = self.param("experts_b", nn.initializers.zeros, (e, self.output_dim))

        gate_logits = nn.Dense(e, name="gate")(style)  # [B, E]
        if deterministic:
            gates = jax.nn.softmax(gate_logits / self.tau, axis=-1)
        else:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("gumbel"),
                                   gate_logits.shape, minval=1e-20, maxval=1.0)))
            gates = jax.nn.softmax((gate_logits + g) / self.tau, axis=-1)
        gates = nn.Dropout(self.dropout)(gates, deterministic=deterministic)

        # blend expert weights per batch element, then one matmul:
        # [B, D_in, D_out] = sum_e gates[b,e] * w[e]
        w_mix = jnp.einsum("be,eio->bio", gates, w)
        b_mix = jnp.einsum("be,eo->bo", gates, b)
        return jnp.einsum("bti,bio->bto", x, w_mix) + b_mix[:, None, :]
