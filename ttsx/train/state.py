"""Train-state pytrees: params + optimizer + EMA + PRNG in one struct.

Replaces the reference's mutable module/optimizer/scaler/EMA bundles
(train/engine/trainer.py:129-151 checkpoint contents): everything needed
for bit-reproducible resume — including the PRNG key — lives in one
serializable pytree (SURVEY §5.4 rebuild note).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, apply_fn, params, tx, rng, ema_decay: float = 0.0):
        return cls(step=jnp.asarray(0, jnp.int32), params=params,
                   opt_state=tx.init(params),
                   ema_params=params if ema_decay > 0 else None,
                   rng=rng, tx=tx, apply_fn=apply_fn, ema_decay=ema_decay)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params,
                new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt, ema_params=new_ema)

    def next_rng(self):
        rng, sub = jax.random.split(self.rng)
        return self.replace(rng=rng), sub

    def eval_params(self, use_ema: bool = True):
        """EMA-swapped params for validation (loop.py:139-163 ema_swap)."""
        if use_ema and self.ema_params is not None:
            return self.ema_params
        return self.params
