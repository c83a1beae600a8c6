"""Stage 1 — speaker-embedding reference encoder.

Re-designs reference_encoder/encoder.py:55-151: mel [B, T, n_mels] (or a
host-extracted SSL feature sequence) -> L2-normalized speaker embedding
[B, speaker_dim]. Backbones: ecapa_tdnn (native JAX re-implementation),
res2net (conv stack, encoder.py:77-86), conformer (encoder.py:88-95),
ssl_host (projects host-provided SSL features — the wav2vec2 branch of
encoder.py:64-75 kept out of graph; SSL nets are third-party services,
SURVEY §2.9).

Pooling: self_attentive | multi_head_attentive | stats (encoder.py:106-116),
then MLP projection + BatchNorm-free norm + L2 normalize (encoder.py:119-151).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from ttsx.core.config import RefEncConfig
from ttsx.nn.conv import Conv1d
from ttsx.nn.conformer import ConformerLayer
from ttsx.nn.pooling import (
    StatsPooling, SelfAttentivePooling, MultiHeadAttentivePooling)


class Res2NetBlock(nn.Module):
    """Res2Net-style multi-scale residual block over [B, T, C]."""
    channels: int
    scale: int = 4
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.channels % self.scale == 0
        w = self.channels // self.scale
        parts = jnp.split(x, self.scale, axis=-1)
        outs = [parts[0]]
        y = None
        for i in range(1, self.scale):
            inp = parts[i] if y is None else parts[i] + y
            y = Conv1d(w, self.kernel_size, dilation=self.dilation)(inp)
            y = nn.relu(y)
            outs.append(y)
        return x + jnp.concatenate(outs, axis=-1)


class SERes2NetBlock(nn.Module):
    """ECAPA-TDNN layer: dilated Res2Net + squeeze-excitation."""
    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        y = Conv1d(self.channels, 1)(x)
        y = nn.relu(nn.LayerNorm()(y))
        y = Res2NetBlock(self.channels, scale=self.scale,
                         kernel_size=self.kernel_size,
                         dilation=self.dilation)(y)
        y = Conv1d(self.channels, 1)(y)
        y = nn.relu(nn.LayerNorm()(y))
        # squeeze-excitation
        if mask is not None:
            m = mask[..., None].astype(y.dtype)
            s = jnp.sum(y * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        else:
            s = jnp.mean(y, axis=1)
        s = nn.relu(nn.Dense(self.channels // 4)(s))
        s = nn.sigmoid(nn.Dense(self.channels)(s))
        return x + y * s[:, None, :]


class ReferenceEncoder(nn.Module):
    """mel or feature sequence [B, T, F] -> unit-norm embedding [B, D]."""
    cfg: RefEncConfig = dataclasses.field(default_factory=RefEncConfig)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        D = cfg.speaker_dim

        if mask is not None:
            # zero padded frames so conv receptive fields can't leak them
            x = x * mask[..., None].astype(x.dtype)

        if cfg.backbone == "ecapa_tdnn":
            ch = cfg.ecapa_channels
            h = Conv1d(ch, 5)(x)
            h = nn.relu(nn.LayerNorm()(h))
            h1 = SERes2NetBlock(ch, 3, dilation=2)(h, mask)
            h2 = SERes2NetBlock(ch, 3, dilation=3)(h1, mask)
            h3 = SERes2NetBlock(ch, 3, dilation=4)(h2, mask)
            # multi-layer feature aggregation (ECAPA MFA)
            h = jnp.concatenate([h1, h2, h3], axis=-1)
            h = Conv1d(D, 1)(h)
            h = nn.relu(h)
        elif cfg.backbone == "res2net":
            # conv stem -> Res2Net -> project (encoder.py:80-86)
            h = Conv1d(64, 3)(x)
            h = nn.relu(nn.LayerNorm()(h))
            h = Res2NetBlock(64, scale=4)(h)
            h = Conv1d(D, 1)(h)
        elif cfg.backbone == "conformer":
            h = nn.Dense(D)(x)
            for _ in range(cfg.conformer_layers):
                h = ConformerLayer(D, cfg.conformer_heads, cfg.conformer_ff,
                                   dropout=cfg.dropout)(
                    h, mask=None, deterministic=deterministic)
        elif cfg.backbone == "ssl_host":
            # host service provides SSL features; project + mean-pool
            # (encoder.py:74-75,130-139 without the CPU round-trip)
            h = nn.Dense(D)(x)
        else:
            raise ValueError(f"Unknown backbone '{cfg.backbone}'")

        # pooling
        if cfg.pooling == "self_attentive":
            e = SelfAttentivePooling()(h, mask)
        elif cfg.pooling == "multi_head_attentive":
            e = MultiHeadAttentivePooling(D, heads=cfg.pooling_heads)(h, mask)
        else:
            e = StatsPooling()(h, mask)
            e = nn.Dense(D)(e)

        # final projection MLP (encoder.py:119-124); LayerNorm replaces
        # BatchNorm1d — batch-stat-free is jit/pjit friendly.
        e = nn.Dense(D)(e)
        e = nn.LayerNorm()(e)
        e = nn.relu(e)
        e = nn.Dense(D)(e)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)
