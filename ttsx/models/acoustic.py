"""Stage 3 — acoustic model: conformer + variance adaptor + FiLM residual
stack + diffusion decoder + in-model mel discriminator.

Re-designs acoustic4/model.py:156-245 with one consistent tensor contract
(fixing the signature drift catalogued in SURVEY §2.11.4):

  forward(text_emb [B,T,Dt], prosody [B,T,18], emotion_probs [B,6],
          target_mel [B,T,80]?, speaker [B,Ds]?)
    -> AcousticOutput(mel [B,T,80], real/fake logits+features,
                      noise_pred, duration, pitch, energy)

The reference's 9-tuple return (model.py:245) is preserved as a typed struct.
Randomness (diffusion timestep + noise) comes from an explicit `rngs`
dict — no hidden torch.randint (model.py:231-233).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from ttsx.core.config import AcousticConfig
from ttsx.nn.conv import Conv1d, ConvTranspose1d
from ttsx.nn.conformer import ConformerLayer
from ttsx.nn.film import ResidualConvBlock
from ttsx.nn.embed import rotary_mix


@flax.struct.dataclass
class AcousticOutput:
    mel: jnp.ndarray                       # [B, T, 80]
    real_logits: Tuple[jnp.ndarray, ...]   # per-scale disc logits on target
    fake_logits: Tuple[jnp.ndarray, ...]
    real_features: Tuple[jnp.ndarray, ...]
    fake_features: Tuple[jnp.ndarray, ...]
    noise_pred: jnp.ndarray                # [B, T, hidden]
    duration: jnp.ndarray                  # [B, T]
    pitch: jnp.ndarray                     # [B, T]
    energy: jnp.ndarray                    # [B, T]


class EmotionEncoder(nn.Module):
    """prosody [B,T,P] + emotion [B,E] -> [B,T,H] * learnable intensity
    (acoustic4/model.py:124-142)."""
    hidden: int

    @nn.compact
    def __call__(self, prosody: jnp.ndarray, emotion: jnp.ndarray) -> jnp.ndarray:
        p = nn.relu(nn.Dense(self.hidden)(prosody))
        e = nn.relu(nn.Dense(self.hidden)(emotion))
        e = jnp.broadcast_to(e[:, None, :], p.shape)
        h = jnp.concatenate([p, e], axis=-1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        h = jax.nn.silu(nn.Dense(self.hidden)(h))
        intensity = self.param("intensity", nn.initializers.ones, (1,))
        return h * intensity


class VarianceAdaptor(nn.Module):
    """duration (softplus) / pitch / energy heads (acoustic4/model.py:58-75)."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray):
        h = jnp.concatenate([x, cond], axis=-1)
        d = nn.Dense(self.hidden)(h)
        d = nn.relu(d)
        duration = jax.nn.softplus(nn.Dense(1)(d))[..., 0]
        pitch = nn.Dense(1)(h)[..., 0]
        energy = nn.Dense(1)(h)[..., 0]
        return duration, pitch, energy


class UNetDiffusion(nn.Module):
    """1-level down/up conv U-Net with timestep embedding
    (acoustic4/model.py:77-99). x: [B, T, C]."""
    channels: int
    diffusion_steps: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        t_emb = nn.Embed(self.diffusion_steps, self.channels)(t)  # [B, C]
        h = x + t_emb[:, None, :]
        h = nn.relu(Conv1d(self.channels, 3)(h))
        h = nn.relu(Conv1d(2 * self.channels, 3, stride=2)(h))
        h = nn.relu(ConvTranspose1d(self.channels, stride=2, kernel_size=4)(h))
        h = nn.relu(Conv1d(self.channels, 3)(h))
        # guard odd-T stride-2 round trip
        return h[:, :x.shape[1], :]


class MelDiscriminator(nn.Module):
    """In-model multi-scale mel discriminator (acoustic4/model.py:101-122):
    period-average-pooled conv towers over [B, T, 80]."""
    channels: int = 80
    periods: Tuple[int, ...] = (1, 2, 3)

    @nn.compact
    def __call__(self, mel: jnp.ndarray):
        logits, features = [], []
        for p in self.periods:
            t_crop = (mel.shape[1] // p) * p
            h = mel[:, :t_crop, :].reshape(
                mel.shape[0], t_crop // p, p, self.channels).mean(axis=2)
            feat = Conv1d(self.channels // 2, 15, padding="SAME",
                          use_bias=True)(h)
            feat = nn.leaky_relu(feat, 0.1)
            logit = Conv1d(1, 15)(feat)
            logits.append(logit)
            features.append(feat)
        return tuple(logits), tuple(features)


class AcousticModel(nn.Module):
    cfg: AcousticConfig = dataclasses.field(default_factory=AcousticConfig)

    def _total_cond(self) -> int:
        cfg = self.cfg
        return cfg.cond_dim + cfg.emotion_dim + max(cfg.speaker_dim, 0)

    @nn.compact
    def __call__(
        self,
        text_emb: jnp.ndarray,                 # [B, T, text_emb_dim]
        prosody: jnp.ndarray,                  # [B, T, 18]
        emotion_probs: jnp.ndarray,            # [B, 6]
        target_mel: Optional[jnp.ndarray] = None,   # [B, T, 80]
        speaker: Optional[jnp.ndarray] = None,      # [B, speaker_dim]
        deterministic: bool = True,
    ) -> AcousticOutput:
        cfg = self.cfg
        B, T, _ = text_emb.shape

        # conditioning tensor [B, T, total_cond] (model.py:204-213)
        emo_emb = EmotionEncoder(cfg.hidden_channels)(prosody, emotion_probs)
        cond_parts = [prosody]
        if cfg.emotion_dim > 0:
            cond_parts.append(
                jnp.broadcast_to(emotion_probs[:, None, :],
                                 (B, T, cfg.emotion_dim)))
        if cfg.speaker_dim > 0:
            spk = speaker if speaker is not None else jnp.zeros(
                (B, cfg.speaker_dim), text_emb.dtype)
            cond_parts.append(jnp.broadcast_to(spk[:, None, :],
                                               (B, T, cfg.speaker_dim)))
        cond = jnp.concatenate(cond_parts, axis=-1)

        # input projection + rotary PE + conformer stack (model.py:216-220)
        x = jnp.concatenate([text_emb, emo_emb], axis=-1)
        h = Conv1d(cfg.hidden_channels, 1, use_bias=True)(x)
        h = rotary_mix(h)
        for i in range(cfg.conformer_layers):
            h = ConformerLayer(cfg.hidden_channels, cfg.attention_heads,
                               cfg.transformer_dim, cfg.kernel_size,
                               cfg.dropout, name=f"conformer_{i}")(
                h, pos_emb=h, deterministic=deterministic)

        duration, pitch, energy = VarianceAdaptor(cfg.hidden_channels)(h, cond)

        for i in range(cfg.num_layers):
            h = ResidualConvBlock(
                cfg.hidden_channels, self._total_cond(), cfg.dropout,
                cfg.kernel_size,
                sd_prob=cfg.base_sd_prob * (i + 1) / cfg.num_layers,
                ls_init=cfg.layer_scale_init,
                name=f"film_{i}")(h, cond, deterministic=deterministic)

        # diffusion decoder: noise-pred at random t AND a denoised t=0 pass
        # (model.py:230-235)
        diffusion = UNetDiffusion(cfg.hidden_channels, cfg.diffusion_steps)
        if deterministic:
            t_rand = jnp.zeros((B,), jnp.int32)
            noise = jnp.zeros_like(h)
        else:
            t_rand = jax.random.randint(
                self.make_rng("diffusion"), (B,), 0, cfg.diffusion_steps)
            noise = jax.random.normal(
                self.make_rng("diffusion"), h.shape, h.dtype)
        h_noisy = h + noise * (t_rand.astype(h.dtype)[:, None, None]
                               / cfg.diffusion_steps)
        noise_pred = diffusion(h_noisy, t_rand)
        dec = diffusion(h, jnp.zeros((B,), jnp.int32))
        mel = nn.Dense(cfg.mel_dim, name="mel_out")(dec)  # [B, T, 80]

        disc = MelDiscriminator(cfg.mel_dim)
        if target_mel is not None:
            real_logits, real_features = disc(target_mel)
        else:
            real_logits, real_features = (), ()
        fake_logits, fake_features = disc(mel)

        return AcousticOutput(
            mel=mel,
            real_logits=real_logits, fake_logits=fake_logits,
            real_features=real_features, fake_features=fake_features,
            noise_pred=noise_pred,
            duration=duration, pitch=pitch, energy=energy)
