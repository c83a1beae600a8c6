"""End-to-end synthesis: text -> mel0 -> refined mel -> style -> waveform.

The reference has NO standalone synthesize() entry point (SURVEY §3.4
assembles it from trainer validation paths); this module defines it as a
first-class jittable function over the five stages' params:

  acoustic -> refiner (single-shot or SDE sampled) -> GST -> generator

mel0 is passed to the refiner instead of re-running the acoustic model
inside it (fixing the double-acoustic inefficiency of
sde_refiner5/model.py:47,170-173).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.struct

from ttsx.core.config import TTSXConfig
from ttsx.models.acoustic import AcousticModel
from ttsx.models.refiner import ScoreSDERefiner, sde_sample
from ttsx.models.vocoder import Generator
from ttsx.nn.gst import GlobalStyleTokens


@flax.struct.dataclass
class SynthesisOutput:
    wav: jnp.ndarray        # [B, T*hop, 1]
    mel0: jnp.ndarray       # [B, T, 80] coarse
    mel_ref: jnp.ndarray    # [B, T, 80] refined
    duration: jnp.ndarray   # [B, T]
    pitch: jnp.ndarray      # [B, T]


class TTSPipeline:
    """Bundles the four synthesis modules with one config tree."""

    def __init__(self, cfg: TTSXConfig | None = None):
        self.cfg = cfg or TTSXConfig()
        self.acoustic = AcousticModel(self.cfg.acoustic)
        self.refiner = ScoreSDERefiner(self.cfg.refiner)
        self.gst = GlobalStyleTokens(self.cfg.vocoder.channels,
                                     self.cfg.vocoder.style_dim,
                                     self.cfg.vocoder.num_style_tokens)
        self.generator = Generator(self.cfg.vocoder)

    def init_params(self, rng: jax.Array, batch: int = 1, frames: int = 128):
        cfg = self.cfg
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        text = jnp.zeros((batch, frames, cfg.acoustic.text_emb_dim))
        pros = jnp.zeros((batch, frames, 18))
        emo = jnp.zeros((batch, 6))
        spk = jnp.zeros((batch, cfg.acoustic.speaker_dim))
        mel = jnp.zeros((batch, frames, 80))
        sid = jnp.zeros((batch,), jnp.int32)
        style = jnp.zeros((batch, cfg.vocoder.style_dim))
        # each init is jitted: ONE compiled program per module instead of
        # hundreds of eager op dispatches (critical on remote-TPU backends
        # where every eager op pays a compile+dispatch round trip)
        return {
            "acoustic": jax.jit(
                lambda r: self.acoustic.init(r, text, pros, emo,
                                             speaker=spk))(r1),
            "refiner": jax.jit(
                lambda r: self.refiner.init(r, mel, pros, sid, text))(r2),
            "gst": jax.jit(lambda r: self.gst.init(r, mel))(r3),
            "generator": jax.jit(
                lambda r: self.generator.init(r, mel, pros, style, emo))(r4),
        }

    def synthesize(self, params, text_emb, prosody, emotion_probs, speaker,
                   style_id, rng: Optional[jax.Array] = None,
                   use_sde: bool = False,
                   scale: Optional[jnp.ndarray] = None) -> SynthesisOutput:
        """Full forward. jit-compatible (use_sde static).

        `scale` is the [B, 2*channels] absolute-scale conditioning for
        scale_cond generators (train-corpus mean stats at text->wav
        serving — see ttsx/serve.py)."""
        ac = self.acoustic.apply(params["acoustic"], text_emb, prosody,
                                 emotion_probs, speaker=speaker,
                                 deterministic=True)
        if use_sde:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            mel_ref = sde_sample(self.refiner, params["refiner"], ac.mel,
                                 prosody, style_id, text_emb, rng)
        else:
            ref = self.refiner.apply(params["refiner"], ac.mel, prosody,
                                     style_id, text_emb, deterministic=True)
            mel_ref = ref.mel_ref
        style = self.gst.apply(params["gst"], mel_ref)
        wav = self.generator.apply(params["generator"], mel_ref, prosody,
                                   style, emotion_probs, scale=scale)
        return SynthesisOutput(wav=wav, mel0=ac.mel, mel_ref=mel_ref,
                               duration=ac.duration, pitch=ac.pitch)
