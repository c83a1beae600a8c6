"""Batched synthesis serving + in-graph voice transform.

BASELINE.json config #5: "full observer pipeline: text->waveform with
sde_refiner5 sampling, batched over ICI" and the north-star's
"observer-class voice transform applied in-graph".

SynthesisServer: pads incoming requests to a fixed (B, T) bucket, shards
the batch over the dp mesh axis, and runs the four-stage pipeline; the
whole service loop is host-side, every compute op is jitted + sharded.

voice_transform: source wav -> mel (frontend) -> prosody (S4 predictor) ->
refiner conditioned on the TARGET style/speaker -> vocoder with the target
GST style — one jittable graph, no host round-trips between stages.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ttsx.core.config import TTSXConfig
from ttsx.models.pipeline import TTSPipeline


@dataclass
class SynthesisRequest:
    text_emb: np.ndarray       # [T, D]
    prosody: np.ndarray        # [T, 18]
    emotion_probs: np.ndarray  # [6]
    speaker: np.ndarray        # [Ds]
    style_id: int


class SynthesisServer:
    """Fixed-bucket batching server over a dp mesh."""

    def __init__(self, cfg: TTSXConfig, params, mesh=None,
                 max_batch: int = 8, frames: int = 512,
                 bf16: bool = True, chain: bool = True,
                 loudness_peak: Optional[float] = None,
                 scale_stats: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.pipe = TTSPipeline(cfg)
        # scale_cond generators condition on per-utterance raw-mel
        # [mean || std] stats. A text->wav server has no target utterance
        # to take them from, and the zeros fallback is far out of
        # distribution (training log-mel mean ~-3, std ~1.7) — require
        # the train-corpus mean vector (slim-export meta `mel_scale_mean`
        # carries it) instead of silently degrading output.
        if cfg.vocoder.scale_cond:
            if scale_stats is None:
                raise ValueError(
                    "cfg.vocoder.scale_cond is on: pass scale_stats "
                    "([2*channels] train-corpus mean mel [mean||std], "
                    "e.g. the slim export's `mel_scale_mean` meta)")
            scale_stats = np.asarray(scale_stats, np.float32).reshape(-1)
        self.scale_stats = scale_stats
        # bf16 halves activation HBM — at B=4 x 10 s the f32 generator
        # activations OOM a v5e chip; bf16 runs 200x realtime (round-1
        # measurement, see PARITY.md)
        if bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        self.dtype = jnp.bfloat16 if bf16 else jnp.float32
        self.params = params
        self.max_batch = max_batch
        self.frames = frames
        self.mesh = mesh
        # chain=True compiles the pipeline as THREE programs
        # (acoustic | refiner | gst+generator) chained on host, like
        # bench.py: the single fused graph is pathologically slow to
        # compile on the remote-TPU service (>25 min at serving shapes)
        # while per-stage graphs compile in seconds, and async dispatch
        # pipelines the chain with no RTF loss.
        self.chain = chain
        # opt-in output loudness target: the generator's conditioning has
        # no absolute-scale cue (normalized mel, z-scored energy, c0-less
        # cepstra), so trained generators sit at ~0.7x reference RMS;
        # peak-normalizing each utterance to `loudness_peak` is the
        # serving-side answer (eval keeps raw output; see
        # parity_common.mel_energy_gain for the input-mel-derived gain
        # used when an absolute-scale mel IS available)
        self.loudness_peak = loudness_peak
        if chain:
            self._ac_fn = jax.jit(
                lambda p, t, pr, e, s: self.pipe.acoustic.apply(
                    p, t, pr, e, speaker=s, deterministic=True).mel)
            self._rf_fn = jax.jit(
                lambda p, m, pr, sid, t: self.pipe.refiner.apply(
                    p, m, pr, sid, t, deterministic=True).mel_ref)

            def _gg(pg, pgen, m, pr, e):
                style = self.pipe.gst.apply(pg, m)
                scale = None
                if self.scale_stats is not None:
                    scale = jnp.broadcast_to(
                        jnp.asarray(self.scale_stats, m.dtype),
                        (m.shape[0], self.scale_stats.shape[0]))
                return self.pipe.generator.apply(pgen, m, pr, style, e,
                                                 scale=scale)

            self._gg_fn = jax.jit(_gg)
        else:
            self._fn = jax.jit(self._synth)
        if mesh is not None:
            from ttsx.parallel import replicate
            self.params = replicate(self.params, mesh)

    def _synth(self, params, text, pros, emo, spk, sid):
        scale = None
        if self.scale_stats is not None:
            scale = jnp.broadcast_to(
                jnp.asarray(self.scale_stats, text.dtype),
                (text.shape[0], self.scale_stats.shape[0]))
        out = self.pipe.synthesize(params, text, pros, emo, spk, sid,
                                   use_sde=False, scale=scale)
        return out.wav

    def _run(self, text, pros, emo, spk, sid):
        if not self.chain:
            return self._fn(self.params, text, pros, emo, spk, sid)
        p = self.params
        mel0 = self._ac_fn(p["acoustic"], text, pros, emo, spk)
        mel_ref = self._rf_fn(p["refiner"], mel0, pros, sid, text)
        return self._gg_fn(p["gst"], p["generator"], mel_ref, pros, emo)

    def _pad_batch(self, reqs: Sequence[SynthesisRequest]):
        B, T = self.max_batch, self.frames
        cfg = self.cfg
        text = np.zeros((B, T, cfg.acoustic.text_emb_dim), np.float32)
        pros = np.zeros((B, T, 18), np.float32)
        emo = np.full((B, 6), 1 / 6, np.float32)
        spk = np.zeros((B, cfg.acoustic.speaker_dim), np.float32)
        sid = np.zeros((B,), np.int32)
        lens = np.zeros(B, np.int32)
        for i, r in enumerate(reqs[:B]):
            t = min(len(r.text_emb), T)
            text[i, :t] = r.text_emb[:t]
            pros[i, :t] = r.prosody[:t]
            emo[i] = r.emotion_probs
            spk[i] = r.speaker
            sid[i] = r.style_id
            lens[i] = t
        return text, pros, emo, spk, sid, lens

    def serve_batch(self, reqs: Sequence[SynthesisRequest]) -> List[np.ndarray]:
        if len(reqs) > self.max_batch:
            # split into max_batch buckets so no request is silently dropped
            out: List[np.ndarray] = []
            for i in range(0, len(reqs), self.max_batch):
                out.extend(self.serve_batch(reqs[i:i + self.max_batch]))
            return out
        text, pros, emo, spk, sid, lens = self._pad_batch(reqs)
        arrays = [jnp.asarray(x, self.dtype)
                  for x in (text, pros, emo, spk)] + [jnp.asarray(sid)]
        if self.mesh is not None:
            from ttsx.parallel import shard_batch_dp
            with self.mesh:
                arrays = [shard_batch_dp(a, self.mesh) for a in arrays]
                wav = self._run(*arrays)
        else:
            wav = self._run(*arrays)
        wav = np.asarray(wav)
        hop = self.cfg.vocoder.hop_length
        outs = [wav[i, : int(lens[i]) * hop, 0].astype(np.float32)
                for i in range(len(reqs))]
        if self.loudness_peak is not None:
            outs = [w * (self.loudness_peak / max(float(np.abs(w).max()),
                                                  1e-8)) for w in outs]
        return outs


def make_voice_transform(cfg: TTSXConfig, pipe: Optional[TTSPipeline] = None,
                         prosody_model=None, prosody_params=None):
    """Returns a jittable fn(params, mel_src, prosody_src, style_id_tgt,
    ref_mel_tgt) -> wav: re-voices source content with the target style
    embedding (style_id_tgt) and the target timbre captured from
    ref_mel_tgt via GST, entirely in-graph."""
    pipe = pipe or TTSPipeline(cfg)

    def fn(params, mel_src, prosody_src, style_id_tgt, ref_mel_tgt):
        ref = pipe.refiner.apply(
            params["refiner"], mel_src, prosody_src, style_id_tgt,
            jnp.zeros((mel_src.shape[0], mel_src.shape[1],
                       cfg.acoustic.text_emb_dim), mel_src.dtype),
            deterministic=True)
        style = pipe.gst.apply(params["gst"], ref_mel_tgt)  # target timbre
        emo = jnp.full((mel_src.shape[0], 6), 1.0 / 6.0, mel_src.dtype)
        return pipe.generator.apply(params["generator"], ref.mel_ref,
                                    prosody_src, style, emo)

    return fn
