"""Stage 4 — score-SDE mel refiner with band-split U-Net and external
Euler–Maruyama sampler.

Re-designs sde_refiner5/model.py:33-306 + refiner.py:27-162, with two fixes
the survey calls for:
  * takes the coarse mel `mel0` as an input instead of embedding a second
    AcousticModel (eliminating the double-acoustic compute of SURVEY §3.4);
    a compatibility wrapper that runs the acoustic model is in
    ttsx/models/pipeline.py.
  * implements the SDE sampling loop the reference defers
    (model.py:196-198) as one jax.lax.scan of fused Euler–Maruyama steps.

Per-band stacks follow model.py:107-124: [RevBlock(S4), RevBlock(MoE),
TFBlock] x levels going down (ch x2 per level), a bottleneck S4, then
[ConvTranspose-up, TFBlock, S4] x levels coming up. "RevBlock" memory
recompute is jax.checkpoint (remat) — the TPU-native equivalent of
torch.utils.checkpoint (blocks/revblock.py:28).

Note the reference's per-band stack mixes ConvTranspose1d(stride 2) ups with
no matching downsampling in time (channel growth only) — we keep time
resolution constant (stride-1 refinement) and grow/shrink channels, which is
the only self-consistent reading of model.py:107-124.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from ttsx.core.config import RefinerConfig
from ttsx.nn.s4 import S4
from ttsx.nn.conv import Conv1d
from ttsx.nn.moe import GumbelMoE
from ttsx.nn.tf_block import TFBlock, HSFLayer
from ttsx.nn.vq import HierVQ
from ttsx.nn.embed import sinusoidal_table


@flax.struct.dataclass
class RefinerOutput:
    mel_ref: jnp.ndarray    # [B, T, 80] refined mel (continuous path)
    t: jnp.ndarray          # [B, 1]
    vq_loss: jnp.ndarray    # scalar
    score: jnp.ndarray      # [B, T, 80] refinement residual (score estimate)
    mel_vq: jnp.ndarray     # [B, T, 80] discrete-code reconstruction


class BetaScheduler(nn.Module):
    """Learnable beta(t) MLP (sde_refiner5/scheduler.py:4-26)."""
    hidden: int = 64

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden)(t)
        h = nn.gelu(h)
        return nn.sigmoid(nn.Dense(1)(h))


class BandNet(nn.Module):
    """Per-band refinement U-stack over [B, T, band+cond]."""
    cfg: RefinerConfig
    band_size: int

    @nn.compact
    def __call__(self, y: jnp.ndarray, cond: jnp.ndarray, style: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        ch = y.shape[-1]
        band_in = y
        # memory recompute (RevBlock equivalent) is applied at the train-step
        # level via jax.checkpoint policies rather than per-block here.

        # down path: channel growth x2 per level (model.py:112-116)
        skips = []
        for lvl in range(cfg.levels):
            y = S4(ch, cfg.s4, name=f"down_s4_{lvl}")(y, deterministic)
            y = GumbelMoE(ch, 2 * ch, style_dim=cfg.style_dim,
                          name=f"down_moe_{lvl}")(y, style,
                                                  deterministic=deterministic)
            ch *= 2
            y = TFBlock(ch, heads=cfg.s4.heads, dim_ff=cfg.cond_dim,
                        name=f"down_tf_{lvl}")(y, deterministic=deterministic)
            skips.append(y)

        y = S4(ch, cfg.s4, name="mid_s4")(y, deterministic)

        # up path: channel shrink /2 per level with U-Net long skips —
        # without them the normalization-heavy stack cannot carry the
        # input band to the output and training collapses the correction
        # to an input-independent constant (measured: d(score)/d(mel0)
        # ~ 1e-6 after 300 steps, i.e. the refiner learns to do nothing)
        for lvl in range(cfg.levels):
            y = nn.Dense(ch // 2, name=f"up_proj_{lvl}")(y)
            ch //= 2
            y = y + nn.Dense(ch, name=f"skip_proj_{lvl}")(
                skips[cfg.levels - 1 - lvl])
            y = TFBlock(ch, heads=cfg.s4.heads, dim_ff=cfg.cond_dim,
                        name=f"up_tf_{lvl}")(y, deterministic=deterministic)
            y = S4(ch, cfg.s4, name=f"up_s4_{lvl}")(y, deterministic)

        # the raw band rides straight into the output conv (longest skip):
        # "-identity + memorized structure" must be representable by ONE
        # linear layer for denoising to be learnable. zero-init: each
        # band's correction starts at exactly 0, making the whole refiner
        # identity at init (see ScoreSDERefiner below).
        y = jnp.concatenate([y, band_in], axis=-1)
        return Conv1d(self.band_size, 3, zero_init=True,
                      name="band_out")(y)


class ScoreSDERefiner(nn.Module):
    """Coarse mel -> refined mel.

    __call__(mel0 [B,T,80], prosody [B,T,18], style_id [B],
             text_emb [B,T,Dt], t [B,1]?) -> RefinerOutput
    """
    cfg: RefinerConfig = dataclasses.field(default_factory=RefinerConfig)

    @nn.compact
    def __call__(
        self,
        mel0: jnp.ndarray,
        prosody: jnp.ndarray,
        style_id: jnp.ndarray,
        text_emb: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> RefinerOutput:
        cfg = self.cfg
        B, T, C = mel0.shape
        assert C == cfg.cnf_dim

        # diffusion time + learnable beta (model.py:175-198); noise injection
        # itself lives in `sde_sample` below.
        if t is None:
            if deterministic:
                t = jnp.full((B, 1), 0.5, mel0.dtype)
            else:
                t = jax.random.uniform(self.make_rng("sde"), (B, 1),
                                       mel0.dtype)
        beta = BetaScheduler(cfg.beta_hidden)(t)  # [B, 1]

        # conditioning (model.py:291-296)
        c_pros = nn.Dense(cfg.cond_dim // 2)(prosody)
        c_pros = jax.nn.silu(c_pros)
        c_pros = nn.Dense(cfg.cond_dim)(c_pros)
        style = nn.Embed(cfg.num_styles, cfg.style_dim,
                         name="style_embedding")(style_id)      # [B, style]
        c_sty = nn.Dense(cfg.cond_dim, name="style_proj")(style)[:, None]
        c_seg = nn.Dense(cfg.cond_dim, name="seg_proj")(
            jnp.mean(text_emb, axis=1))[:, None]
        cond = c_pros + c_sty + c_seg                            # [B, T, cond]

        # band-wise refine (model.py:200-225): per-band freq-PE projected
        # and concatenated, then the band U-stack.
        pe = jnp.asarray(sinusoidal_table(cfg.cnf_dim, cfg.cond_dim),
                         mel0.dtype)  # [80, cond]
        outs = []
        offset = 0
        for i, bsz in enumerate(cfg.bands):
            band = mel0[..., offset:offset + bsz]
            pe_band = pe[offset:offset + bsz].reshape(-1)  # [bsz*cond]
            pe_tok = nn.Dense(cfg.cond_dim, name=f"pe_proj_{i}")(pe_band)
            pe_seq = jnp.broadcast_to(pe_tok[None, None, :],
                                      (B, T, cfg.cond_dim))
            y = jnp.concatenate([band, pe_seq + cond], axis=-1)
            y = BandNet(cfg, bsz, name=f"band_{i}")(
                y, cond, style, deterministic=deterministic)
            outs.append(y)
            offset += bsz
        merged = jnp.concatenate(outs, axis=-1)  # [B, T, 80]

        # HSF residual scaled by beta (model.py:227-246), as a CORRECTION
        # field: mel_ref = mel0 + delta. The reference instead emits the
        # full signal through HierVQ (model.py:243-246) — but a denoising
        # correction is near-white, and white noise through a codebook is
        # floored at the codebook's (large) quantization error, so a
        # VQ-in-the-loop refiner can never beat its own input under SDE
        # sampling (measured: the score collapses to 0 and MCD lands at
        # the random-weights level). The SDE/score path is therefore
        # CONTINUOUS, and the HierVQ rides in parallel as the discrete-
        # code head (`mel_vq`): same codebooks, same hierarchy, usable as
        # a codec, out of the denoising loop. The refiner is exactly
        # identity at init (band output convs are zero-initialized —
        # Conv1d zero_init keeps full kernel gradients), so an untrained
        # refiner passes the acoustic mel through unchanged and training
        # can only improve on it.
        hn = HSFLayer(cfg.cnf_dim, cfg.hsf_hidden, cfg.hsf_layers,
                      cfg.hsf_kernel, name="hsf")(merged)
        delta = merged + beta[:, :, None] * hn
        mel_ref = mel0 + delta
        # EMA codebook updates run only on training passes (the caller
        # applies with mutable=["vq_stats"] — ttsx/nn/vq.py)
        dq, vql = HierVQ(cfg.vq_dims, cfg.vq_codes, name="vq")(
            delta, train=not deterministic)

        return RefinerOutput(mel_ref=mel_ref, t=t, vq_loss=vql,
                             score=delta, mel_vq=mel0 + dq)


def sde_sample(refiner: ScoreSDERefiner, params, mel0: jnp.ndarray,
               prosody: jnp.ndarray, style_id: jnp.ndarray,
               text_emb: jnp.ndarray, rng: jax.Array,
               steps: int | None = None) -> jnp.ndarray:
    """Euler–Maruyama reverse-SDE sampling as one lax.scan of fused steps.

    The reference explicitly defers noise injection to "an external SDE
    sampling loop" that never exists in the repo (sde_refiner5/model.py:196-198);
    this is that loop, TPU-native: x_{k+1} = x_k + dt*score(x_k, t_k)
    + sigma*sqrt(beta_k*dt)*eps. All `steps` refiner evaluations compile
    into a single scanned XLA while-body.
    """
    cfg = refiner.cfg
    steps = steps or cfg.sde_steps
    dt = 1.0 / steps
    B = mel0.shape[0]

    def step(carry, inp):
        x, k = carry
        eps_rng = inp
        t = jnp.full((B, 1), 1.0 - k.astype(mel0.dtype) * dt, mel0.dtype)
        out = refiner.apply(params, x, prosody, style_id, text_emb, t=t,
                            deterministic=True)
        noise = jax.random.normal(eps_rng, x.shape, x.dtype)
        x = x + dt * out.score + cfg.sde_sigma * jnp.sqrt(dt) * noise * (
            1.0 - (k + 1) * dt)  # anneal noise to zero at the last step
        return (x, k + 1), None

    rngs = jax.random.split(rng, steps)
    (x, _), _ = jax.lax.scan(step, (mel0, jnp.array(0, jnp.int32)), rngs)
    return x
