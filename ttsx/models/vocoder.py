"""Stage 5 — BigVGAN-style multi-band GAN vocoder.

Re-designs vocoder7/: Generator (generator.py:9-98) with the missing
ResidualBlock/SelfAttention (generator.py:6-7) reconstructed as
HiFi-GAN/BigVGAN-standard FiLM-conditioned dilated MRF blocks and a
mid-stack non-local attention (SURVEY §7 step 2 design note); MPD/MSD/MBD
discriminators (discriminators.py); LearnableSTFT multi-resolution loss
(stft.py:9-54); GST lives in ttsx/nn/gst.py.

TPU design: everything is [B, T, C] channels-last; the ConvTranspose
upsampling + residual stacks lower to MXU matmuls; per-band towers share
one vmapped parameter set instead of a Python list of modules — the bands
dimension is folded into the batch, which keeps the MXU fed with one big
matmul instead of `num_bands` small ones.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ttsx.core.config import VocoderConfig
from ttsx.nn.conv import Conv1d, ConvTranspose1d, SNConv, avg_pool1d
from ttsx.nn.attention import SelfAttention1d


class _ConvKB(nn.Module):
    """kernel/bias params matching nn.Conv's tree."""
    k: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.k, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return w, b


class _ConvParamHolder(nn.Module):
    """Mirrors Conv1d's param tree ('<name>/Conv_0/{kernel,bias}') so the
    fused-kernel path stays checkpoint-compatible with the XLA path."""
    k: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return _ConvKB(self.k, self.cin, self.cout, name="Conv_0")()


class FiLMResidualBlock(nn.Module):
    """Dilated conv residual block with GLU + FiLM conditioning
    (reconstruction of the missing vocoder7/residual.py; call site
    generator.py:39-41 `ResidualBlock(ch, dilation, cond_dim)`)."""
    channels: int
    dilation: int
    cond_dim: int
    kernel_size: int = 3
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        # cond: [B, Tc, cond_dim] at mel rate; nearest-upsample to x's rate
        B, T, C = x.shape
        Tc = cond.shape[1]
        if Tc != T:
            idx = jnp.clip((jnp.arange(T) * Tc) // T, 0, Tc - 1)
            cond = cond[:, idx, :]
        # zero-init FiLM projection: every block starts as identity
        # modulation (scale=shift=0), so activation variance cannot
        # compound across the 12-block stack at init — with lecun init
        # and real prosody conditioning the pre-tanh std measured 4.5e3
        # (99.8% tanh saturation = square-wave output, dead gradients)
        film = nn.Dense(2 * self.channels,
                        kernel_init=nn.initializers.zeros)(cond)
        scale, shift = jnp.split(film, 2, axis=-1)

        if self.use_pallas and self.kernel_size == 3:
            # whole block fused in VMEM (ttsx/ops/resblock_kernel.py);
            # identical param tree (Conv1d_*/Conv_0/{kernel,bias}), so
            # checkpoints swap freely with the XLA path
            w1, b1 = _ConvParamHolder(3, C, 2 * self.channels,
                                      name="Conv1d_0")()
            w2, b2 = _ConvParamHolder(3, self.channels, self.channels,
                                      name="Conv1d_1")()
            from ttsx.ops.resblock_kernel import film_resblock_pallas
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
            return film_resblock_pallas(x, scale, shift, w1, b1, w2, b2,
                                        self.dilation,
                                        interpret=interpret)

        y = nn.leaky_relu(x, 0.1)
        y = Conv1d(2 * self.channels, self.kernel_size,
                   dilation=self.dilation, name="Conv1d_0")(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)                 # GLU
        y = y * (1.0 + scale) + shift             # FiLM
        y = nn.leaky_relu(y, 0.1)
        y = Conv1d(self.channels, self.kernel_size, name="Conv1d_1")(y)
        return x + y


class _StackBlockShell(nn.Module):
    """Declares one FiLMResidualBlock's exact param tree (Dense_0 film +
    Conv1d_0/Conv1d_1 holders) and returns film + raw conv weights for
    the fused stage-resident kernel — checkpoints swap freely between
    the fused and XLA paths."""
    channels: int

    @nn.compact
    def __call__(self, cond):
        film = nn.Dense(2 * self.channels,
                        kernel_init=nn.initializers.zeros)(cond)
        w1, b1 = _ConvParamHolder(3, self.channels, 2 * self.channels,
                                  name="Conv1d_0")()
        w2, b2 = _ConvParamHolder(3, self.channels, self.channels,
                                  name="Conv1d_1")()
        return film, w1, b1, w2, b2


class BandTower(nn.Module):
    """One band's upsampling tower; vmapped over bands in Generator."""
    cfg: VocoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ch = cfg.hidden_dim
        for i, factor in enumerate(cfg.upsample_factors):
            if cfg.use_pallas_upsample:
                from ttsx.nn.conv import PallasUpsample
                x = PallasUpsample(ch // 2, stride=factor,
                                   name=f"up_{i}")(x)
            else:
                x = ConvTranspose1d(ch // 2, stride=factor,
                                    kernel_size=2 * factor,
                                    name=f"up_{i}")(x)
            ch //= 2
            if cfg.use_pallas_resblock_stack:
                # round-3 stage-resident fusion: all blocks of this
                # stage in one VMEM-resident pallas_call (round 1's
                # PER-BLOCK fusion lost 2.3x to overlapping-window HBM
                # materialization; this one tiles without overlap)
                x = self._fused_stage(x, cond, ch, i)
            else:
                Block = (nn.remat(FiLMResidualBlock) if cfg.remat
                         else FiLMResidualBlock)
                for j, dil in enumerate(cfg.res_dilations):
                    x = Block(ch, dil, cfg.cond_dim,
                              name=f"res_{i}_{j}")(x, cond)
            if i == len(cfg.upsample_factors) // 2:
                x = SelfAttention1d(ch, name=f"attn_{i}")(x)
        return x

    def _fused_stage(self, x, cond, ch, i):
        from ttsx.ops.resblock_stack_kernel import (
            film_resblock_stack_pallas)
        films, w1s, b1s, w2s, b2s = [], [], [], [], []
        for j, _dil in enumerate(self.cfg.res_dilations):
            film, w1, b1, w2, b2 = _StackBlockShell(
                ch, name=f"res_{i}_{j}")(cond)
            films.append(film)
            w1s.append(w1)
            b1s.append(b1)
            w2s.append(w2)
            b2s.append(b2)
        # film stays at the mel/conditioning rate [B, Tc, 6*ch]: the
        # kernel nearest-gathers rows in VMEM ((t*Tc)//T convention) —
        # shipping a full-rate [B, T, 6*ch] film through HBM was the
        # kernel's largest traffic term (round-4 profile)
        film = jnp.concatenate(films, axis=-1)
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        return film_resblock_stack_pallas(
            x, film, jnp.stack(w1s), jnp.stack(b1s), jnp.stack(w2s),
            jnp.stack(b2s), tuple(self.cfg.res_dilations),
            interpret=interpret)


class Generator(nn.Module):
    """mel [B, T, 80] + prosody [B, T, 18] + style [B, S] + emotion [B, 6]
    -> waveform [B, T*prod(upsample), 1] (generator.py:50-98)."""
    cfg: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        prosody: jnp.ndarray,
        style: jnp.ndarray,
        emotion: jnp.ndarray,
        style_drop: bool = False,
        emo_drop: bool = False,
        w_style: float = 1.0,
        w_emo: float = 1.0,
        scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, T, C = mel.shape
        nb = cfg.num_bands
        band_size = C // nb

        # conditioning with independent CFG drop flags (generator.py:64-73)
        c_pros = nn.Dense(cfg.cond_dim // 2)(prosody)
        c_pros = jax.nn.silu(c_pros)
        c_pros = nn.Dense(cfg.cond_dim)(c_pros)
        c_sty = nn.Dense(cfg.cond_dim, name="style_proj")(style)[:, None] * w_style
        if style_drop:
            c_sty = jnp.zeros_like(c_sty)
        c_emo = nn.Dense(cfg.cond_dim, name="emotion_proj")(emotion)[:, None] * w_emo
        if emo_drop:
            c_emo = jnp.zeros_like(c_emo)
        cond = c_pros + c_sty + c_emo  # [B, T, cond_dim]
        if cfg.scale_cond and scale is None:
            scale = jnp.zeros((B, 2 * C), mel.dtype)
        if cfg.scale_cond:
            # absolute-scale cue (VocoderConfig.scale_cond): per-utterance
            # mel normalization stats [mean || std], [B, 2*channels].
            # Zero kernel init: a fresh scale_cond model reproduces the
            # scale-free forward exactly until trained.
            c_scale = nn.Dense(cfg.cond_dim, name="scale_proj",
                               kernel_init=nn.initializers.zeros)(scale)
            cond = cond + c_scale[:, None]
        # keep the FiLM conditioning O(1) regardless of the prosody
        # feature scale (raw MFCC dims reach std ~9 on real features)
        cond = nn.LayerNorm(name="cond_norm")(cond)

        # split mel into channel bands and vmap ONE shared tower over the
        # band axis. The band axis leads; the batch axis is untouched, so
        # dp-sharded batches incur no resharding collectives.
        bands = mel.reshape(B, T, nb, band_size)            # [B,T,nb,bs]
        bands = jnp.moveaxis(bands, 2, 0)                   # [nb,B,T,bs]
        if cfg.band_tp:
            # tensor parallelism: bands over "tp", batch over "dp". The
            # tower params are shared (replicated), so each tp device
            # runs its band slice; XLA all-gathers over tp only at the
            # band_merge reshape below. Engages only under an active
            # jax.set_mesh context (no-op at init / single device).
            from ttsx.core.mesh import maybe_constrain
            bands = maybe_constrain(bands, "tp", "dp")

        class _Tower(nn.Module):
            vcfg: VocoderConfig

            @nn.compact
            def __call__(self, band, cond_in):
                h = Conv1d(self.vcfg.hidden_dim, 7, name="band_stem")(band)
                return BandTower(self.vcfg, name="tower")(h, cond_in)

        tower = nn.vmap(
            _Tower,
            in_axes=(0, None), out_axes=0,
            variable_axes={"params": None},   # shared tower params
            split_rngs={"params": False},
        )(cfg, name="band_tower")
        h = tower(bands, cond)                              # [nb,B,T*up,ch]
        if cfg.band_tp:
            from ttsx.core.mesh import maybe_constrain
            h = maybe_constrain(h, "tp", "dp")

        up = 1
        for f in cfg.upsample_factors:
            up *= f
        ch = h.shape[-1]
        h = jnp.moveaxis(h, 0, 2).reshape(B, T * up, nb * ch)
        wav = Conv1d(1, 7, name="band_merge")(h)
        # NOTE: a trained-in per-utterance output-gain head from the scale
        # stats was tried twice and killed (see VocoderConfig.scale_cond
        # note); absolute level is a serving-side gain.
        return jnp.tanh(wav)


# ---------------------------------------------------------------------------
# discriminators (vocoder7/discriminators.py) — return (logits, feature maps)
# at reference capacity: spectral-normed stacks with ch growth x4 per layer
# ---------------------------------------------------------------------------
class PeriodDiscriminator(nn.Module):
    """Spectral-normed Conv2d stack over the [B, T//p, p, 1] period image
    with kernel (5,1)/stride (3,1), ch 1->4->16->64->256, final (3,1)->1
    (discriminators.py:20-32). Convolution runs along the T//p axis; the
    period axis is preserved so cross-period structure reaches the logit."""
    period: int
    ch_growth: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, T, _ = x.shape
        p = self.period
        pad = (-T) % p
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        h = x.reshape(B, (T + pad) // p, p, 1)   # [B, T//p, p, 1] NHWC
        feats = []
        ch = 1
        for i in range(4):
            ch *= self.ch_growth
            h = SNConv(ch, kernel_size=(5, 1), strides=(3, 1))(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        logit = SNConv(1, kernel_size=(3, 1))(h)
        return logit, feats


class ScaleDiscriminator(nn.Module):
    """5 spectral-normed Conv1d layers, strides [2,2,2,1,1], ch growth x4
    (1->4->16->64->256->1024 at reference growth), final k=3 -> 1
    (discriminators.py:72-89)."""
    kernel_size: int
    ch_growth: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        h = x
        ch = 1
        for i in range(5):
            stride = 2 if i < 3 else 1
            ch *= self.ch_growth
            h = SNConv(ch, kernel_size=(self.kernel_size,),
                       strides=(stride,))(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        logit = SNConv(1, kernel_size=(3,))(h)
        return logit, feats


class BandDiscriminatorTower(nn.Module):
    """4 spectral-normed Conv1d(k=15, s=2) layers, ch growth x4 -> 256,
    final k=3 -> 1 (discriminators.py:122-136)."""
    ch_growth: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        h = x
        ch = 1
        for _ in range(4):
            ch *= self.ch_growth
            h = SNConv(ch, kernel_size=(15,), strides=(2,))(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        logit = SNConv(1, kernel_size=(3,))(h)
        return logit, feats


class MultiPeriodDiscriminator(nn.Module):
    cfg: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        logits, features = [], []
        for p in self.cfg.disc_periods:
            l, f = PeriodDiscriminator(p, self.cfg.disc_ch_growth,
                                       name=f"period_{p}")(wav)
            logits.append(l)
            features.append(f)
        return logits, features


class MultiScaleDiscriminator(nn.Module):
    cfg: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        logits, features = [], []
        scales = [wav,
                  avg_pool1d(wav, 4, 2),
                  avg_pool1d(avg_pool1d(wav, 4, 2), 4, 2)]
        for i, (ks, s) in enumerate(zip(self.cfg.disc_kernel_sizes, scales)):
            l, f = ScaleDiscriminator(ks, self.cfg.disc_ch_growth,
                                      name=f"scale_{i}")(s)
            logits.append(l)
            features.append(f)
        return logits, features


class MultiBandDiscriminator(nn.Module):
    """Time-chunked band discriminators (discriminators.py:112-157)."""
    cfg: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        nb = self.cfg.num_bands
        B, T, _ = wav.shape
        # guard degenerate shapes: T < nb would make T//nb zero-width band
        # slices (empty-tensor convs); pad so every band has >= 1 sample
        chunk = max(-(-T // nb), 1)
        pad = chunk * nb - T
        if pad:
            wav = jnp.pad(wav, ((0, 0), (0, pad), (0, 0)))
        logits, features = [], []
        for i in range(nb):
            band = wav[:, i * chunk:(i + 1) * chunk, :]
            l, f = BandDiscriminatorTower(self.cfg.disc_ch_growth,
                                          name=f"band_{i}")(band)
            logits.append(l)
            features.append(f)
        return logits, features


# ---------------------------------------------------------------------------
# learnable multi-resolution STFT loss (vocoder7/stft.py)
# ---------------------------------------------------------------------------
class LearnableSTFT(nn.Module):
    """|STFT| x learnable filterbank. wav: [B, T, 1] -> [B, frames, n_bins].

    The filterbank starts at ones (identity scaling): the loss begins as a
    plain multi-resolution magnitude distance and the filterbank can be
    adapted deliberately. (A zero-mean random init leaves ~half the bins
    nearly unweighted and the spectral objective starts out arbitrary —
    measured as a near-silent generator after a 2000-step GAN run.)"""
    n_fft: int
    hop_length: int

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        from ttsx.dsp.stft import stft_magnitude
        fb = self.param("filterbank", nn.initializers.ones,
                        (self.n_fft // 2 + 1,))
        mag = stft_magnitude(wav[..., 0], self.n_fft, self.hop_length)
        return mag * fb[None, None, :]


class STFTLoss(nn.Module):
    """Multi-resolution magnitude loss x lambda_stft (stft.py:37-54).

    Linear-magnitude L1 through the learnable filterbank (the reference
    formula) plus, when cfg.stft_log_mag, a log-magnitude L1 term — the
    standard GAN-vocoder auxiliary pair; without it low-energy bins get
    vanishing gradient and amplitude converges extremely slowly."""
    cfg: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)

    @nn.compact
    def __call__(self, wav_fake: jnp.ndarray, wav_real: jnp.ndarray):
        from ttsx.dsp.stft import stft_magnitude
        loss = 0.0
        for n_fft in self.cfg.stft_sizes:
            st = LearnableSTFT(n_fft, self.cfg.hop_length,
                               name=f"stft_{n_fft}")
            loss = loss + jnp.mean(jnp.abs(st(wav_fake) - st(wav_real)))
            if self.cfg.stft_log_mag:
                mf = stft_magnitude(wav_fake[..., 0], n_fft,
                                    self.cfg.hop_length)
                mr = stft_magnitude(wav_real[..., 0], n_fft,
                                    self.cfg.hop_length)
                loss = loss + jnp.mean(jnp.abs(jnp.log(mf + 1e-5)
                                               - jnp.log(mr + 1e-5)))
        return loss * self.cfg.lambda_stft
