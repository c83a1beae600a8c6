"""Typed configuration tree for the whole framework.

One coherent config namespace replacing the reference's per-package mix of
dataclasses / JSON / YAML (reference: reference_encoder/config.py,
acoustic4/config.py, sde_refiner5/config.py+config.json,
prosody3/config.prosody.json, vocoder7/config.py,
train/configs/unified_full.yaml). All keys of those files are represented
here; serialization to/from JSON and YAML round-trips the full tree.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, List, Optional, Tuple


# --------------------------------------------------------------------------
# audio / DSP frontend
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class AudioConfig:
    """Shared DSP frontend settings (reference: reference_encoder/config.py:3-50,
    vocoder7/config.py sr/hop)."""
    sample_rate: int = 22050
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    f_min: float = 0.0
    f_max: Optional[float] = 8000.0
    log_eps: float = 1e-5
    mel_normalize: bool = True  # per-bin mean/std normalize (utils.py:23-42)


# --------------------------------------------------------------------------
# S4 state-space layer (reference: prosody3/config.prosody.json "s4")
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class S4Config:
    heads: int = 4
    l_max: int = 1024
    rank: int = 1
    dropout: float = 0.1
    norm_groups: int = 8
    causal: bool = False
    # TPU-native kernel selection: 'fft' (rfft conv over materialized decay
    # kernel), 'scan' (associative-scan recurrence), or 'auto'.
    kernel_mode: str = "auto"


# --------------------------------------------------------------------------
# stage 1: reference (speaker) encoder
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class RefEncConfig:
    """Speaker-embedding encoder (reference: reference_encoder/config.py)."""
    audio: AudioConfig = field(default_factory=AudioConfig)
    speaker_dim: int = 256
    backbone: str = "ecapa_tdnn"  # res2net | conformer | ecapa_tdnn | ssl_host
    pooling: str = "multi_head_attentive"  # self_attentive | multi_head_attentive | stats
    pooling_heads: int = 4
    loss: str = "arcface"  # arcface | ge2e
    arcface_margin: float = 0.3
    # linear 0 -> arcface_margin ramp over this many steps (the optional
    # margin schedule of reference loss.py:5-35; 0 = fixed margin). The
    # anti-overfit lever for small-corpus runs: full margin from step 0
    # over-separates a memorizable train set (formant EER regressed
    # 0.100@3.2k -> 0.167@12.8k, VERDICT r3 weak #3).
    arcface_margin_warmup: int = 0
    arcface_scale: float = 30.0
    ge2e_init_w: float = 10.0
    ge2e_init_b: float = -5.0
    num_speakers: int = 256
    # backbone widths
    ecapa_channels: int = 512
    conformer_layers: int = 4
    conformer_heads: int = 4
    conformer_ff: int = 256
    dropout: float = 0.1
    # training schedule (config.py: micro-batch 8 x accum 16, warmup 5000)
    micro_batch: int = 8
    grad_accum: int = 16
    warmup_steps: int = 5000
    total_steps: int = 200_000
    lr: float = 1e-4
    grad_clip: float = 3.0
    checkpoint_every: int = 5000
    eval_every: int = 5000
    augment: bool = True


# --------------------------------------------------------------------------
# stage 2: prosody predictor
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class ProsodyConfig:
    """S4 prosody predictor (reference: prosody3/config.prosody.json)."""
    audio: AudioConfig = field(default_factory=AudioConfig)
    mel_dim: int = 80
    cond_dim: int = 256
    n_layers: int = 4
    n_freq: int = 80
    n_mfcc: int = 13
    dropout: float = 0.1
    s4: S4Config = field(default_factory=S4Config)
    # loss weights (config.prosody.json "loss")
    f0_weight: float = 1.0
    energy_weight: float = 1.0
    pitch_var_weight: float = 1.0
    speech_rate_weight: float = 1.0
    pause_dur_weight: float = 1.0
    mfcc_weight: float = 1.0


# --------------------------------------------------------------------------
# stage 3: acoustic model
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class AcousticConfig:
    """Acoustic model (reference: acoustic4/config.py:4-48)."""
    text_emb_dim: int = 384
    cond_dim: int = 18          # 5 prosody scalars + 13 mfcc
    speaker_dim: int = 16
    emotion_dim: int = 6
    hidden_channels: int = 256
    mel_dim: int = 80
    conformer_layers: int = 6
    attention_heads: int = 4
    transformer_dim: int = 512  # conformer ffn width
    kernel_size: int = 5
    num_layers: int = 4         # FiLM residual conv blocks
    dropout: float = 0.1
    diffusion_steps: int = 10
    base_sd_prob: float = 0.1
    layer_scale_init: float = 1e-4
    prune_ratio: float = 0.2
    ci_latency_factor: float = 20.0
    profile: bool = False
    # composite loss weights (reconstructed intent of acoustic4/losses.py,
    # used by train_acoutic.py:29,59)
    w_mel: float = 1.0
    w_mse: float = 1.0
    w_disc: float = 0.5
    w_diff: float = 1.0
    w_emo: float = 0.1


# --------------------------------------------------------------------------
# stage 4: score-SDE refiner
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class RefinerConfig:
    """Score-SDE mel refiner (reference: sde_refiner5/config.json + config.py)."""
    bands: Tuple[int, ...] = (24, 28, 28)
    levels: int = 2             # ref uses 3; 2 keeps ch growth sane on TPU
    flows: int = 3
    cond_dim: int = 256
    time_dim: int = 256
    beta_hidden: int = 64
    hidden_channels: int = 512
    hsf_hidden: int = 256
    hsf_layers: int = 4
    hsf_kernel: int = 5
    style_dim: int = 128
    num_styles: int = 100
    # residual-VQ stages (ttsx/nn/vq.py HierVQ): each stage quantizes what
    # the previous stages missed, so fidelity compounds (512^3 effective
    # codes). The reference's [512, 256] dims are unusable as stored —
    # stage dims must equal the 80-channel signal (config.json:13).
    vq_dims: Tuple[int, ...] = (80, 80, 80)
    vq_codes: Tuple[int, ...] = (512, 512, 512)
    cnf_dim: int = 80
    s4: S4Config = field(default_factory=lambda: S4Config(
        heads=4, l_max=1024, dropout=0.1, causal=True, norm_groups=4))
    # external SDE sampler (reference defers it — sde_refiner5/model.py:196-198)
    sde_steps: int = 8
    sde_sigma: float = 0.5
    max_avg_time: float = 0.5
    benchmark_runs: int = 5
    profile: bool = False

    def __post_init__(self):
        if sum(self.bands) != self.cnf_dim:
            raise ValueError(
                f"Sum of bands {sum(self.bands)} != cnf_dim {self.cnf_dim}")
        if self.benchmark_runs < 1:
            raise ValueError("benchmark_runs must be >= 1")
        if len(self.vq_dims) != len(self.vq_codes):
            raise ValueError("vq_dims and vq_codes length must match")


# --------------------------------------------------------------------------
# stage 5: GAN vocoder
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class VocoderConfig:
    """BigVGAN-style vocoder (reference: vocoder7/config.py:6-40)."""
    channels: int = 80
    cond_dim: int = 128
    style_dim: int = 128
    hidden_dim: int = 256
    num_bands: int = 4
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)
    res_dilations: Tuple[int, ...] = (1, 3, 5)
    disc_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    disc_kernel_sizes: Tuple[int, ...] = (15, 41, 41)
    # per-layer discriminator channel growth (reference x4: ch 1->4->16->
    # 64->256(->1024 MSD), discriminators.py:22-31); tests shrink it
    disc_ch_growth: int = 4
    sr: int = 22050
    hop_length: int = 256
    stft_sizes: Tuple[int, ...] = (512, 1024, 2048)
    # add log-magnitude L1 to the multi-res STFT loss (standard GAN-vocoder
    # auxiliary pair; linear-mag alone gives low-energy bins ~no gradient)
    stft_log_mag: bool = True
    num_style_tokens: int = 10
    dropout_prob: float = 0.1      # classifier-free guidance dropout
    r1_gamma: float = 10.0
    r1_interval: int = 16
    lambda_stft: float = 2.0
    lambda_pitch: float = 1.0
    lambda_dur: float = 1.0
    lambda_fm: float = 2.0
    # opt-in log-RMS energy match (losses.log_rms_energy_loss): fixes the
    # amplitude-underestimation plateau the STFT log-mag loss tolerates
    # (rms_ratio ~0.65-0.68 at 24-48k steps). 0.0 = off, preserving
    # comparability of the recorded round-2 quality curve.
    lambda_energy: float = 0.0
    # opt-in absolute-scale conditioning channel: the generator's inputs
    # carry no absolute loudness cue (per-utterance-normalized mel,
    # z-scored prosody energy, c0-less cepstra — measured root cause of
    # the rms_ratio 0.65-0.70 plateau, round 2). When on, the Generator
    # takes the per-utterance mel normalization stats [mean || std]
    # ([B, 2*channels], input-only at copy-synthesis) as an extra
    # zero-init conditioning projection. Off by default to preserve the
    # recorded round-2 quality curve's comparability.
    scale_cond: bool = False
    # NOTE (round-4 decision): a trained-in DIRECT output-gain head
    # ("scale_gain", a zero-init Dense from the scale stats multiplying
    # the waveform post-tanh) was tried twice and KILLED. v1 (unbounded
    # exp) destabilized the GAN (adv tail 0.24->1.22, MCD 56.7->149 dB,
    # parity.json vocoder_quality_scale_gain6k); v2 (tanh-bounded
    # |log g| <= 0.7) trained 3500 steps on top of the healthy
    # scale_cond-6k fork and made BOTH readouts worse (EMA MCD
    # 56.7->60.8 dB, rms_ratio_ema 0.746->0.697, ..._scale_gain_v2).
    # A global scalar is the discriminator's easiest tell. The
    # gain-matched readout (rms_ratio_gm_ema 0.995+-0.02) proves a
    # serving-side global gain suffices: absolute level is handled by
    # scale_cond + the export-meta gain (serve.SynthesisServer
    # loudness_peak / zoo serve_from_zoo scale_stats).
    ema_decay: float = 0.999
    # fused Pallas ConvT upsample kernel (ttsx/ops/upsample_kernel.py);
    # off by default until trained-quality validation (round-2 agenda)
    use_pallas_upsample: bool = False
    # stage-resident fused resblock stack (ttsx/ops/resblock_stack_kernel
    # .py): all res_dilations blocks of a stage in one VMEM-resident
    # pallas_call. Inference-path only (pallas_call has no autodiff);
    # training always uses the XLA blocks.
    use_pallas_resblock_stack: bool = False
    # tensor parallelism: shard the leading band axis of the vmapped band
    # tower over the mesh's "tp" axis (sharding constraints inside the
    # generator; XLA inserts the gather at band_merge). Off by default —
    # enable when running under a dp x tp Mesh with num_bands % tp == 0.
    band_tp: bool = False
    # rematerialize residual-block activations in the backward pass
    # (jax.checkpoint via nn.remat): trades ~15% generator FLOPs for the
    # post-upsample activation memory that dominates GAN training at
    # large batch (activations live at T*prod(upsample) rate).
    remat: bool = False


# --------------------------------------------------------------------------
# diarizer + observer pipeline (reference: HyperDiarizer config.yaml,
# reference_encoder/main.py --config)
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class DiarizerConfig:
    min_slice_dur: float = 1.5
    max_slice_dur: float = 6.0
    prob_thresh: float = 0.5
    merge_gap: float = 0.2
    pad: float = 0.1
    snr_db: float = 5.0
    overlap_sim_thresh: float = 0.5
    voiceprint_thresh: float = 0.6     # ReID match threshold
    memory_size: int = 10
    chunk_s: float = 60.0
    long_audio_s: float = 3600.0
    certainty_floor: float = 0.7
    cluster_method: str = "modularity"  # modularity | kmeans
    # post-cluster prototype-cosine agglomerative merge threshold
    # (cluster.merge_clusters; <= 0 disables). Counters modularity
    # over-fragmentation on noisy streams (hyp speaker-count inflation).
    cluster_merge_thresh: float = 0.75
    embed_dim: int = 192
    batch_size: int = 1
    dtype: str = "float32"


@dataclass(frozen=True)
class PipelineConfig:
    diarizer: DiarizerConfig = field(default_factory=DiarizerConfig)
    drift_window: int = 50
    drift_k_sigma: float = 2.0
    beats_per_arc: int = 3
    arc_seconds_per_cluster: float = 300.0
    validation_frac: float = 0.05
    validation_cap: int = 500
    rule_ema_alpha: float = 0.9
    accuracy_drop_alert: float = 0.05
    git_push_retries: int = 3
    chunk_bytes: int = 1_000_000_000   # >1 GB wavs get chunk-processed
    transcription_chunk_s: float = 600.0


# --------------------------------------------------------------------------
# training engine (reference: train/configs/unified_full.yaml)
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class NovelConfig:
    """The reference's 'novel:' trainer toggles (unified_full.yaml)."""
    sde_noise_annealing: bool = True
    dynamic_gan: bool = True
    ema_swap_validate: bool = True


@dataclass(frozen=True)
class TrainConfig:
    max_steps: int = 200_000
    grad_accum_steps: int = 2
    batch_size: int = 16
    lr: float = 2e-4
    weight_decay: float = 1e-2
    warmup_steps: int = 1000
    grad_clip: float = 1.0
    val_freq: int = 1000
    checkpoint_freq: int = 5000
    refiner_update_freq: int = 2
    vocoder_freeze_until: int = 0
    gan_d_steps: int = 1
    seed: int = 42
    bf16: bool = True                    # TPU-native replacement for AMP
    remat: bool = True                   # jax.checkpoint on heavy blocks
    novel: NovelConfig = field(default_factory=NovelConfig)
    log_tensorboard: bool = True
    log_csv: bool = True
    log_wandb: bool = False


# --------------------------------------------------------------------------
# parallelism / mesh
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh topology. Data parallelism is the reference's only strategy
    (SURVEY §2.10); tp/sp axes exist for scaling beyond parity."""
    dp: int = -1     # -1: use all remaining devices
    tp: int = 1
    axis_names: Tuple[str, ...] = ("dp", "tp")


# --------------------------------------------------------------------------
# root
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class TTSXConfig:
    audio: AudioConfig = field(default_factory=AudioConfig)
    ref_enc: RefEncConfig = field(default_factory=RefEncConfig)
    prosody: ProsodyConfig = field(default_factory=ProsodyConfig)
    acoustic: AcousticConfig = field(default_factory=AcousticConfig)
    refiner: RefinerConfig = field(default_factory=RefinerConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)


# --------------------------------------------------------------------------
# (de)serialization
# --------------------------------------------------------------------------
def to_dict(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def from_dict(cls, data: dict):
    kwargs = {}
    for f in fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        ftype = f.type if not isinstance(f.type, str) else None
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default
        if is_dataclass(default):
            kwargs[f.name] = from_dict(type(default), v)
        elif isinstance(default, tuple) and isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: Any, path: str | Path) -> None:
    path = Path(path)
    data = to_dict(cfg)
    if path.suffix in (".yaml", ".yml"):
        import yaml
        path.write_text(yaml.safe_dump(data, sort_keys=False))
    else:
        path.write_text(json.dumps(data, indent=2))


def load_config(path: str | Path, cls=TTSXConfig):
    path = Path(path)
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml
        data = yaml.safe_load(text)
    else:
        data = json.loads(text)
    return from_dict(cls, data)
