import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttsx.core.config import (
    AcousticConfig, ProsodyConfig, RefEncConfig, RefinerConfig,
    VocoderConfig, S4Config)
from ttsx.models import (
    AcousticModel, ProsodyPredictor, ReferenceEncoder, ScoreSDERefiner,
    Generator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
    MultiBandDiscriminator, STFTLoss, EmotionClassifier, pack_prosody,
    sde_sample)
from ttsx.nn.gst import GlobalStyleTokens

K = jax.random.PRNGKey(0)
B, T = 2, 16

S4_SMALL = S4Config(heads=2, norm_groups=2, dropout=0.0)


@pytest.fixture(scope="module")
def batch():
    ks = jax.random.split(K, 6)
    return {
        "text_emb": jax.random.normal(ks[0], (B, T, 32)),
        "prosody": jax.random.normal(ks[1], (B, T, 18)),
        "emotion_probs": jax.nn.softmax(jax.random.normal(ks[2], (B, 6))),
        "mel": jax.random.normal(ks[3], (B, T, 80)),
        "speaker": jax.random.normal(ks[4], (B, 16)),
        "style_id": jnp.zeros((B,), jnp.int32),
        "style": jax.random.normal(ks[5], (B, 32)),
    }


def test_acoustic_forward(batch):
    cfg = AcousticConfig(text_emb_dim=32, hidden_channels=32,
                         conformer_layers=1, transformer_dim=64,
                         num_layers=1, attention_heads=2)
    m = AcousticModel(cfg)
    p = m.init(K, batch["text_emb"], batch["prosody"],
               batch["emotion_probs"], target_mel=batch["mel"],
               speaker=batch["speaker"])
    out = m.apply(p, batch["text_emb"], batch["prosody"],
                  batch["emotion_probs"], target_mel=batch["mel"],
                  speaker=batch["speaker"])
    assert out.mel.shape == (B, T, 80)
    assert out.duration.shape == (B, T)
    assert (np.asarray(out.duration) >= 0).all()  # softplus
    assert len(out.fake_logits) == 3 and len(out.real_logits) == 3
    # without target_mel, real side is empty (model.py:238)
    out2 = m.apply(p, batch["text_emb"], batch["prosody"],
                   batch["emotion_probs"], speaker=batch["speaker"])
    assert out2.real_logits == ()


def test_prosody_forward(batch):
    cfg = ProsodyConfig(cond_dim=32, n_layers=1, s4=S4_SMALL)
    m = ProsodyPredictor(cfg)
    p = m.init(K, batch["mel"])
    out = m.apply(p, batch["mel"])
    assert out["f0"].shape == (B, T)
    assert out["speech_rate"].shape == (B, 1)
    assert out["mfcc"].shape == (B, 13)
    packed = pack_prosody(out)
    assert packed.shape == (B, T, 18)


def test_prosody_longer_than_nfreq():
    cfg = ProsodyConfig(cond_dim=32, n_layers=1, n_freq=8, s4=S4_SMALL)
    m = ProsodyPredictor(cfg)
    mel = jnp.zeros((1, 24, 80))
    p = m.init(K, mel)
    out = m.apply(p, mel)
    assert out["f0"].shape == (1, 24)


@pytest.mark.parametrize("backbone,pooling", [
    ("ecapa_tdnn", "multi_head_attentive"),
    ("res2net", "stats"),
    ("conformer", "self_attentive"),
    ("ssl_host", "stats"),
])
def test_reference_encoder(batch, backbone, pooling):
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32, backbone=backbone,
                       pooling=pooling, conformer_layers=1, conformer_ff=32)
    m = ReferenceEncoder(cfg)
    p = m.init(K, batch["mel"])
    emb = m.apply(p, batch["mel"])
    assert emb.shape == (B, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               atol=1e-4)


def test_reference_encoder_masked(batch):
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32)
    m = ReferenceEncoder(cfg)
    mask = jnp.ones((B, T), bool).at[:, T // 2:].set(False)
    p = m.init(K, batch["mel"], mask)
    emb = m.apply(p, batch["mel"], mask)
    # masked part must not affect the embedding
    mel2 = batch["mel"].at[:, T // 2:, :].add(100.0)
    emb2 = m.apply(p, mel2, mask)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-3)


REFINER_SMALL = RefinerConfig(
    levels=1, cond_dim=32, hidden_channels=32, hsf_hidden=16, style_dim=16,
    beta_hidden=16,
    s4=S4Config(heads=2, norm_groups=2, causal=True, dropout=0.0),
    sde_steps=2)


def test_refiner_forward(batch):
    m = ScoreSDERefiner(REFINER_SMALL)
    p = m.init(K, batch["mel"], batch["prosody"], batch["style_id"],
               batch["text_emb"])
    out = m.apply(p, batch["mel"], batch["prosody"], batch["style_id"],
                  batch["text_emb"])
    assert out.mel_ref.shape == (B, T, 80)
    assert out.t.shape == (B, 1)
    assert float(out.vq_loss) >= 0


def test_refiner_sde_sample(batch):
    m = ScoreSDERefiner(REFINER_SMALL)
    p = m.init(K, batch["mel"], batch["prosody"], batch["style_id"],
               batch["text_emb"])
    mel = sde_sample(m, p, batch["mel"], batch["prosody"], batch["style_id"],
                     batch["text_emb"], K, steps=2)
    assert mel.shape == (B, T, 80)
    assert np.isfinite(np.asarray(mel)).all()


VOC_SMALL = VocoderConfig(hidden_dim=32, cond_dim=16, style_dim=32,
                          disc_ch_growth=2)


def test_generator_upsample_rate(batch):
    g = Generator(VOC_SMALL)
    p = g.init(K, batch["mel"], batch["prosody"], batch["style"],
               batch["emotion_probs"])
    wav = g.apply(p, batch["mel"], batch["prosody"], batch["style"],
                  batch["emotion_probs"])
    up = 1
    for f in VOC_SMALL.upsample_factors:
        up *= f
    assert wav.shape == (B, T * up, 1)  # 256x = hop_length
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh


def test_generator_cfg_drops(batch):
    g = Generator(VOC_SMALL)
    p = g.init(K, batch["mel"], batch["prosody"], batch["style"],
               batch["emotion_probs"])
    w1 = g.apply(p, batch["mel"], batch["prosody"], batch["style"],
                 batch["emotion_probs"], style_drop=True, emo_drop=True)
    w2 = g.apply(p, batch["mel"], batch["prosody"],
                 jnp.zeros_like(batch["style"]),
                 jnp.zeros_like(batch["emotion_probs"]))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_discriminators(batch):
    wav = jax.random.normal(K, (B, 1024, 1))
    for cls, n in [(MultiPeriodDiscriminator, 5),
                   (MultiScaleDiscriminator, 3),
                   (MultiBandDiscriminator, 4)]:
        d = cls(VOC_SMALL)
        p = d.init(K, wav)
        logits, feats = d.apply(p, wav)
        assert len(logits) == n
        assert all(len(f) > 0 for f in feats)


def test_multiband_disc_short_input():
    """T < num_bands must not produce zero-width band slices (VERDICT r1
    weak #7)."""
    wav = jax.random.normal(K, (B, 3, 1))  # shorter than num_bands=4
    d = MultiBandDiscriminator(VOC_SMALL)
    p = d.init(K, wav)
    logits, feats = d.apply(p, wav)
    assert len(logits) == VOC_SMALL.num_bands
    for l in logits:
        assert l.size > 0 and bool(jnp.isfinite(l).all())


def test_discriminators_reference_capacity():
    """Default config matches the reference's channel schedule: MPD 2D
    stacks to 256 ch over the period image, MSD 1D stacks to 1024 ch
    (vocoder7/discriminators.py:20-89)."""
    from ttsx.core.config import VocoderConfig
    cfg = VocoderConfig()  # default disc_ch_growth=4
    wav = jnp.zeros((1, 64, 1))
    mpd = MultiPeriodDiscriminator(cfg)
    pv = mpd.init(K, wav)
    _, feats = mpd.apply(pv, wav)
    assert feats[0][-1].shape[-1] == 256       # deepest MPD feature map
    assert feats[0][0].ndim == 4               # 2D conv over period image
    msd = MultiScaleDiscriminator(cfg)
    ps = msd.init(K, wav)
    _, sfeats = msd.apply(ps, wav)
    assert sfeats[0][-1].shape[-1] == 1024     # deepest MSD feature map


def test_stft_loss_zero_for_identical(batch):
    wav = jax.random.normal(K, (B, 2048, 1))
    sl = STFTLoss(VOC_SMALL)
    p = sl.init(K, wav, wav)
    assert float(sl.apply(p, wav, wav)) == 0.0
    assert float(sl.apply(p, wav * 0.5, wav)) > 0.0


def test_gst(batch):
    g = GlobalStyleTokens(80, 32, 10)
    p = g.init(K, batch["mel"])
    s = g.apply(p, batch["mel"])
    assert s.shape == (B, 32)


def test_emotion_classifier():
    m = EmotionClassifier(hidden=16)
    x = jax.random.normal(K, (B, 23))
    p = m.init(K, x)
    probs = m.apply(p, x)
    assert probs.shape == (B, 6)
    assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()


def test_residual_vq_fidelity_compounds():
    """HierVQ is residual quantization: each stage must reduce the
    reconstruction error of the stage before it (the reference's chained
    re-quantization adds nothing — see ttsx/nn/vq.py)."""
    import jax
    import jax.numpy as jnp
    from ttsx.nn.vq import HierVQ

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 8))
    errs = []
    for stages in (1, 2, 3):
        vq = HierVQ(dims=(8,) * stages, codes=(64,) * stages)
        params = vq.init(jax.random.PRNGKey(1), x)
        out, loss = vq.apply(params, x)
        errs.append(float(jnp.mean((out - x) ** 2)))
        assert float(loss) >= 0
    assert errs[1] < errs[0] and errs[2] < errs[1]


def test_vq_straight_through_gradient():
    import jax
    import jax.numpy as jnp
    from ttsx.nn.vq import HierVQ

    vq = HierVQ(dims=(8, 8), codes=(32, 32))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    params = vq.init(jax.random.PRNGKey(1), x)

    def f(x):
        out, _ = vq.apply(params, x)
        return jnp.sum(out * 2.0)

    g = jax.grad(f)(x)
    # straight-through: d(out)/d(x) == identity
    assert jnp.allclose(g, 2.0)


def test_generator_remat_checkpoint_compatible():
    """VocoderConfig.remat must not change the param tree (checkpoints
    swap freely) and must produce identical outputs."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from ttsx.core.config import VocoderConfig
    from ttsx.models.vocoder import Generator

    cfg = VocoderConfig(hidden_dim=16, cond_dim=8, style_dim=16,
                        disc_ch_growth=2)
    B, T = 2, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    args = (jax.random.normal(ks[0], (B, T, 80)),
            jax.random.normal(ks[1], (B, T, 18)),
            jax.random.normal(ks[2], (B, 16)),
            jax.nn.softmax(jax.random.normal(ks[3], (B, 6))))
    g0 = Generator(cfg)
    g1 = Generator(dataclasses.replace(cfg, remat=True))
    p0 = g0.init(jax.random.PRNGKey(1), *args)
    p1 = g1.init(jax.random.PRNGKey(1), *args)
    t0 = jax.tree_util.tree_structure(p0)
    t1 = jax.tree_util.tree_structure(p1)
    assert t0 == t1
    w0 = g0.apply(p0, *args)
    w1 = g1.apply(p0, *args)  # same params through the remat path
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-6)


def test_generator_unsaturated_with_raw_scale_conditioning():
    """Large-scale prosody conditioning (raw MFCC dims reach std ~9) must
    not rail the output tanh: zero-init FiLM + cond LayerNorm keep the
    init output linear. A railed tanh is a square wave with zero gradient
    — the failure measured as a GAN vocoder that never learned amplitude."""
    g = Generator(VOC_SMALL)
    mel = jax.random.normal(K, (B, T, VOC_SMALL.channels))
    pros = jax.random.normal(jax.random.PRNGKey(1), (B, T, 18)) * 9.0
    style = jax.random.normal(jax.random.PRNGKey(2),
                              (B, VOC_SMALL.style_dim)) * 5.0
    emo = jnp.full((B, 6), 1.0 / 6.0)
    p = g.init(K, mel, pros, style, emo)
    wav = g.apply(p, mel, pros, style, emo)
    sat = float(jnp.mean(jnp.abs(wav) > 0.999))
    assert sat < 0.01, f"tanh saturation {sat:.3f}"
    assert float(jnp.sqrt(jnp.mean(wav ** 2))) < 0.9


def test_stft_loss_identity_init_and_amplitude_gradient():
    """The learnable filterbank starts at ones (identity scaling), and the
    log-magnitude term gives a low-amplitude fake a usable gradient signal
    (linear-mag alone starves low-energy bins)."""
    import dataclasses

    wav_real = jax.random.normal(K, (B, 2048, 1)) * 0.1
    sl = STFTLoss(VOC_SMALL)
    p = sl.init(K, wav_real, wav_real)
    for leaf in jax.tree_util.tree_leaves(p):
        assert jnp.all(leaf == 1.0)  # every param is a filterbank at ones

    # quiet output must be penalized much more steeply in log space
    lin_only = STFTLoss(dataclasses.replace(VOC_SMALL, stft_log_mag=False))
    p_lin = lin_only.init(K, wav_real, wav_real)
    quiet = wav_real * 1e-3
    full = float(sl.apply(p, quiet, wav_real))
    lin = float(lin_only.apply(p_lin, quiet, wav_real))
    assert full > lin > 0.0
