"""Pallas kernel parity tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ttsx.core.config import AudioConfig
from ttsx.dsp.stft import mel_spectrogram
from ttsx.nn.s4 import scan_dw_conv, ssm_kernel, fft_dw_conv
from ttsx.ops.mel_kernel import mel_frontend_pallas
from ttsx.ops.s4_kernel import s4_scan_pallas

CFG = AudioConfig(sample_rate=16000, n_fft=256, win_length=256,
                  hop_length=64, n_mels=32, mel_normalize=False)


def test_mel_kernel_matches_reference():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32) * 0.3)
    ref = mel_spectrogram(wav, CFG)
    got = mel_frontend_pallas(wav, CFG, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_mel_kernel_normalized():
    cfg = AudioConfig(sample_rate=16000, n_fft=256, win_length=256,
                      hop_length=64, n_mels=32, mel_normalize=True)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(1, 3000)).astype(np.float32))
    ref = mel_spectrogram(wav, cfg)
    got = mel_frontend_pallas(wav, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


def test_s4_kernel_matches_scan():
    rng = jax.random.PRNGKey(0)
    B, T, H, d, e = 2, 96, 2, 4, 4
    C = H * e
    u = jax.random.normal(rng, (B, T, C))
    a = -jnp.abs(jax.random.normal(rng, (H, d))) * 0.3
    b = jnp.ones((H, d))
    c = jax.random.normal(rng, (H, d, e)) * 0.5
    ref = scan_dw_conv(u, a, b, c)
    got = s4_scan_pallas(u, a, b, c, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_s4_kernel_matches_fft_conv():
    rng = jax.random.PRNGKey(1)
    B, T, H, d, e = 1, 128, 2, 3, 4
    C = H * e
    u = jax.random.normal(rng, (B, T, C))
    a = -jnp.abs(jax.random.normal(rng, (H, d))) * 0.5
    b = jnp.ones((H, d))
    c = jax.random.normal(rng, (H, d, e)) * 0.3
    w = ssm_kernel(a, b, c, T)
    ref = fft_dw_conv(u, w, causal=True)
    got = s4_scan_pallas(u, a, b, c, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("f,cin,cout,t", [(4, 8, 6, 10), (8, 16, 8, 33),
                                          (2, 4, 4, 7)])
def test_upsample_kernel_parity(f, cin, cout, t):
    from ttsx.nn.conv import ConvTranspose1d
    from ttsx.ops.upsample_kernel import upsample_lrelu_pallas
    m = ConvTranspose1d(cout, stride=f)
    k = jax.random.PRNGKey(f)
    x = jax.random.normal(k, (2, t, cin))
    p = m.init(k, x)
    ref = jax.nn.leaky_relu(m.apply(p, x), 0.1)
    w = p["params"]["ConvTranspose_0"]["kernel"]
    b = p["params"]["ConvTranspose_0"]["bias"]
    got = upsample_lrelu_pallas(x, w, b, f, interpret=True)
    assert got.shape == (2, t * f, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_generator_pallas_upsample_checkpoint_compat():
    import dataclasses
    from ttsx.core.config import VocoderConfig
    from ttsx.models.vocoder import Generator
    vc = VocoderConfig(hidden_dim=32, cond_dim=16, style_dim=32)
    k = jax.random.PRNGKey(0)
    mel = jax.random.normal(k, (1, 8, 80))
    pros = jax.random.normal(k, (1, 8, 18))
    style = jax.random.normal(k, (1, 32))
    emo = jnp.full((1, 6), 1 / 6.0)
    g = Generator(vc)
    p = g.init(k, mel, pros, style, emo)
    ref = g.apply(p, mel, pros, style, emo)
    g2 = Generator(dataclasses.replace(vc, use_pallas_upsample=True))
    got = g2.apply(p, mel, pros, style, emo)  # same checkpoint
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("dil", [1, 3, 5])
def test_resblock_kernel_parity(dil):
    from ttsx.models.vocoder import FiLMResidualBlock
    from ttsx.ops.resblock_kernel import film_resblock_pallas
    C, Ccond, B, T = 32, 16, 2, 40
    m = FiLMResidualBlock(C, dil, Ccond)
    k = jax.random.PRNGKey(dil)
    x = jax.random.normal(k, (B, T, C))
    cond = jax.random.normal(k, (B, T, Ccond))
    p = m.init(k, x, cond)
    ref = m.apply(p, x, cond)
    pp = p["params"]
    film = cond @ pp["Dense_0"]["kernel"] + pp["Dense_0"]["bias"]
    scale, shift = jnp.split(film, 2, axis=-1)
    got = film_resblock_pallas(
        x, scale, shift,
        pp["Conv1d_0"]["Conv_0"]["kernel"],
        pp["Conv1d_0"]["Conv_0"]["bias"],
        pp["Conv1d_1"]["Conv_0"]["kernel"],
        pp["Conv1d_1"]["Conv_0"]["bias"], dil, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("t", [40, 1040])
def test_resblock_stack_kernel_parity(t):
    """Stage-resident fused stack vs the chained XLA FiLMResidualBlocks:
    single-tile (t < TILE, padded) and multi-tile (halo exchange across
    tile boundaries + sequence-edge masking)."""
    from ttsx.models.vocoder import FiLMResidualBlock
    from ttsx.ops.resblock_stack_kernel import film_resblock_stack_pallas
    C, Ccond, B = 16, 8, 2
    dils = (1, 3, 5)
    k = jax.random.PRNGKey(7)
    x = jax.random.normal(k, (B, t, C))
    cond = jax.random.normal(jax.random.PRNGKey(8), (B, t, Ccond))

    blocks = [FiLMResidualBlock(C, d, Ccond) for d in dils]
    params = [b.init(jax.random.PRNGKey(10 + i), x, cond)
              for i, b in enumerate(blocks)]
    # give the zero-init FiLM Dense real weights so FiLM actually fires
    params = [
        jax.tree_util.tree_map_with_path(
            lambda path, leaf: (jax.random.normal(
                jax.random.PRNGKey(hash(str(path)) % 2**31), leaf.shape)
                * 0.3 if "Dense_0" in str(path) else leaf), p)
        for p in params]
    ref = x
    for b, p in zip(blocks, params):
        ref = b.apply(p, ref, cond)

    films, w1s, b1s, w2s, b2s = [], [], [], [], []
    for p in params:
        pp = p["params"]
        films.append(cond @ pp["Dense_0"]["kernel"]
                     + pp["Dense_0"]["bias"])
        w1s.append(pp["Conv1d_0"]["Conv_0"]["kernel"])
        b1s.append(pp["Conv1d_0"]["Conv_0"]["bias"])
        w2s.append(pp["Conv1d_1"]["Conv_0"]["kernel"])
        b2s.append(pp["Conv1d_1"]["Conv_0"]["bias"])
    got = film_resblock_stack_pallas(
        x, jnp.concatenate(films, axis=-1), jnp.stack(w1s),
        jnp.stack(b1s), jnp.stack(w2s), jnp.stack(b2s), dils,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_resblock_stack_vmap_under_mesh_no_fold():
    """With an active mesh the custom_vmap rule must keep the vmapped
    band axis leading (lax.map) instead of folding it into the batch
    axis — folding a replicated axis into a dp-sharded one forces
    all-gathers (CLAUDE.md invariant). Numerics must match both ways."""
    from jax.sharding import Mesh
    from ttsx.ops.resblock_stack_kernel import film_resblock_stack_pallas

    Bv, B, T, C = 3, 2, 40, 16
    dils = (1, 3)
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (Bv, B, T, C))
    film = jax.random.normal(jax.random.PRNGKey(4), (Bv, B, T, 4 * C))
    w1s = jax.random.normal(jax.random.PRNGKey(5), (2, 3, C, 2 * C)) * 0.2
    b1s = jnp.zeros((2, 2 * C))
    w2s = jax.random.normal(jax.random.PRNGKey(6), (2, 3, C, C)) * 0.2
    b2s = jnp.zeros((2, C))

    run = jax.vmap(lambda xv, fv: film_resblock_stack_pallas(
        xv, fv, w1s, b1s, w2s, b2s, dils, interpret=True))
    ref = run(x, film)  # no mesh: fold path
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    with jax.set_mesh(mesh):
        got = run(x, film)  # mesh active: lax.map path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_generator_resblock_stack_checkpoint_compatible():
    """Generator with use_pallas_resblock_stack reuses the XLA path's
    checkpoint unchanged and produces the same waveform."""
    import dataclasses
    from ttsx.core.config import VocoderConfig
    from ttsx.models.vocoder import Generator
    vc = VocoderConfig(hidden_dim=32, cond_dim=16, style_dim=32)
    k = jax.random.PRNGKey(0)
    B, T = 1, 12
    mel = jax.random.normal(k, (B, T, vc.channels))
    pros = jax.random.normal(k, (B, T, 18))
    style = jax.random.normal(k, (B, vc.style_dim))
    emo = jnp.full((B, 6), 1 / 6)
    g = Generator(vc)
    p = g.init(k, mel, pros, style, emo)
    ref = g.apply(p, mel, pros, style, emo)
    g2 = Generator(dataclasses.replace(vc, use_pallas_resblock_stack=True))
    got = g2.apply(p, mel, pros, style, emo)  # same checkpoint
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_resblock_stack_kernel_mel_rate_film():
    """Round-4 traffic optimization: film passed at the CONDITIONING
    rate (Tc << T) is nearest-gathered in VMEM via an exact one-hot
    matmul; result must match the XLA chain fed host-gathered cond
    ((t*Tc)//T convention) bit-for-bit up to float tolerance."""
    from ttsx.models.vocoder import FiLMResidualBlock
    from ttsx.ops.resblock_stack_kernel import film_resblock_stack_pallas
    C, Ccond, B, T, Tc = 16, 8, 1, 1024, 64
    dils = (1, 3, 5)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, C))
    cond = jax.random.normal(jax.random.PRNGKey(8), (B, Tc, Ccond))
    idx = jnp.clip((jnp.arange(T) * Tc) // T, 0, Tc - 1)
    cond_g = cond[:, idx, :]

    blocks = [FiLMResidualBlock(C, d, Ccond) for d in dils]
    params = [b.init(jax.random.PRNGKey(10 + i), x, cond_g)
              for i, b in enumerate(blocks)]
    params = [
        jax.tree_util.tree_map_with_path(
            lambda path, leaf: (jax.random.normal(
                jax.random.PRNGKey(hash(str(path)) % 2**31), leaf.shape)
                * 0.3 if "Dense_0" in str(path) else leaf), p)
        for p in params]
    ref = x
    for b, p in zip(blocks, params):
        ref = b.apply(p, ref, cond_g)

    films, w1s, b1s, w2s, b2s = [], [], [], [], []
    for p in params:
        pp = p["params"]
        films.append(cond @ pp["Dense_0"]["kernel"]
                     + pp["Dense_0"]["bias"])     # mel rate [B, Tc, 2C]
        w1s.append(pp["Conv1d_0"]["Conv_0"]["kernel"])
        b1s.append(pp["Conv1d_0"]["Conv_0"]["bias"])
        w2s.append(pp["Conv1d_1"]["Conv_0"]["kernel"])
        b2s.append(pp["Conv1d_1"]["Conv_0"]["bias"])
    got = film_resblock_stack_pallas(
        x, jnp.concatenate(films, axis=-1), jnp.stack(w1s),
        jnp.stack(b1s), jnp.stack(w2s), jnp.stack(b2s), dils,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
