import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ttsx.core.config import (
    TTSXConfig, AcousticConfig, RefinerConfig, VocoderConfig, S4Config,
    TrainConfig)
from ttsx.models.pipeline import TTSPipeline
from ttsx.serve import SynthesisServer, SynthesisRequest, make_voice_transform
from ttsx.pipeline import services


def tiny_cfg():
    s4 = S4Config(heads=2, norm_groups=2, causal=True, dropout=0.0)
    return TTSXConfig(
        acoustic=AcousticConfig(text_emb_dim=16, hidden_channels=16,
                                conformer_layers=1, transformer_dim=32,
                                num_layers=1, attention_heads=2,
                                speaker_dim=8),
        refiner=RefinerConfig(levels=1, cond_dim=16, hidden_channels=16,
                              hsf_hidden=8, style_dim=8, beta_hidden=8,
                              s4=s4, sde_steps=2),
        vocoder=VocoderConfig(hidden_dim=16, cond_dim=8, style_dim=16, disc_ch_growth=2))


CFG = tiny_cfg()


@pytest.fixture(scope="module")
def pipe_params():
    pipe = TTSPipeline(CFG)
    params = pipe.init_params(jax.random.PRNGKey(0), batch=2, frames=8)
    return pipe, params


def test_synthesis_server_batch(pipe_params):
    pipe, params = pipe_params
    server = SynthesisServer(CFG, params, max_batch=2, frames=8)
    rng = np.random.default_rng(0)
    reqs = [SynthesisRequest(
        text_emb=rng.normal(size=(6, 16)).astype(np.float32),
        prosody=rng.normal(size=(6, 18)).astype(np.float32),
        emotion_probs=np.full(6, 1 / 6, np.float32),
        speaker=rng.normal(size=8).astype(np.float32),
        style_id=0) for _ in range(2)]
    wavs = server.serve_batch(reqs)
    assert len(wavs) == 2
    hop = 1
    for f in CFG.vocoder.upsample_factors:
        hop *= f
    assert all(len(w) == 6 * hop for w in wavs)
    assert all(np.isfinite(w).all() for w in wavs)


def test_synthesis_server_chain_equals_fused(pipe_params):
    """The 3-program chain (remote-compile workaround, the default) must
    produce the same waveforms as the single fused program."""
    pipe, params = pipe_params
    rng = np.random.default_rng(1)
    reqs = [SynthesisRequest(
        text_emb=rng.normal(size=(8, 16)).astype(np.float32),
        prosody=rng.normal(size=(8, 18)).astype(np.float32),
        emotion_probs=np.full(6, 1 / 6, np.float32),
        speaker=rng.normal(size=8).astype(np.float32),
        style_id=0) for _ in range(2)]
    kw = dict(max_batch=2, frames=8, bf16=False)
    w_chain = SynthesisServer(CFG, params, chain=True, **kw).serve_batch(reqs)
    w_fused = SynthesisServer(CFG, params, chain=False, **kw).serve_batch(reqs)
    for a, b in zip(w_chain, w_fused):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_voice_transform(pipe_params):
    pipe, params = pipe_params
    vt = make_voice_transform(CFG, pipe)
    rng = jax.random.PRNGKey(1)
    mel_src = jax.random.normal(rng, (1, 8, 80))
    pros = jax.random.normal(rng, (1, 8, 18))
    ref_mel = jax.random.normal(rng, (1, 8, 80))
    wav = vt(params, mel_src, pros, jnp.zeros((1,), jnp.int32), ref_mel)
    assert wav.shape[0] == 1 and np.isfinite(np.asarray(wav)).all()


def test_services_fallbacks_and_registry():
    services.clear()
    # fallback ASR: VAD segments with empty text
    wav = np.sin(np.linspace(0, 400 * np.pi, 22050)).astype(np.float32)
    out = services.asr_transcribe(wav, 22050)
    assert "segments" in out
    # register a fake whisper
    services.register("asr", lambda w, sr: {
        "segments": [{"start": 0.0, "end": 1.0, "text": "hello",
                      "avg_logprob": -0.1}]})
    out2 = services.asr_transcribe(wav, 22050)
    assert out2["segments"][0]["text"] == "hello"
    services.clear("asr")
    # separation fallback = identity
    assert np.allclose(services.separate_vocals(wav, 22050), wav)
    # negation heuristic
    assert services.nlp_negation("this is not fine")
    assert not services.nlp_negation("this is fine")
    # summarizer fallback
    s = services.summarize(["I love this wonderful day", "meh"])
    assert isinstance(s, str) and len(s) > 0


def test_synthesis_server_loudness_peak(pipe_params):
    pipe, params = pipe_params
    rng = np.random.default_rng(1)
    reqs = [SynthesisRequest(
        text_emb=rng.normal(size=(6, 16)).astype(np.float32),
        prosody=rng.normal(size=(6, 18)).astype(np.float32),
        emotion_probs=np.full(6, 1 / 6, np.float32),
        speaker=rng.normal(size=8).astype(np.float32),
        style_id=0)]
    kw = dict(max_batch=2, frames=8)
    w0 = SynthesisServer(CFG, params, **kw).serve_batch(reqs)[0]
    w1 = SynthesisServer(CFG, params, loudness_peak=0.3,
                         **kw).serve_batch(reqs)[0]
    np.testing.assert_allclose(float(np.abs(w1).max()), 0.3, rtol=1e-4)
    # pure rescale: waveshape preserved
    np.testing.assert_allclose(w1 / np.abs(w1).max(),
                               w0 / np.abs(w0).max(), atol=2e-2)
