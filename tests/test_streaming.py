import numpy as np
import jax
import pytest

from tests.test_serve import tiny_cfg
from ttsx.models.pipeline import TTSPipeline
from ttsx.streaming import StreamingSynthesizer

CFG = tiny_cfg()


def test_streaming_matches_length_and_finite():
    pipe = TTSPipeline(CFG)
    params = pipe.init_params(jax.random.PRNGKey(0), batch=1, frames=8)
    ss = StreamingSynthesizer(CFG, params, chunk_frames=8, overlap_frames=2)
    rng = np.random.default_rng(0)
    T = 20  # 3 chunks with overlap
    text = rng.normal(size=(1, T, 16)).astype(np.float32)
    pros = rng.normal(size=(1, T, 18)).astype(np.float32)
    emo = np.full((1, 6), 1 / 6, np.float32)
    spk = rng.normal(size=(1, 8)).astype(np.float32)
    sid = np.zeros((1,), np.int32)
    wav = ss.synthesize(text, pros, emo, spk, sid)
    assert wav.shape == (1, T * ss.hop)
    assert np.isfinite(wav).all()
    # seams must not leave silent gaps: every sample got weight
    assert (np.abs(wav).max(axis=0) >= 0).all()


def test_streaming_single_chunk_equivalent():
    pipe = TTSPipeline(CFG)
    params = pipe.init_params(jax.random.PRNGKey(0), batch=1, frames=8)
    ss = StreamingSynthesizer(CFG, params, chunk_frames=8, overlap_frames=2)
    rng = np.random.default_rng(1)
    T = 8
    text = rng.normal(size=(1, T, 16)).astype(np.float32)
    pros = rng.normal(size=(1, T, 18)).astype(np.float32)
    emo = np.full((1, 6), 1 / 6, np.float32)
    spk = rng.normal(size=(1, 8)).astype(np.float32)
    sid = np.zeros((1,), np.int32)
    wav = ss.synthesize(text, pros, emo, spk, sid)
    import jax.numpy as jnp
    direct = np.asarray(pipe.synthesize(
        params, jnp.asarray(text), jnp.asarray(pros), jnp.asarray(emo),
        jnp.asarray(spk), jnp.asarray(sid)).wav)[:, :, 0]
    np.testing.assert_allclose(wav, direct, atol=1e-4)
