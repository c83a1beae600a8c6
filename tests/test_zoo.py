"""Zoo round-trip: slim exports -> load_pipeline/serve_from_zoo.

The zoo is the rebuild's pretrained-weights story (the reference ships
none — SURVEY §5.4): a fresh clone must be able to build a serving
stack, including the scale-conditioned vocoder's serving-time stats,
from the git-tracked npz exports alone.
"""
import dataclasses
import json

import numpy as np
import jax
import pytest

from ttsx.core.config import (
    TTSXConfig, AcousticConfig, RefinerConfig, VocoderConfig, S4Config)
from ttsx.models.pipeline import TTSPipeline
from ttsx.zoo import load_pipeline, serve_from_zoo, zoo_info


def tiny_cfg(**voc):
    s4 = S4Config(heads=2, norm_groups=2, causal=True, dropout=0.0)
    return TTSXConfig(
        acoustic=AcousticConfig(text_emb_dim=16, hidden_channels=16,
                                conformer_layers=1, transformer_dim=32,
                                num_layers=1, attention_heads=2,
                                speaker_dim=8),
        refiner=RefinerConfig(levels=1, cond_dim=16, hidden_channels=16,
                              hsf_hidden=8, style_dim=8, beta_hidden=8,
                              s4=s4, sde_steps=2),
        vocoder=VocoderConfig(hidden_dim=16, cond_dim=8, style_dim=16,
                              disc_ch_growth=2, **voc))


def _write_zoo(zd, cfg, params, meta=None, overrides=None):
    from ttsx.train.slim_export import save_slim
    zd.mkdir(parents=True, exist_ok=True)
    save_slim(str(zd / "acoustic.npz"), {"acoustic": params["acoustic"]})
    save_slim(str(zd / "refiner.npz"), {"refiner": params["refiner"]})
    voc = {"gen_ema": params["generator"], "gst": params["gst"]}
    if meta:
        voc["_meta"] = {k: np.asarray(v) for k, v in meta.items()}
    save_slim(str(zd / "vocoder.npz"), voc)
    (zd / "zoo.json").write_text(json.dumps(
        {"vocoder_overrides": overrides or {}}))


def test_serve_from_zoo_wires_scale_stats(tmp_path):
    cfg = tiny_cfg(scale_cond=True)
    pipe = TTSPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), batch=1, frames=8)
    stats = np.linspace(-3.0, 1.7, 2 * cfg.vocoder.channels
                        ).astype(np.float32)
    zd = tmp_path / "zoo"
    _write_zoo(zd, cfg, params, meta={"mel_scale_mean": stats},
               overrides={"scale_cond": True})

    srv = serve_from_zoo(zoo_dir=str(zd), cfg=cfg, max_batch=1, frames=8,
                         bf16=False)
    # the vocoder export's meta reaches the server untouched
    np.testing.assert_allclose(srv.scale_stats, stats)

    from ttsx.serve import SynthesisRequest
    rng = np.random.default_rng(0)
    wavs = srv.serve_batch([SynthesisRequest(
        text_emb=rng.normal(size=(6, 16)).astype(np.float32),
        prosody=rng.normal(size=(6, 18)).astype(np.float32),
        emotion_probs=np.full(6, 1 / 6, np.float32),
        speaker=rng.normal(size=8).astype(np.float32),
        style_id=0)])
    assert np.isfinite(wavs[0]).all()


def test_serve_from_zoo_requires_stats_for_scale_models(tmp_path):
    cfg = tiny_cfg(scale_cond=True)
    pipe = TTSPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), batch=1, frames=8)
    zd = tmp_path / "zoo"
    _write_zoo(zd, cfg, params)  # no mel_scale_mean meta
    with pytest.raises(ValueError, match="scale_stats"):
        serve_from_zoo(zoo_dir=str(zd), cfg=cfg, max_batch=1, frames=8,
                       bf16=False)


def test_load_pipeline_reports_missing_and_reads_overrides(tmp_path):
    cfg = tiny_cfg()
    zd = tmp_path / "empty_zoo"
    zd.mkdir()
    (zd / "zoo.json").write_text(json.dumps(
        {"vocoder_overrides": {"scale_cond": True, "not_a_field": 1}}))
    pipe, params = load_pipeline(cfg=cfg, zoo_dir=str(zd))
    assert set(params["_missing"]) == {"acoustic", "refiner", "vocoder"}
    assert zoo_info(str(zd))["vocoder_overrides"]["scale_cond"] is True


CHECKED_IN_ZOO = json.loads(
    (__import__("pathlib").Path(__file__).parent.parent
     / "eval_results/zoo/zoo.json").read_text()) \
    if (__import__("pathlib").Path(__file__).parent.parent
        / "eval_results/zoo/zoo.json").exists() else None


@pytest.mark.skipif(CHECKED_IN_ZOO is None,
                    reason="eval_results/zoo not exported yet")
def test_checked_in_zoo_serves_nonsilent_audio():
    """zoo.py's own contract (zoo.py:4-9): a fresh clone synthesizes
    with trained weights — every stage restored (no _missing), non-silent
    finite audio out (VERDICT r3 next #7)."""
    from ttsx.serve import SynthesisRequest

    pipe, params = load_pipeline()
    assert params["_missing"] == []
    srv = serve_from_zoo(max_batch=1, frames=64, bf16=False)
    T = 64
    rng = np.random.default_rng(0)
    req = SynthesisRequest(
        text_emb=rng.normal(size=(T, pipe.cfg.acoustic.text_emb_dim)
                            ).astype(np.float32),
        prosody=rng.normal(size=(T, 18)).astype(np.float32),
        emotion_probs=np.full(6, 1 / 6, np.float32),
        speaker=rng.normal(size=pipe.cfg.acoustic.speaker_dim
                           ).astype(np.float32),
        style_id=0)
    wav = srv.serve_batch([req])[0]
    assert np.isfinite(wav).all()
    assert float(np.abs(wav).max()) > 1e-3, "zoo synthesis is silent"


def test_offline_dump_reproduces_hard_diarizer_der():
    """Fresh-clone reproduction of the diarizer_hard result (VERDICT r4
    #5): the checked-in embedding dump + the production offline
    clustering recipe must land at the recorded DER (0.179 strict /
    0.058 collar) without any TPU retraining."""
    from ttsx.pipeline.diarizer.offline import evaluate_dump
    dump = (__import__("pathlib").Path(__file__).parent.parent
            / "eval_results/diar_embs.npz")
    if not dump.exists():
        pytest.skip("diar_embs.npz not checked in")
    r = evaluate_dump(str(dump))
    assert r["der"] <= 0.20, r
    assert r["der_collar"] <= 0.08, r


def test_aux_zoo_exports_roundtrip(tmp_path):
    """refenc / prosody / diar-encoder slim exports load back through
    the zoo loaders and produce working forwards (zoo 5/5 story)."""
    from ttsx.eval.parity_refenc import refenc_parity
    from ttsx.eval.parity_prosody import prosody_parity
    from ttsx.eval.parity_diar import _train_slice_encoder
    from ttsx.eval.parity_common import AUDIO, make_corpus
    from ttsx.zoo import load_refenc, load_prosody, load_diar_encoder

    refenc_parity(n_speakers=4, utts_train=2, utts_eval=2, frames=64,
                  steps=2, batch=4,
                  export_slim=str(tmp_path / "refenc.npz"))
    trainer, params = load_refenc(str(tmp_path), frames=64)
    assert trainer is not None
    emb = np.asarray(trainer.embed(
        params, np.zeros((1, 64, AUDIO.n_mels), np.float32)))
    assert np.isfinite(emb).all()

    prosody_parity(steps=2, frames=64, batch=4, n_speakers=4,
                   utts_train=4, utts_eval=2,
                   export_slim=str(tmp_path / "prosody.npz"))
    ptr, pparams = load_prosody(str(tmp_path), frames=64)
    assert ptr is not None

    corpus = make_corpus("tone", n_speakers=4, audio=AUDIO, seed=0)
    _train_slice_encoder(corpus, frames=64, utts=2, steps=2, batch=4,
                         export_slim=str(tmp_path / "diar_encoder.npz"))
    se = load_diar_encoder(str(tmp_path), frames=64)
    assert se is not None
    # absent exports return None-tuples, not exceptions
    assert load_refenc(str(tmp_path / "nope")) == (None, None)
    assert load_diar_encoder(str(tmp_path / "nope")) is None


def test_checked_in_diar_encoder_loads_and_embeds():
    """The committed zoo diar_encoder.npz restores into a working
    SliceEmbedder (fresh-clone diarizer story, VERDICT r4 #5)."""
    from ttsx.zoo import DEFAULT_ZOO, load_diar_encoder
    if not (DEFAULT_ZOO / "diar_encoder.npz").exists():
        pytest.skip("diar_encoder.npz not exported yet")
    se = load_diar_encoder()
    assert se is not None
    sr = 16000
    wav = np.random.default_rng(0).normal(size=4 * sr).astype(np.float32)
    embs = se.extract(wav, [(0.2, 1.4), (1.6, 3.0)])
    assert embs.shape[0] == 2
    assert np.isfinite(embs).all()
