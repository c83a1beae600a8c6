"""Slim (inference-only) export round-trip: the git-trackable npz that
lets trained vocoder weights survive round boundaries (the full Orbax
trees are gitignored and die with each fresh clone)."""
import numpy as np
import jax

from ttsx.data.synthetic import synthetic_batch
from ttsx.train import VocoderBlock
from ttsx.train.slim_export import (load_slim, load_vocoder_slim, save_slim,
                                    save_vocoder_slim)

from test_train import tiny_cfg


def test_slim_roundtrip_generic(tmp_path):
    tree = {"a": np.arange(2048, dtype=np.float32).reshape(64, 32) / 7,
            "b": {"w": np.ones((3,), np.float32),
                  "i": np.arange(5, dtype=np.int32)}}
    path = str(tmp_path / "slim.npz")
    save_slim(path, {"t": tree})
    got = load_slim(path, {"t": tree})["t"]
    # big float leaf goes through f16: exact to f16 resolution
    np.testing.assert_allclose(got["a"], tree["a"], rtol=1e-3)
    assert got["a"].dtype == np.float32
    # small float + int leaves are exact
    np.testing.assert_array_equal(got["b"]["w"], tree["b"]["w"])
    np.testing.assert_array_equal(got["b"]["i"], tree["b"]["i"])


def test_vocoder_slim_restores_synthesis(tmp_path):
    cfg = tiny_cfg()
    batch = synthetic_batch(cfg, batch=2, frames=8, with_wav=True)
    block = VocoderBlock(cfg)
    states = block.init_state(jax.random.PRNGKey(0), batch)
    # perturb so the export differs from a fresh init
    for _ in range(2):
        states, _ = block.disc_step(states, batch)
        states, _ = block.gen_step(states, batch)
    path = str(tmp_path / "voc_slim.npz")
    save_vocoder_slim(path, states, meta={"steps": 2})

    fresh = block.init_state(jax.random.PRNGKey(1), batch)
    restored = load_vocoder_slim(path, fresh)
    mb = {"mel_ref": batch["mel"], "prosody": batch["prosody"],
          "emotion_probs": batch["emotion_probs"]}
    gen_p = (states.gen.ema_params if states.gen.ema_params is not None
             else states.gen.params)
    gen_r = (restored.gen.ema_params
             if restored.gen.ema_params is not None
             else restored.gen.params)
    want = np.asarray(block._synthesize(gen_p, states.gst.params, mb,
                                        rng=None, train=False))
    got = np.asarray(block._synthesize(gen_r, restored.gst.params, mb,
                                       rng=None, train=False))
    # f16 storage of conv kernels: synthesis matches to ~1e-2 absolute
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert float(np.abs(want).max()) > 0


def test_zoo_loads_pipeline(tmp_path):
    import jax.numpy as jnp

    from ttsx import zoo
    from ttsx.models.pipeline import TTSPipeline
    from ttsx.train.slim_export import save_slim

    cfg = tiny_cfg()
    # empty zoo: fresh init, all three stages reported missing
    pipe, params = zoo.load_pipeline(cfg, zoo_dir=str(tmp_path), frames=8)
    assert set(params.pop("_missing")) == {"acoustic", "refiner", "vocoder"}
    assert zoo.zoo_info(str(tmp_path)) == {}

    # export a "trained" zoo (params from a differently-seeded pipeline)
    src = TTSPipeline(cfg).init_params(jax.random.PRNGKey(3), frames=8)
    save_slim(str(tmp_path / "acoustic.npz"), {"acoustic": src["acoustic"]})
    save_slim(str(tmp_path / "refiner.npz"), {"refiner": src["refiner"]})
    save_slim(str(tmp_path / "vocoder.npz"),
              {"gen_ema": src["generator"], "gst": src["gst"]})
    (tmp_path / "zoo.json").write_text('{"steps": 1}')

    pipe, params = zoo.load_pipeline(cfg, zoo_dir=str(tmp_path), frames=8)
    assert params.pop("_missing") == []
    assert zoo.zoo_info(str(tmp_path)) == {"steps": 1}
    B, T = 1, 8
    out = pipe.synthesize(params, jnp.ones((B, T, 16)) * .1,
                          jnp.zeros((B, T, 18)), jnp.ones((B, 6)) / 6,
                          jnp.ones((B, 8)) * .3, jnp.zeros((B,), jnp.int32))
    want = pipe.synthesize(src, jnp.ones((B, T, 16)) * .1,
                           jnp.zeros((B, T, 18)), jnp.ones((B, 6)) / 6,
                           jnp.ones((B, 8)) * .3,
                           jnp.zeros((B,), jnp.int32))
    np.testing.assert_allclose(np.asarray(out.wav), np.asarray(want.wav),
                               atol=2e-2)


def test_load_slim_meta_roundtrip(tmp_path):
    from ttsx.train.slim_export import load_slim_meta, save_slim
    path = str(tmp_path / "m.npz")
    save_slim(path, {"_meta": {"steps": np.asarray(42),
                               "mel_scale_mean": np.arange(4.0)},
                     "t": {"w": np.zeros(3, np.float32)}})
    meta = load_slim_meta(path)
    assert set(meta) == {"steps", "mel_scale_mean"}
    assert int(meta["steps"]) == 42
    np.testing.assert_array_equal(meta["mel_scale_mean"], np.arange(4.0))
    # an export without meta -> empty dict
    save_slim(str(tmp_path / "n.npz"), {"t": {"w": np.zeros(2)}})
    assert load_slim_meta(str(tmp_path / "n.npz")) == {}
