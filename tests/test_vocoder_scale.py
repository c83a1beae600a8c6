"""VocoderConfig.scale_cond: absolute-scale conditioning channel.

Round-2 root-cause finding: the generator conditioning carries no
absolute loudness cue (per-utterance-normalized mel, z-scored prosody
energy, c0-less cepstra), so trained generators plateau at rms_ratio
0.65-0.70. scale_cond feeds the per-utterance mel normalization stats
[mean || std] through a zero-init projection into the FiLM conditioning
(ttsx/models/vocoder.py Generator.scale_proj).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttsx.core.config import TTSXConfig, TrainConfig, VocoderConfig
from ttsx.models.vocoder import Generator

K = jax.random.PRNGKey(0)
B, T = 2, 16
VOC = VocoderConfig(hidden_dim=16, cond_dim=8, style_dim=16,
                    disc_ch_growth=2, upsample_factors=(4, 2),
                    scale_cond=True)


@pytest.fixture(scope="module")
def batch():
    ks = jax.random.split(K, 4)
    return {
        "mel": jax.random.normal(ks[0], (B, T, 80)),
        "prosody": jax.random.normal(ks[1], (B, T, 18)),
        "style": jax.random.normal(ks[2], (B, VOC.style_dim)),
        "emotion_probs": jax.nn.softmax(
            jax.random.normal(ks[3], (B, 6)), axis=-1),
        "mel_scale": jnp.concatenate(
            [jnp.full((B, 80), -3.0), jnp.full((B, 80), 1.7)], axis=-1),
    }


def test_scale_cond_zero_init_matches_scale_free(batch):
    """Fresh scale_cond params reproduce the scale-free forward exactly
    (zero kernel init), so enabling the channel never regresses an
    untrained model."""
    g_on = Generator(VOC)
    p_on = g_on.init(K, batch["mel"], batch["prosody"], batch["style"],
                     batch["emotion_probs"], scale=batch["mel_scale"])
    w_scaled = g_on.apply(p_on, batch["mel"], batch["prosody"],
                          batch["style"], batch["emotion_probs"],
                          scale=batch["mel_scale"])
    w_none = g_on.apply(p_on, batch["mel"], batch["prosody"],
                        batch["style"], batch["emotion_probs"])
    np.testing.assert_allclose(np.asarray(w_scaled), np.asarray(w_none),
                               atol=1e-6)
    assert "scale_proj" in p_on["params"]
    assert p_on["params"]["scale_proj"]["kernel"].shape == (160, VOC.cond_dim)


def _general_position(p, key, eps=0.01):
    """Init params + small noise: the Generator's FiLM projections AND
    scale_proj are zero-init, so at exact init NO conditioning reaches
    the output; cue-liveness must be tested at a perturbed point (the
    state training immediately moves to)."""
    leaves, treedef = jax.tree_util.tree_flatten(p)
    ks = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [l + eps * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, ks)])


def test_scale_cue_is_live_after_perturbation(batch):
    """At a general-position parameter point, changing the scale INPUT
    changes the waveform — the cue survives cond_norm (LayerNorm) and
    reaches the output."""
    g = Generator(VOC)
    p = g.init(K, batch["mel"], batch["prosody"], batch["style"],
               batch["emotion_probs"], scale=batch["mel_scale"])
    p2 = _general_position(p, jax.random.PRNGKey(2))
    w0 = g.apply(p2, batch["mel"], batch["prosody"], batch["style"],
                 batch["emotion_probs"], scale=batch["mel_scale"])
    w1 = g.apply(p2, batch["mel"], batch["prosody"], batch["style"],
                 batch["emotion_probs"], scale=2.0 * batch["mel_scale"])
    assert float(jnp.abs(w1 - w0).max()) > 1e-6


def test_scale_grad_flows(batch):
    """d(output)/d(scale_proj.kernel) is nonzero at a general-position
    point, so training can learn the absolute-scale mapping."""
    g = Generator(VOC)
    p = g.init(K, batch["mel"], batch["prosody"], batch["style"],
               batch["emotion_probs"], scale=batch["mel_scale"])
    p2 = _general_position(p, jax.random.PRNGKey(3))

    def amp(params):
        w = g.apply(params, batch["mel"], batch["prosody"], batch["style"],
                    batch["emotion_probs"], scale=batch["mel_scale"])
        return jnp.mean(jnp.abs(w))

    grads = jax.grad(amp)(p2)
    gk = grads["params"]["scale_proj"]["kernel"]
    assert float(jnp.abs(gk).max()) > 0.0


def test_slim_warm_start_into_scale_cond(tmp_path, batch):
    """A slim export written WITHOUT scale_cond warm-starts a
    scale_cond=True init: the missing scale_proj keeps its fresh zero
    init (allow_missing path), so the restored model reproduces the
    exported generator's forward exactly."""
    import dataclasses

    from ttsx.train.blocks import VocoderBlock
    from ttsx.train.slim_export import load_vocoder_slim, save_vocoder_slim

    hop = int(np.prod(VOC.upsample_factors))
    mb = {"mel": batch["mel"], "prosody": batch["prosody"],
          "emotion_probs": batch["emotion_probs"],
          "mel_scale": batch["mel_scale"],
          "wav": jax.random.normal(K, (B, T * hop, 1)) * 0.1}
    tr = TrainConfig(warmup_steps=2, max_steps=10, lr=1e-4)
    old = VocoderBlock(TTSXConfig(
        vocoder=dataclasses.replace(VOC, scale_cond=False), train=tr))
    old_states = old.init_state(jax.random.PRNGKey(1), mb)
    path = str(tmp_path / "voc_slim.npz")
    save_vocoder_slim(path, old_states)

    new = VocoderBlock(TTSXConfig(vocoder=VOC, train=tr))
    new_states = new.init_state(jax.random.PRNGKey(2), mb)
    new_states = load_vocoder_slim(path, new_states)
    kern = new_states.gen.params["params"]["scale_proj"]["kernel"]
    assert float(jnp.abs(kern).max()) == 0.0  # fresh zero init kept
    # compare against the OLD model restored through the same slim
    # roundtrip (save_slim stores big kernels float16, so the original
    # f32 params are not bit-comparable)
    old_rt = load_vocoder_slim(path, old_states)
    w_old = old._synthesize(old_rt.gen.params, old_rt.gst.params,
                            mb, rng=None, train=False)
    w_new = new._synthesize(new_states.gen.params, new_states.gst.params,
                            mb, rng=None, train=False)
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_old),
                               atol=1e-6)


def test_vocoder_block_train_steps_with_scale(batch):
    """One disc+gen step of the full VocoderBlock with mel_scale in the
    batch stays finite and updates scale_proj."""
    from ttsx.train.blocks import VocoderBlock

    cfg = TTSXConfig(
        vocoder=VOC,
        train=TrainConfig(warmup_steps=2, max_steps=10, lr=1e-4))
    hop = int(np.prod(VOC.upsample_factors))
    mb = {"mel": batch["mel"], "prosody": batch["prosody"],
          "emotion_probs": batch["emotion_probs"],
          "mel_scale": batch["mel_scale"],
          "wav": jax.random.normal(K, (B, T * hop, 1)) * 0.1}
    block = VocoderBlock(cfg)
    states = block.init_state(jax.random.PRNGKey(1), mb)
    k0 = states.gen.params["params"]["scale_proj"]["kernel"]
    # step 1 only moves the zero-init FiLM weights; scale_proj gets a
    # nonzero gradient from step 2 on (chain rule through FiLM)
    for _ in range(3):
        states, dm = block.disc_step(states, mb)
        states, gm = block.gen_step(states, mb)
        assert np.isfinite(float(dm["d_loss"]))
        assert np.isfinite(float(gm["g_loss"]))
    k1 = states.gen.params["params"]["scale_proj"]["kernel"]
    assert float(jnp.abs(k1 - k0).max()) > 0.0


# NOTE (round 4): the scale_gain direct output-gain head was killed after
# two failed training attempts (see VocoderConfig.scale_cond note); its
# tests were removed with the feature.


@pytest.mark.slow  # three GAN train-graph compiles (~4-6 min on 1 core)
def test_effective_steps_lineage_through_slim_warm_start(tmp_path):
    """Slim warm starts restart the optimizer counter at 0; the slim
    meta and checkpoint extra must carry cumulative `steps` so exports
    never under-report a checkpoint's true training age (VERDICT r4
    weak #3: zoo.json said 6000 while serving 18k-effective params)."""
    import dataclasses

    from ttsx.eval.parity_vocoder import _train_vocoder
    from ttsx.eval.parity import _tts_cfg
    from ttsx.train.slim_export import load_slim_meta

    cfg = dataclasses.replace(
        _tts_cfg(), vocoder=dataclasses.replace(
            VOC, scale_cond=False, disc_periods=(2,),
            disc_kernel_sizes=(15,), stft_sizes=(512,)))
    hop = int(np.prod(cfg.vocoder.upsample_factors))
    rng = np.random.default_rng(0)
    feats = {
        "mel": rng.normal(size=(4, T, 80)).astype(np.float32),
        "prosody": rng.normal(size=(4, T, 18)).astype(np.float32),
        "emotion_probs": np.full((4, 6), 1 / 6, np.float32),
        "wav": rng.normal(size=(4, T * hop, 1)).astype(np.float32) * 0.1,
    }
    sd = str(tmp_path / "ck")
    # run 1: fresh, 2 steps -> slim meta steps == 2
    _train_vocoder(cfg, feats, 2, batch=2, seed=0, save_dir=sd)
    assert int(load_slim_meta(f"{sd}_slim.npz")["steps"]) == 2
    # simulate a round boundary: the Orbax tree dies, slim survives
    import shutil
    shutil.rmtree(sd)
    # run 2: slim warm start + 3 fresh counter steps -> 5 effective
    _, _, _, tail = _train_vocoder(cfg, feats, 3, batch=2, seed=0,
                                   save_dir=sd)
    assert tail["effective_steps"] == 5
    assert int(load_slim_meta(f"{sd}_slim.npz")["steps"]) == 5
    # run 3: Orbax resume (counter 3 -> 4) keeps the lineage
    _, _, _, tail = _train_vocoder(cfg, feats, 4, batch=2, seed=0,
                                   save_dir=sd)
    assert tail["effective_steps"] == 6
    assert int(load_slim_meta(f"{sd}_slim.npz")["steps"]) == 6
