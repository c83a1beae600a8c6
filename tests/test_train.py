import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ttsx.core.config import (
    TTSXConfig, AcousticConfig, RefinerConfig, VocoderConfig, S4Config,
    TrainConfig)
from ttsx.data.synthetic import synthetic_batch, synthetic_stream
from ttsx.train import (
    AcousticBlock, RefinerBlock, VocoderBlock, UnifiedTrainer, JSONLLogger)

import jax
import jax.numpy as jnp


def tiny_cfg():
    s4 = S4Config(heads=2, norm_groups=2, causal=True, dropout=0.0)
    return TTSXConfig(
        acoustic=AcousticConfig(text_emb_dim=16, hidden_channels=16,
                                conformer_layers=1, transformer_dim=32,
                                num_layers=1, attention_heads=2,
                                speaker_dim=8),
        refiner=RefinerConfig(levels=1, cond_dim=16, hidden_channels=16,
                              hsf_hidden=8, style_dim=8, beta_hidden=8,
                              s4=s4, sde_steps=2,
                              # tiny codebook: a 3x512-code RVQ can't
                              # organize in a 40-step smoke test
                              vq_dims=(80,), vq_codes=(16,)),
        vocoder=VocoderConfig(hidden_dim=16, cond_dim=8, style_dim=16,
                              disc_ch_growth=2,
                              # compile-cost diet (VERDICT r4 #3):
                              # fewer disc programs/STFT resolutions
                              disc_periods=(2, 3),
                              disc_kernel_sizes=(15,),
                              stft_sizes=(512,)),
        train=TrainConfig(warmup_steps=2, max_steps=8, val_freq=0,
                          checkpoint_freq=0, lr=1e-3),
    )


CFG = tiny_cfg()


def test_acoustic_block_loss_decreases():
    batch = synthetic_batch(CFG, batch=2, frames=8, with_wav=False)
    block = AcousticBlock(CFG)
    state = block.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(5):
        state, out = block.train_step(state, batch)
        losses.append(float(out["metrics"]["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_refiner_block_step():
    batch = synthetic_batch(CFG, batch=2, frames=8, with_wav=False)
    block = RefinerBlock(CFG)
    state = block.init_state(jax.random.PRNGKey(0), batch)
    mel_pred = jnp.asarray(batch["mel"]) + 0.1
    state, out = block.train_step(state, batch, mel_pred,
                                  jnp.asarray(0.5), jnp.asarray(1.0))
    assert np.isfinite(float(out["metrics"]["loss"]))
    v = block.val_step(state.params, batch, mel_pred)
    assert np.isfinite(float(v["val_l1"]))


def test_sde_score_points_toward_clean_data():
    """Regression for the round-1 inverted score target (ADVICE high #1):
    after training with the SDE term active, one Euler–Maruyama pass from a
    noised start must move toward the target, not away from it."""
    import dataclasses
    from ttsx.models.refiner import sde_sample
    # the shared CFG's LR schedule decays over max_steps=8 — this test
    # actually trains, so it needs a schedule covering its step budget
    # (the zero-init delta_gate must have time to grow)
    cfg = dataclasses.replace(
        CFG, train=TrainConfig(warmup_steps=10, max_steps=200, val_freq=0,
                               checkpoint_freq=0, lr=5e-3))
    batch = synthetic_batch(cfg, batch=2, frames=8, with_wav=False)
    block = RefinerBlock(cfg)
    state = block.init_state(jax.random.PRNGKey(0), batch)
    mel_pred = jnp.asarray(batch["mel"])  # clean input -> pure denoising
    for _ in range(150):
        state, out = block.train_step(state, batch, mel_pred,
                                      jnp.asarray(0.5), jnp.asarray(0.5))
    assert np.isfinite(float(out["metrics"]["loss"]))
    rng = jax.random.PRNGKey(1)
    x0 = mel_pred + jax.random.normal(rng, mel_pred.shape) * 0.5
    x = sde_sample(block.model, state.params, x0,
                   jnp.asarray(batch["prosody"]),
                   jnp.asarray(batch["style_id"]),
                   jnp.asarray(batch["text_emb"]), rng)
    d0 = float(jnp.mean(jnp.abs(x0 - batch["mel"])))
    d1 = float(jnp.mean(jnp.abs(x - batch["mel"])))
    assert d1 < d0


def test_stft_filterbank_frozen():
    """The STFT-loss filterbank must never be optimized (ADVICE high #2:
    descending it with G collapses the spectral objective to zero)."""
    batch = synthetic_batch(CFG, batch=2, frames=4)
    block = VocoderBlock(CFG)
    states = block.init_state(jax.random.PRNGKey(0), batch)
    before = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(states.stft.params)]
    for _ in range(3):
        states, _ = block.gen_step(states, batch)
    after = jax.tree_util.tree_leaves(states.stft.params)
    for x, y in zip(before, after):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_validate_without_acoustic_and_oneshot_val_iter():
    """Regression for ADVICE medium: refiner-only validate() must not
    KeyError, and a one-shot generator val_iter must survive a second
    validation pass."""
    stream = synthetic_stream(CFG, batch=2, frames=8, n=4)
    val_gen = (synthetic_batch(CFG, batch=2, frames=8, with_wav=False)
               for _ in range(2))
    tr = UnifiedTrainer(CFG, stream, val_iter=val_gen, blocks=("refiner",))
    batch = synthetic_batch(CFG, batch=2, frames=8, with_wav=False)
    tr.init_states(batch)
    m1 = tr.validate()
    m2 = tr.validate()
    assert np.isfinite(m1["val_l1"])
    assert np.isfinite(m2["val_l1"])


def test_vocoder_block_gan_steps():
    batch = synthetic_batch(CFG, batch=2, frames=4)
    block = VocoderBlock(CFG)
    states = block.init_state(jax.random.PRNGKey(0), batch)
    states, dm = block.disc_step(states, batch)
    states, gm = block.gen_step(states, batch)
    assert np.isfinite(float(dm["d_loss"]))
    assert np.isfinite(float(gm["g_loss"]))
    assert "energy" not in gm  # lambda_energy defaults off
    # EMA params tracked on generator
    assert states.gen.ema_params is not None


def test_vocoder_energy_loss_opt_in():
    import dataclasses
    cfg = dataclasses.replace(
        CFG, vocoder=dataclasses.replace(CFG.vocoder, lambda_energy=1.0))
    batch = synthetic_batch(cfg, batch=2, frames=4)
    block = VocoderBlock(cfg)
    states = block.init_state(jax.random.PRNGKey(0), batch)
    states, gm = block.gen_step(states, batch)
    assert np.isfinite(float(gm["energy"]))


def test_vocoder_quality_checkpoint_resume(tmp_path):
    """The parity harness's cumulative-step resume: a second run at the
    same step target restores the Orbax checkpoint and trains 0 extra
    steps (identical params); a higher target trains only the delta."""
    from ttsx.eval.parity_e2e import _train_vocoder
    feats = synthetic_batch(CFG, batch=4, frames=4)
    _, s1, _, _ = _train_vocoder(CFG, feats, 2, 2, 0,
                                 save_dir=str(tmp_path))
    _, s2, _, _ = _train_vocoder(CFG, feats, 2, 2, 0,
                                 save_dir=str(tmp_path))
    a = jax.tree_util.tree_leaves(s1.gen.params)
    b = jax.tree_util.tree_leaves(s2.gen.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    _, s3, _, _ = _train_vocoder(CFG, feats, 3, 2, 0,
                                 save_dir=str(tmp_path))
    c = jax.tree_util.tree_leaves(s3.gen.params)
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(b, c))


def test_unified_trainer_runs(tmp_path):
    stream = synthetic_stream(CFG, batch=2, frames=4, n=6)
    logger = JSONLLogger(str(tmp_path / "log.jsonl"), every=1)
    tr = UnifiedTrainer(CFG, stream, callbacks=[logger],
                        checkpoint_dir=str(tmp_path / "ckpt"))
    state = tr.train(max_steps=3)
    assert state.global_step == 3
    assert (tmp_path / "log.jsonl").exists()
    # checkpoint written on final save
    assert (tmp_path / "ckpt" / "final" / "meta.json").exists()


def test_checkpoint_roundtrip(tmp_path):
    from ttsx.train.checkpoint import save_checkpoint, restore_checkpoint
    batch = synthetic_batch(CFG, batch=2, frames=8, with_wav=False)
    block = AcousticBlock(CFG)
    state = block.init_state(jax.random.PRNGKey(0), batch)
    state, _ = block.train_step(state, batch)
    save_checkpoint(str(tmp_path), "best", {"acoustic": state}, 7,
                    extra={"best_val": 0.5})
    fresh = block.init_state(jax.random.PRNGKey(1), batch)
    restored, step, extra = restore_checkpoint(str(tmp_path), "best",
                                               {"acoustic": fresh})
    assert step == 7
    assert extra["best_val"] == 0.5
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored["acoustic"].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_dynamic_gan_ratio():
    tr = UnifiedTrainer(CFG, iter([]), blocks=())
    tr.state.d_loss_ema, tr.state.g_loss_ema = 3.0, 1.0
    assert tr._dynamic_d_steps() == 2
    tr.state.d_loss_ema, tr.state.g_loss_ema = 0.1, 1.0
    assert tr._dynamic_d_steps() == 1
    tr.state.d_loss_ema, tr.state.g_loss_ema = 1.0, 1.0
    assert tr._dynamic_d_steps() == CFG.train.gan_d_steps


def test_acoustic_parity_resume(tmp_path):
    """acoustic_parity(save_dir=...) resumes from its Orbax checkpoint
    instead of retraining (the e2e-leg budget-kill protection)."""
    from ttsx.eval.parity import acoustic_parity

    d = str(tmp_path / "ck")
    acoustic_parity(n_speakers=4, utts_train=4, utts_eval=4, frames=32,
                    steps=3, batch=4, save_dir=d)
    import json, pathlib
    meta = json.loads(
        (pathlib.Path(d) / "acoustic/meta.json").read_text())
    assert meta["step"] == 3
    r = acoustic_parity(n_speakers=4, utts_train=4, utts_eval=4,
                        frames=32, steps=5, batch=4, save_dir=d)
    meta = json.loads(
        (pathlib.Path(d) / "acoustic/meta.json").read_text())
    assert meta["step"] == 5
    assert np.isfinite(r["mcd_db"])
