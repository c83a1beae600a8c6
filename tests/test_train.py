import numpy as np
import pytest

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
                              s4=s4, sde_steps=2),
        vocoder=VocoderConfig(hidden_dim=16, cond_dim=8, style_dim=16),
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


def test_vocoder_block_gan_steps():
    batch = synthetic_batch(CFG, batch=2, frames=4)
    block = VocoderBlock(CFG)
    states = block.init_state(jax.random.PRNGKey(0), batch)
    states, dm = block.disc_step(states, batch)
    states, gm = block.gen_step(states, batch)
    assert np.isfinite(float(dm["d_loss"]))
    assert np.isfinite(float(gm["g_loss"]))
    # EMA params tracked on generator
    assert states.gen.ema_params is not None


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
