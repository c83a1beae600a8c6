"""Unified-engine extras: validation cadence, resume, dp mesh training."""
import numpy as np
import jax
import pytest

from tests.test_train import tiny_cfg
from ttsx.core.config import TrainConfig, NovelConfig, to_dict, from_dict, TTSXConfig
from ttsx.data.synthetic import synthetic_batch, synthetic_stream
from ttsx.train import UnifiedTrainer


def cfg_with(**kw):
    base = to_dict(tiny_cfg())
    base["train"].update(kw)
    return from_dict(TTSXConfig, base)


def test_validation_and_noise_annealing(tmp_path):
    cfg = cfg_with(val_freq=2, checkpoint_freq=0, max_steps=4)
    val_batches = [synthetic_batch(cfg, 2, 4, seed=99, with_wav=False)]
    tr = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=5),
                        val_iter=None,
                        blocks=("acoustic", "refiner"),
                        checkpoint_dir=str(tmp_path))
    tr.val_iter = None
    # drive manually to attach a fresh val iterable each time
    first = synthetic_batch(cfg, 2, 4, seed=0, with_wav=False)
    tr.init_states(first)
    tr.train_step(first)
    tr.val_iter = list(val_batches)
    m = tr.validate()
    assert "val_l1" in m and np.isfinite(m["val_l1"])
    # novel: sde_noise_annealing tracked validation L1
    assert 0.05 <= tr.state.noise_scale <= 1.0
    assert 0.1 <= tr.state.l1_weight <= 1.0


def test_trainer_resume_roundtrip(tmp_path):
    cfg = cfg_with(val_freq=0, checkpoint_freq=0, max_steps=3)
    tr = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=4),
                        blocks=("acoustic",),
                        checkpoint_dir=str(tmp_path))
    tr.train(max_steps=2)
    assert tr.state.global_step == 2
    tr.save_checkpoint("last")

    tr2 = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=4),
                         blocks=("acoustic",),
                         checkpoint_dir=str(tmp_path))
    tr2.init_states(synthetic_batch(cfg, 2, 4, with_wav=False))
    assert tr2.restore_checkpoint("last")
    assert tr2.state.global_step == 2
    a = jax.tree_util.tree_leaves(tr.block_states["acoustic"].params)
    b = jax.tree_util.tree_leaves(tr2.block_states["acoustic"].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_engine_dp_mesh_step():
    from ttsx.parallel import make_dp_mesh
    cfg = cfg_with(val_freq=0, checkpoint_freq=0, max_steps=2)
    mesh = make_dp_mesh()
    tr = UnifiedTrainer(cfg, synthetic_stream(cfg, 8, 4, n=3),
                        blocks=("acoustic",), mesh=mesh)
    with mesh:
        state = tr.train(max_steps=2)
    assert state.global_step == 2


def test_engine_grad_accum():
    cfg = cfg_with(val_freq=0, checkpoint_freq=0, max_steps=2,
                   grad_accum_steps=2)
    tr = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=6),
                        blocks=("acoustic",))
    first = synthetic_batch(cfg, 2, 4, seed=0, with_wav=False)
    tr.init_states(first)
    m = tr.train_step(first)
    assert np.isfinite(m["acoustic/loss"])
    # a second accumulated step still has batches to consume
    m2 = tr.train_step(synthetic_batch(cfg, 2, 4, seed=7, with_wav=False))
    assert np.isfinite(m2["acoustic/loss"])
