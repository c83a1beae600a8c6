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


def test_observer_pre_forward_hook(tmp_path):
    """Observer.pre_forward(stage, batch) is applied per stage in train
    AND validation (ref loop.py:63,115,165-169 + trainer.py:51-52)."""
    from ttsx.train.observer import Observer

    seen = []

    def spy(stage, batch):
        seen.append(stage)
        return batch

    cfg = cfg_with(val_freq=0, checkpoint_freq=0, max_steps=2,
                   vocoder_freeze_until=0, grad_accum_steps=1,
                   refiner_update_freq=1)
    obs = Observer(spy, policy={"stages": ["acoustic", "refiner"]})
    tr = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=3),
                        blocks=("acoustic", "refiner"), observer=obs)
    first = synthetic_batch(cfg, 2, 4, seed=0, with_wav=False)
    tr.init_states(first)
    tr.train_step(first)
    assert seen == ["acoustic", "refiner"]
    # policy gating: refiner-only observer skips the acoustic stage
    seen.clear()
    tr.observer = Observer(spy, policy={"stages": ["refiner"]})
    tr.train_step(synthetic_batch(cfg, 2, 4, seed=1, with_wav=False))
    assert seen == ["refiner"]
    # validation path applies it too (training=False)
    seen.clear()
    tr.observer = Observer(spy)
    tr.val_iter = [synthetic_batch(cfg, 2, 4, seed=2, with_wav=False)]
    tr.validate()
    assert seen == ["acoustic", "refiner"]
    # a hook that transforms the batch actually changes the step: zeroing
    # mel changes the acoustic loss vs an identity run
    def zero_mel(stage, batch):
        return {**batch, "mel": batch["mel"] * 0}

    tr2 = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=3),
                         blocks=("acoustic",),
                         observer=Observer(zero_mel))
    tr3 = UnifiedTrainer(cfg, synthetic_stream(cfg, 2, 4, n=3),
                         blocks=("acoustic",))
    b = synthetic_batch(cfg, 2, 4, seed=3, with_wav=False)
    tr2.init_states(b)
    tr3.init_states(b)
    m2 = tr2.train_step(b)
    m3 = tr3.train_step(b)
    assert m2["acoustic/loss"] != m3["acoustic/loss"]
    # a raising hook is contained and counted, not fatal
    def boom(stage, batch):
        raise RuntimeError("observer bug")

    tr3.observer = Observer(boom)
    tr3.train_step(synthetic_batch(cfg, 2, 4, seed=4, with_wav=False))
    assert tr3.observer.errors >= 1


def test_observer_module_path_resolution():
    """'module:attr' target resolution (the reference's module_path)."""
    from ttsx.train.observer import Observer
    obs = Observer("operator:itemgetter")  # any callable resolves
    assert callable(obs.fn)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Observer("no-colon-path")
