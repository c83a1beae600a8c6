import numpy as np
import jax
import jax.numpy as jnp

from ttsx.train.emotion_trainer import EmotionTrainer


def test_emotion_trainer_learns():
    tr = EmotionTrainer()
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vader = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    pvec = jnp.asarray(rng.normal(size=(8, 19)).astype(np.float32))
    targets = jnp.asarray((rng.random((8, 6)) > 0.7).astype(np.float32))
    losses = []
    for _ in range(10):
        state, m = tr.train_step(state, vader, pvec, targets)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    probs = tr.predict(state.params, vader, pvec)
    assert probs.shape == (8, 6)
    assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()
