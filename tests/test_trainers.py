"""Stage-1/stage-2 trainer tests (refenc + prosody)."""
import numpy as np
import jax
import jax.numpy as jnp

from ttsx.core.config import RefEncConfig, ProsodyConfig, S4Config, AudioConfig
from ttsx.train.refenc_trainer import RefEncTrainer
from ttsx.train.prosody_trainer import ProsodyTrainer

AU = AudioConfig(sample_rate=16000, n_fft=512, win_length=512,
                 hop_length=128, n_mels=40)


def _speaker_batches(n_batches=6, n_spk=4, m_utt=2, T=16, F=40, seed=0):
    """Separable synthetic speakers: distinct mel offsets."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(n_spk, F)) * 2
    for _ in range(n_batches):
        mels, labels = [], []
        for s in range(n_spk):
            for _ in range(m_utt):
                mels.append(protos[s] + rng.normal(size=(T, F)) * 0.3)
                labels.append(s)
        yield (np.stack(mels).astype(np.float32),
               np.asarray(labels, np.int64))


def test_refenc_arcface_training_reduces_loss_and_eer():
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32, num_speakers=4,
                       loss="arcface", lr=3e-3, warmup_steps=2,
                       total_steps=50, eval_every=0)
    tr = RefEncTrainer(cfg)
    losses = []
    state = None
    for mel, labels in _speaker_batches(10):
        mel, labels = jnp.asarray(mel), jnp.asarray(labels)
        if state is None:
            state = tr.init_state(jax.random.PRNGKey(0), mel)
        state, m = tr.train_step(state, mel, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    eer = tr.evaluate_eer(state, _speaker_batches(2, seed=1))
    assert eer < 0.45  # separable clusters must beat chance


def test_refenc_ge2e_step():
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32, loss="ge2e",
                       micro_batch=8, lr=1e-3, warmup_steps=2,
                       total_steps=50)
    tr = RefEncTrainer(cfg)
    mel, labels = next(_speaker_batches(1))
    state = tr.init_state(jax.random.PRNGKey(0), jnp.asarray(mel))
    state, m = tr.train_step(state, jnp.asarray(mel), jnp.asarray(labels))
    assert np.isfinite(float(m["loss"]))


def test_refenc_grad_accum_matches_scale():
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32, num_speakers=4,
                       loss="arcface", lr=1e-3, warmup_steps=2,
                       total_steps=50)
    tr = RefEncTrainer(cfg)
    mel, labels = next(_speaker_batches(1))
    mel, labels = jnp.asarray(mel), jnp.asarray(labels)
    state = tr.init_state(jax.random.PRNGKey(0), mel)
    mels = jnp.stack([mel, mel])       # A=2 identical micro-batches
    labs = jnp.stack([labels, labels])
    state2, m = tr.train_step_accum(state, mels, labs)
    assert np.isfinite(float(m["loss"]))


def test_prosody_trainer_loss_decreases():
    cfg = ProsodyConfig(audio=AU, cond_dim=32, n_layers=1,
                        s4=S4Config(heads=2, norm_groups=2, dropout=0.0))
    tr = ProsodyTrainer(cfg, lr=3e-3, warmup=2, total=100)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    mel = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    targets = {
        "f0": jnp.zeros((B, T)), "energy": jnp.zeros((B, T)),
        "pitch_var": jnp.zeros((B, T)), "speech_rate": jnp.zeros((B, 1)),
        "pause_dur": jnp.zeros((B, 1)), "mfcc": jnp.zeros((B, 13))}
    state = tr.init_state(jax.random.PRNGKey(0), mel)
    losses = []
    for _ in range(8):
        state, m = tr.train_step(state, mel, targets)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_prosody_targets_from_wav():
    cfg = ProsodyConfig(audio=AU)
    t = np.arange(8000) / AU.sample_rate
    wav = jnp.asarray(np.sin(2 * np.pi * 200 * t,
                             dtype=np.float32))[None]
    frames = 40
    targets = ProsodyTrainer.targets_from_wav(wav, cfg, frames)
    assert targets["f0"].shape == (1, frames)
    assert targets["mfcc"].shape == (1, 13)
    assert float(targets["pause_dur"][0, 0]) < 0.3  # mostly voiced tone


def test_prosody_parity_smoke_trained_beats_random():
    """The stage-2 parity experiment (parity_prosody.py) at toy scale:
    structure, finiteness, and trained val loss below the random-init
    baseline within a couple hundred steps."""
    from ttsx.eval.parity_prosody import prosody_parity
    r = prosody_parity(steps=150, frames=32, batch=8, n_speakers=3,
                       utts_train=4, utts_eval=2, cond_dim=32, n_layers=1)
    for k in ("val_loss", "val_loss_random_weights", "energy_pearson",
              "f0_pearson_voiced"):
        assert np.isfinite(r[k]), k
    assert r["val_loss"] < r["val_loss_random_weights"]
    # best-val selection: headline is the best curve point, never worse
    # than the endpoint, and the curve records every periodic eval
    assert r["val_loss"] <= r["val_loss_final"] + 1e-9
    assert r["eval_curve"] and r["eval_curve"][-1]["step"] == r["steps"]
    assert 1 <= r["best_val_step"] <= r["steps"]


def test_refenc_margin_warmup_schedule():
    """Margin ramps 0 -> arcface_margin over arcface_margin_warmup steps
    (reference loss.py:5-35 optional margin schedule)."""
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32, num_speakers=4,
                       loss="arcface", arcface_margin=0.3,
                       arcface_margin_warmup=10)
    tr = RefEncTrainer(cfg)
    assert float(tr._margin(jnp.asarray(0))) == 0.0
    assert abs(float(tr._margin(jnp.asarray(5))) - 0.15) < 1e-6
    assert abs(float(tr._margin(jnp.asarray(100))) - 0.3) < 1e-6
    # at margin 0 the loss is plain softmax-CE: still finite and trains
    mel, labels = next(_speaker_batches(1))
    state = tr.init_state(jax.random.PRNGKey(0), jnp.asarray(mel))
    state, m = tr.train_step(state, jnp.asarray(mel), jnp.asarray(labels))
    assert np.isfinite(float(m["loss"]))


def test_refenc_mixup_step():
    """Beta-mixup step (reference dataset.py:71-80): alpha=1 reduces to
    the plain step's loss; mixed alpha is finite and trains."""
    cfg = RefEncConfig(speaker_dim=32, ecapa_channels=32, num_speakers=4,
                       loss="arcface", lr=1e-3, warmup_steps=2,
                       total_steps=50)
    tr = RefEncTrainer(cfg)
    mel, labels = next(_speaker_batches(1))
    mel2 = mel[::-1].copy()
    labels2 = labels[::-1].copy()
    state = tr.init_state(jax.random.PRNGKey(0), jnp.asarray(mel))
    _, m_plain = tr.train_step(state, jnp.asarray(mel), jnp.asarray(labels))
    ones = jnp.ones((mel.shape[0],), jnp.float32)
    _, m_a1 = tr.train_step_mixup(state, jnp.asarray(mel), jnp.asarray(mel2),
                                  jnp.asarray(labels), jnp.asarray(labels2),
                                  ones)
    assert abs(float(m_a1["loss"]) - float(m_plain["loss"])) < 1e-4
    alpha = jnp.full((mel.shape[0],), 0.6, jnp.float32)
    state, m = tr.train_step_mixup(state, jnp.asarray(mel), jnp.asarray(mel2),
                                   jnp.asarray(labels), jnp.asarray(labels2),
                                   alpha)
    assert np.isfinite(float(m["loss"]))
