"""Learned overlap screen for the diarizer.

The reference gates overlap candidates through a tiny trained CNN
(reference_encoder/hyper_diarizer/overlap.py:18-33, Conv1d->pool->fc on
raw audio) — but ships no weights and falls back to a RANDOM init.
This is the trained version, jax-native: a small conv stack over
per-window z-scored log-mel (z-scoring kills the loudness shortcut —
overlapped speech is trivially louder, which would not survive gain
variation in the wild), trained on synthetic two-speaker mixtures from
the same corpus family the diarizer benchmarks run on.

Use: params = train_overlap_net(corpus, audio); then
OverlapScreen(audio, params) is a callable wav-window -> P(overlap)
accepted by detect_overlaps(screen=...).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ttsx.core.config import AudioConfig

WINDOW_FRAMES = 32  # ~0.37 s at hop 256 / sr 22050 — junction-sized


def _znorm(mel: np.ndarray) -> np.ndarray:
    m = mel.mean(axis=(-2, -1), keepdims=True)
    s = mel.std(axis=(-2, -1), keepdims=True) + 1e-5
    return ((mel - m) / s).astype(np.float32)


class OverlapNet:
    """Tiny conv classifier over [B, W, M] z-scored log-mel windows."""

    def __init__(self, hidden: int = 32):
        import flax.linen as nn

        class _Net(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, mel):
                x = nn.Conv(self.hidden, (3,))(mel)
                x = nn.relu(x)
                x = nn.max_pool(x, (2,), strides=(2,))
                x = nn.Conv(self.hidden, (3,))(x)
                x = nn.relu(x)
                x = x.mean(axis=1)
                return nn.Dense(1)(x)[..., 0]  # logits

        self.module = _Net(hidden)

    def init(self, rng, mel):
        return self.module.init(rng, mel)

    def apply(self, params, mel):
        return self.module.apply(params, mel)


def make_overlap_windows(corpus, audio: AudioConfig, n: int,
                         seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """n positive (two-speaker mixture) + n negative (single-speaker)
    log-mel windows, random per-window gain on both classes."""
    import jax.numpy as jnp
    from ttsx.dsp import mel_spectrogram

    rng = np.random.default_rng(seed)
    hop = audio.hop_length
    W = WINDOW_FRAMES
    wavs, labels = [], []
    for i in range(2 * n):
        pos = i < n
        a = int(rng.integers(0, corpus.n_speakers))
        wav = corpus.utterance(a, W, rng).wav[:W * hop]
        if pos:
            b = int(rng.choice([s for s in range(corpus.n_speakers)
                                if s != a]))
            other = corpus.utterance(b, W, rng).wav[:W * hop]
            # 0..6 dB signal-to-interference ratio, random polarity
            g = 10.0 ** (-rng.uniform(0.0, 6.0) / 20.0)
            wav = wav + g * other
        wavs.append(wav * rng.uniform(0.3, 1.0))
        labels.append(float(pos))
    mel = np.asarray(mel_spectrogram(jnp.asarray(np.stack(wavs)), audio))
    return _znorm(mel), np.asarray(labels, np.float32)


def train_overlap_net(corpus, audio: AudioConfig, steps: int = 300,
                      batch: int = 32, n_train: int = 256,
                      seed: int = 0) -> Dict:
    """Train OverlapNet on synthetic mixtures; returns
    {"params", "train_acc", "eval": {precision, recall, acc}} (eval on a
    held-out window set from a different seed)."""
    import jax
    import jax.numpy as jnp
    import optax

    net = OverlapNet()
    X, y = make_overlap_windows(corpus, audio, n_train, seed=seed)
    Xe, ye = make_overlap_windows(corpus, audio, 128, seed=seed + 1)
    params = net.init(jax.random.PRNGKey(seed), jnp.asarray(X[:2]))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_fn(p):
            logits = net.apply(p, xb)
            return optax.sigmoid_binary_cross_entropy(logits, yb).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    rng = np.random.default_rng(seed)
    for _ in range(steps):
        idx = rng.integers(0, len(X), batch)
        params, opt, _ = step(params, opt, jnp.asarray(X[idx]),
                              jnp.asarray(y[idx]))

    def acc_pr(Xs, ys):
        p = np.asarray(net.apply(params, jnp.asarray(Xs))) > 0.0
        tp = float(np.sum(p & (ys > 0.5)))
        prec = tp / max(float(p.sum()), 1.0)
        rec = tp / max(float((ys > 0.5).sum()), 1.0)
        return {"precision": prec, "recall": rec,
                "acc": float(np.mean(p == (ys > 0.5)))}

    return {"params": params, "train_acc": acc_pr(X, y)["acc"],
            "eval": acc_pr(Xe, ye)}


class OverlapScreen:
    """wav window [N] -> P(overlap); the detect_overlaps(screen=) hook."""

    def __init__(self, audio: AudioConfig, params: Dict):
        self.audio = audio
        self.params = params
        self.net = OverlapNet()

    def __call__(self, wav: np.ndarray) -> float:
        import jax
        import jax.numpy as jnp
        from ttsx.dsp import mel_spectrogram

        W = WINDOW_FRAMES * self.audio.hop_length
        if len(wav) < W:
            wav = np.pad(wav, (0, W - len(wav)))
        mel = np.asarray(mel_spectrogram(
            jnp.asarray(wav[None, :W].astype(np.float32)), self.audio))
        mel = _znorm(mel)[:, :WINDOW_FRAMES]
        logit = self.net.apply(self.params, jnp.asarray(mel))
        return float(jax.nn.sigmoid(logit)[0])
