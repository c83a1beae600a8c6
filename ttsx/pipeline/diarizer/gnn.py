"""Graph-attention clusterer with triplet refinement.

Re-designs hyper_diarizer/cluster.py:164-219 (GNNClusterer: 2 custom GAT
layers + KMeans with k=ceil(sqrt(n)), triplet-loss train). Pure numpy on
host — slice counts are tiny (<= a few hundred), so a matmul GAT step
costs microseconds and needs no device round-trip.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ttsx.pipeline.diarizer.cluster import Clusterer, KMeansClusterer


def _softmax_rows(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


class GNNClusterer(Clusterer):
    """2 GAT layers over the similarity graph, then k=ceil(sqrt(n)) KMeans."""

    def __init__(self, dim: int = 64, layers: int = 2, seed: int = 0,
                 sim_threshold: float = 0.5, lr: float = 0.05):
        self.layers = layers
        self.dim = dim
        self.seed = seed
        self.sim_threshold = sim_threshold
        self.lr = lr
        self._w: Optional[list] = None

    def _init(self, in_dim: int):
        rng = np.random.default_rng(self.seed)
        dims = [in_dim] + [self.dim] * self.layers
        self._w = [rng.normal(scale=1 / np.sqrt(dims[i]),
                              size=(dims[i], dims[i + 1]))
                   for i in range(self.layers)]

    def _forward(self, embs: np.ndarray, adj: np.ndarray) -> np.ndarray:
        h = embs
        for w in self._w:
            z = h @ w
            # attention: masked scaled dot-product over graph edges
            att = z @ z.T / np.sqrt(z.shape[1])
            att = np.where(adj > 0, att, -1e9)
            att = _softmax_rows(att)
            h = np.tanh(att @ z)
        return h / (np.linalg.norm(h, axis=1, keepdims=True) + 1e-8)

    def cluster_embeddings(self, embs: np.ndarray) -> np.ndarray:
        n = len(embs)
        if n == 0:
            return np.zeros(0, int)
        if self._w is None or self._w[0].shape[0] != embs.shape[1]:
            self._init(embs.shape[1])
        e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
        adj = (e @ e.T) > self.sim_threshold
        np.fill_diagonal(adj, True)
        h = self._forward(e, adj)
        return KMeansClusterer(seed=self.seed).cluster_embeddings(h)

    def cluster(self, sim: np.ndarray) -> np.ndarray:
        return self.cluster_embeddings(sim)

    # -- triplet refinement (cluster.py GNNClusterer.train) ---------------
    def train(self, embs: np.ndarray, labels: np.ndarray,
              margin: float = 0.3, steps: int = 20):
        """Numeric-gradient-free triplet refinement: nudge the first GAT
        projection toward pulling same-label pairs together (Oja-style
        Hebbian update — cheap and dependency-free)."""
        if self._w is None:
            self._init(embs.shape[1])
        e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
        rng = np.random.default_rng(self.seed)
        for _ in range(steps):
            i = rng.integers(len(e))
            same = np.where(labels == labels[i])[0]
            diff = np.where(labels != labels[i])[0]
            if len(same) < 2 or len(diff) == 0:
                continue
            p = rng.choice(same[same != i])
            n_ = rng.choice(diff)
            # Hebbian pull/push on the input projection
            self._w[0] += self.lr * (np.outer(e[i], e[p] @ self._w[0])
                                     - np.outer(e[i], e[n_] @ self._w[0]))
            self._w[0] /= np.linalg.norm(self._w[0], axis=0,
                                         keepdims=True) + 1e-8
