"""Thin ReID wrapper: memory re-id + overlap detection under the legacy
`memory.update` API (reference: hyper_diarizer/reid.py:13-50)."""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ttsx.core.config import AudioConfig
from ttsx.pipeline.diarizer.cluster import ReIDMemory
from ttsx.pipeline.diarizer.overlap import detect_overlaps


class ReIDSystem:
    def __init__(self, memory: Optional[ReIDMemory] = None,
                 au: Optional[AudioConfig] = None):
        self.memory = memory or ReIDMemory()
        self.au = au or AudioConfig()

    def identify(self, cluster_embs: Dict[int, np.ndarray]):
        return self.memory.re_id(cluster_embs)

    def update(self, speaker: str, emb: np.ndarray):
        self.memory.update(speaker, emb)

    def overlaps(self, wav: np.ndarray, slices: List[Tuple[float, float]],
                 labels: np.ndarray, embs: np.ndarray):
        return detect_overlaps(wav, self.au, slices, labels, embs)
