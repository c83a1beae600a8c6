"""Batched wav prefetch loader: the host-side data-loading executor.

The reference overlaps host IO with accelerator steps via torch
DataLoader(num_workers=4) worker *processes* (reference_encoder/
train.py:52-69). The ttsx equivalent is a native pthreads worker pool
(ttsx/native/prefetch.c) that decodes + random-crops wavs and assembles
whole [batch, crop] float32 batches into a bounded ring buffer entirely
outside the GIL; this wrapper falls back to Python threads when no C
toolchain is available. Downstream, the mel frontend runs as ONE batched
in-graph call per batch (TPU-friendly), not per-item host DSP.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


class WavBatchLoader:
    """(path, label) items -> endless stream of (wav [B, crop] float32,
    labels [B] int32) batches, prefetched by background workers.

    Random sampling with replacement (the training regime of
    RefEncTrainer / parity harnesses); random crop start per item; short
    files are zero-padded to `crop`. Decode failures retry other files
    (bounded); a row whose retries are exhausted carries label -1 and a
    zero waveform — filter with `lab >= 0` when the dataset may contain
    broken files.
    """

    def __init__(self, items: Sequence[Tuple[str, int]], crop: int,
                 batch: int, sample_rate: int = 0, workers: int = 2,
                 depth: int = 4, seed: int = 0,
                 native: Optional[bool] = None):
        self.crop = int(crop)
        self.batch = int(batch)
        paths = [str(p) for p, _ in items]
        labels = [int(l) for _, l in items]
        self._native = None
        self._stop = threading.Event()
        self._threads: list = []
        if native is not False:
            from ttsx.native import prefetch as _ext
            if _ext is not None:
                self._native = _ext.Prefetcher(
                    paths, labels, self.crop, self.batch,
                    target_sr=sample_rate, workers=workers, depth=depth,
                    seed=seed)
        if self._native is None:
            if native is True:
                raise RuntimeError("native prefetcher unavailable")
            from ttsx.data.dataset import read_wav
            self._q: "queue.Queue" = queue.Queue(maxsize=depth)

            def work(wid: int):
                rng = np.random.default_rng(seed + wid)
                while not self._stop.is_set():
                    wav = np.zeros((self.batch, self.crop), np.float32)
                    lab = np.zeros(self.batch, np.int32)
                    lab[:] = -1  # sentinel: row stays -1 unless decoded
                    for b in range(self.batch):
                        # retry other files on decode failure so a bad
                        # file can neither poison the batch nor leave a
                        # zero wav mislabeled as speaker 0 (mirrors the
                        # native executor's bounded retry + -1 sentinel)
                        for _ in range(17):
                            i = int(rng.integers(len(paths)))
                            try:
                                w, _ = read_wav(paths[i], sample_rate)
                            except (OSError, ValueError):
                                continue
                            if len(w) >= self.crop:
                                s = int(rng.integers(
                                    0, len(w) - self.crop + 1))
                                wav[b] = w[s:s + self.crop]
                            else:
                                wav[b, :len(w)] = w
                            lab[b] = labels[i]
                            break
                    while not self._stop.is_set():
                        try:
                            self._q.put((wav, lab), timeout=0.1)
                            break
                        except queue.Full:
                            continue

            self._threads = [threading.Thread(target=work, args=(i,),
                                              daemon=True)
                             for i in range(workers)]
            for t in self._threads:
                t.start()

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def next(self, timeout_ms: int = 30000
             ) -> Tuple[np.ndarray, np.ndarray]:
        if self._native is not None:
            return self._native.next(timeout_ms=timeout_ms)
        try:
            return self._q.get(timeout=timeout_ms / 1000.0)
        except queue.Empty:
            raise TimeoutError(f"no batch within {timeout_ms} ms")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.next()

    def stats(self) -> Tuple[int, int, int]:
        """(produced, consumed, decode_errors); zeros on the fallback."""
        if self._native is not None:
            return self._native.stats()
        return (0, 0, 0)

    def close(self):
        if self._native is not None:
            self._native.close()
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
