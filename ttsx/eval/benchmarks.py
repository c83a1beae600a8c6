"""Latency / RTF benchmark harness and CI perf gates.

Reference: acoustic4/ci.py:10-72 (model vs MLP-baseline latency gate),
acoustic4/microbenchmarks.py (20-run forward timers),
reference_encoder/latency_benchmark.py (100-run average),
sde_refiner5/config max_avg_time budget.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np


def time_fn(fn: Callable, *args, runs: int = 20, warmup: int = 2) -> Dict:
    """Average wall time of a jitted fn; blocks on device results."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {"mean_s": float(times.mean()), "std_s": float(times.std()),
            "min_s": float(times.min()), "runs": runs}


def rtf(fn: Callable, *args, audio_seconds: float, runs: int = 10) -> Dict:
    """Real-time factor: synthesis wall time / audio duration
    (BASELINE.json north-star: <= 0.02 per chip on 10 s utterances)."""
    stats = time_fn(fn, *args, runs=runs)
    stats["rtf"] = stats["mean_s"] / audio_seconds
    stats["rtf_best"] = stats["min_s"] / audio_seconds
    return stats


class CIGateError(RuntimeError):
    pass


def ci_latency_gate(model_fn: Callable, baseline_fn: Callable, args_model,
                    args_baseline, factor: float = 20.0, runs: int = 20):
    """Raise if model latency exceeds `factor` x baseline
    (acoustic4/ci.py:64-67 behavior)."""
    m = time_fn(model_fn, *args_model, runs=runs)
    b = time_fn(baseline_fn, *args_baseline, runs=runs)
    ratio = m["mean_s"] / max(b["mean_s"], 1e-9)
    if ratio > factor:
        raise CIGateError(
            f"model {m['mean_s']*1e3:.1f}ms > {factor}x baseline "
            f"{b['mean_s']*1e3:.1f}ms (ratio {ratio:.1f})")
    return {"model": m, "baseline": b, "ratio": ratio}


def time_budget_gate(fn: Callable, *args, max_avg_time: float = 0.5,
                     runs: int = 5):
    """Refiner-style avg-time budget (sde_refiner5/config.json:24-25)."""
    stats = time_fn(fn, *args, runs=runs)
    if stats["mean_s"] > max_avg_time:
        raise CIGateError(
            f"avg {stats['mean_s']:.3f}s exceeds budget {max_avg_time}s")
    return stats
