"""Record per-stage forward/backward timings + memory into results.json.

Parity with train/tests/results.json (the reference's only recorded perf
data: pre/post-refactor fwd/bwd ms + peak MB per stage + unified iters/s).
Run: python -m ttsx.eval.record_baseline [out.json]
"""
from __future__ import annotations

import json
import sys
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _device_mb() -> float:
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use",
                         stats.get("bytes_in_use", 0)) / 1e6
    except Exception:
        return 0.0


def _time(fn, *args, runs=10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / runs * 1e3  # ms


def record(frames: int = 128, batch: int = 2) -> Dict:
    from ttsx.core.config import TTSXConfig
    from ttsx.train.blocks import AcousticBlock, RefinerBlock, VocoderBlock
    from ttsx.data.synthetic import synthetic_batch

    cfg = TTSXConfig()
    rng = jax.random.PRNGKey(0)
    batch_d = {k: jnp.asarray(v) for k, v in
               synthetic_batch(cfg, batch, frames).items()}
    results: Dict = {"config": {"frames": frames, "batch": batch},
                     "device": str(jax.devices()[0])}

    ab = AcousticBlock(cfg)
    a_state = ab.init_state(rng, batch_d)
    fwd = lambda: ab.val_step(a_state.params, batch_d)["val_l1"]
    results["acoustic"] = {
        "forward_ms": _time(lambda: fwd()),
        "train_step_ms": _time(lambda: ab.train_step(a_state, batch_d)[1]
                               ["metrics"]["loss"]),
        "peak_mb": _device_mb(),
    }

    rb = RefinerBlock(cfg)
    r_state = rb.init_state(rng, batch_d)
    mel_pred = batch_d["mel"]
    results["refiner"] = {
        "forward_ms": _time(lambda: rb.val_step(r_state.params, batch_d,
                                                mel_pred)["val_l1"]),
        "train_step_ms": _time(lambda: rb.train_step(
            r_state, batch_d, mel_pred, jnp.asarray(1.0),
            jnp.asarray(1.0))[1]["metrics"]["loss"]),
        "peak_mb": _device_mb(),
    }

    vb = VocoderBlock(cfg)
    v_state = vb.init_state(rng, batch_d)
    results["vocoder"] = {
        "disc_step_ms": _time(lambda: vb.disc_step(v_state, batch_d)[1]
                              ["d_loss"]),
        "gen_step_ms": _time(lambda: vb.gen_step(v_state, batch_d)[1]
                             ["g_loss"]),
        "peak_mb": _device_mb(),
    }

    total_ms = (results["acoustic"]["train_step_ms"]
                + results["refiner"]["train_step_ms"]
                + results["vocoder"]["disc_step_ms"]
                + results["vocoder"]["gen_step_ms"])
    results["unified_iters_per_s"] = 1000.0 / total_ms if total_ms else 0.0
    return results


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "results.json"
    res = record()
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
