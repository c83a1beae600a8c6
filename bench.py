"""Driver benchmark: end-to-end text->waveform RTF on a 10 s utterance.

Prints ONE JSON line:
  {"metric": "e2e_rtf_10s", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <target 0.02 / measured>}   (>1.0 means beating target)

Runs on whatever jax.devices() provides (real TPU chip under the driver).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ttsx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_RTF = 0.02  # BASELINE.json north-star: RTF <= 0.02/chip @ 10 s


def main():
    from __graft_entry__ import entry, _flagship_cfg
    from ttsx.models.pipeline import TTSPipeline

    cfg = _flagship_cfg()
    sr = cfg.vocoder.sr
    hop = cfg.vocoder.hop_length
    seconds = 10.0
    T = int(round(seconds * sr / hop))  # 861 mel frames
    B = 1

    pipe = TTSPipeline(cfg)
    rng = jax.random.PRNGKey(0)
    params = pipe.init_params(rng, batch=B, frames=128)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
        params)

    def fn(params, text_emb, prosody, emo, spk, sid):
        return pipe.synthesize(params, text_emb, prosody, emo, spk, sid,
                               use_sde=False).wav

    args = (
        params,
        jnp.zeros((B, T, cfg.acoustic.text_emb_dim), jnp.bfloat16),
        jnp.zeros((B, T, 18), jnp.bfloat16),
        jnp.full((B, 6), 1.0 / 6.0, jnp.bfloat16),
        jnp.zeros((B, cfg.acoustic.speaker_dim), jnp.bfloat16),
        jnp.zeros((B,), jnp.int32),
    )
    jfn = jax.jit(fn)
    # compile + warmup
    wav = jfn(*args)
    jax.block_until_ready(wav)
    audio_seconds = wav.shape[1] / sr

    runs = 10
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        times.append(time.perf_counter() - t0)
    rtf = float(np.mean(times)) / audio_seconds

    print(json.dumps({
        "metric": "e2e_rtf_10s",
        "value": rtf,
        "unit": "rtf",
        "vs_baseline": BASELINE_RTF / rtf,
    }))


if __name__ == "__main__":
    main()
