"""On-device A/B of the two parity-proven-only Pallas kernels (mel
frontend, S4 scan) vs their XLA counterparts — promote or delete.

Round-2 microbenches through the tunnel were dispatch-dominated
(~30-60 ms RTT/call masks sub-10 ms kernels). Here each candidate is
dispatched N times back-to-back with ONE final sync, so per-iter
amortized time approaches true device throughput (same method as
bench.py's MFU breakdown).

Run ON TPU (never alongside another TPU process):
    timeout 900 python scripts/kernel_ab.py
Appends a JSON line to eval_results/kernel_ab.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r):
    # block_until_ready through the axon tunnel resolves before device
    # execution completes; an actual device->host transfer is the only
    # honest fence (same rule as bench.py).
    float(jnp.sum(jax.tree_util.tree_leaves(r)[-1]))


def amortized_ms(fn, args, runs=30, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / runs * 1e3


def main():
    from ttsx.core.config import AudioConfig
    from ttsx.dsp.stft import mel_spectrogram
    from ttsx.nn.s4 import fft_dw_conv, scan_dw_conv, ssm_kernel
    from ttsx.ops.mel_kernel import mel_frontend_pallas
    from ttsx.ops.s4_kernel import s4_scan_pallas

    out = {"device": str(jax.devices()[0])}

    # --- mel frontend: serving-shaped batch (B=8 x 10 s @ 22.05 kHz)
    au = AudioConfig()
    wav = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(8, au.sample_rate * 10))
                      .astype(np.float32))
    f_pallas = jax.jit(lambda w: mel_frontend_pallas(w, au))
    f_xla = jax.jit(lambda w: mel_spectrogram(w, au))
    # parity first (same run, so the verdict is self-contained)
    d = float(jnp.max(jnp.abs(f_pallas(wav) - f_xla(wav))))
    out["mel_parity_maxabs"] = d
    out["mel_pallas_ms"] = round(amortized_ms(f_pallas, (wav,)), 3)
    out["mel_xla_ms"] = round(amortized_ms(f_xla, (wav,)), 3)

    # --- S4 scan: prosody-model shape (B=16, T=1024, C=256, H=4 heads,
    # d=16 modes/head, e=C/H channels/head)
    B, T, H, d_modes, e = 16, 1024, 4, 16, 64
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, T, H * e)).astype(np.float32))
    a = jnp.asarray(-np.abs(rng.normal(size=(H, d_modes))
                            ).astype(np.float32) * 0.3)
    b = jnp.asarray(np.ones((H, d_modes), np.float32))
    c = jnp.asarray(rng.normal(size=(H, d_modes, e)
                               ).astype(np.float32) * 0.5)
    s_pallas = jax.jit(lambda *x: s4_scan_pallas(*x))
    s_xla = jax.jit(lambda *x: scan_dw_conv(*x))
    d = float(jnp.max(jnp.abs(s_pallas(u, a, b, c) - s_xla(u, a, b, c))))
    out["s4_parity_maxabs"] = d
    out["s4_pallas_ms"] = round(amortized_ms(s_pallas, (u, a, b, c)), 3)
    out["s4_xla_ms"] = round(amortized_ms(s_xla, (u, a, b, c)), 3)
    # the prosody model's default TRAINING path: materialized ssm kernel
    # + FFT depthwise conv (the round-2 observation was that this beats
    # the scan; measure it in the same run so the verdict is 3-way)
    s_fft = jax.jit(lambda uu, aa, bb, cc: fft_dw_conv(
        uu, ssm_kernel(aa, bb, cc, uu.shape[1]), causal=True))
    out["s4_fft_ms"] = round(amortized_ms(s_fft, (u, a, b, c)), 3)

    out["mel_verdict"] = ("pallas" if out["mel_pallas_ms"]
                          < 0.95 * out["mel_xla_ms"] else "xla")
    out["s4_verdict"] = ("pallas" if out["s4_pallas_ms"]
                         < 0.95 * out["s4_xla_ms"] else "xla")
    path = Path("eval_results/kernel_ab.json")
    hist = json.loads(path.read_text()) if path.exists() else []
    hist.append(out)
    path.write_text(json.dumps(hist, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
