"""Generator device-time decomposition (VERDICT r3 next #8).

gst+generator is ~33 ms of the ~43 ms chain device time (BENCH_r03).
This probe times ablated variants of the fused gst+gen program with the
amortized N-async-dispatch-1-sync method (tunnel RTT masked) to locate
the time: upsample+resblock tower (pallas vs XLA), self-attention,
band_merge, gst. Also re-times the refiner compile (28.5 s -> 75 s
regression watch).

Run ON TPU (never alongside another TPU process):
    timeout 1500 python scripts/gen_profile.py
Appends a JSON entry to eval_results/gen_profile.json.
"""
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(r):
    # block_until_ready through the axon tunnel resolves before device
    # execution completes; an actual device->host transfer is the only
    # honest fence (same rule as bench.py).
    leaf = jax.tree_util.tree_leaves(r)[-1]
    float(jnp.sum(leaf))


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
    from __graft_entry__ import _flagship_cfg
    from ttsx.models.pipeline import TTSPipeline

    out = {}
    base = _flagship_cfg()
    sr, hop = base.vocoder.sr, base.vocoder.hop_length
    T = -(-int(round(10.0 * sr / hop)) // 8) * 8
    B = 1
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)

    mel = jax.random.normal(ks[0], (B, T, base.vocoder.channels))
    pros = jax.random.normal(ks[1], (B, T, 18))
    emo = jnp.full((B, 6), 1.0 / 6.0)

    def build(cfg, attn_identity=False):
        """Init AND trace/compile inside the patched region — jit traces
        lazily at first call, so the attn-identity patch must still be
        active when lowering happens (r4 leg failure: ScopeParamNotFound)."""
        import ttsx.nn.attention as attn_mod
        orig = attn_mod.SelfAttention1d.__call__
        if attn_identity:
            attn_mod.SelfAttention1d.__call__ = lambda self, x: x
        try:
            pipe = TTSPipeline(cfg)
            params = pipe.init_params(rng, batch=B, frames=128)

            def gg(pg, pgen, m, pr, e):
                style = pipe.gst.apply(pg, m)
                return pipe.generator.apply(pgen, m, pr, style, e)

            def gst_only(pg, m):
                return pipe.gst.apply(pg, m)

            t0 = time.perf_counter()
            ggc = jax.jit(gg).lower(params["gst"], params["generator"],
                                    mel, pros, emo).compile()
            compile_s = time.perf_counter() - t0
            gstc = jax.jit(gst_only).lower(params["gst"], mel).compile()
            return ggc, gstc, params, compile_s
        finally:
            attn_mod.SelfAttention1d.__call__ = orig

    variants = {
        "flagship_pallas": (base, False),
        "xla": (dataclasses.replace(base, vocoder=dataclasses.replace(
            base.vocoder, use_pallas_upsample=False,
            use_pallas_resblock_stack=False)), False),
        "pallas_no_attn": (base, True),
        "pallas_no_resblocks": (dataclasses.replace(
            base, vocoder=dataclasses.replace(
                base.vocoder, res_dilations=(),
                use_pallas_resblock_stack=False)), False),
    }
    for name, (cfg, no_attn) in variants.items():
        try:
            gg, gst_only, params, compile_s = build(
                cfg, attn_identity=no_attn)
            out[f"{name}_compile_s"] = round(compile_s, 1)
            out[f"{name}_device_ms"] = round(amortized_ms(
                gg, (params["gst"], params["generator"], mel, pros, emo)), 3)
            if name == "flagship_pallas":
                out["gst_only_device_ms"] = round(amortized_ms(
                    gst_only, (params["gst"], mel)), 3)
            print(name, out[f"{name}_device_ms"], "ms", flush=True)
        except Exception as e:  # keep other variants' numbers
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            print(name, "FAILED", out[f"{name}_error"], flush=True)

    # refiner compile-time watch (28.5 s r02 -> 75 s r03, unexplained)
    pipe = TTSPipeline(base)
    params = pipe.init_params(rng, batch=B, frames=128)
    rf = jax.jit(lambda p, m, pr, s, t: pipe.refiner.apply(
        p, m, pr, s, t, deterministic=True).mel_ref)
    sid = jnp.zeros((B,), jnp.int32)
    text = jax.random.normal(ks[2], (B, T, base.acoustic.text_emb_dim))
    t0 = time.perf_counter()
    r = rf(params["refiner"], mel, pros, sid, text)
    jax.block_until_ready(r)
    out["refiner_compile_s"] = round(time.perf_counter() - t0, 1)

    path = Path("eval_results/gen_profile.json")
    hist = json.loads(path.read_text()) if path.exists() else []
    hist.append(out)
    path.write_text(json.dumps(hist, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
