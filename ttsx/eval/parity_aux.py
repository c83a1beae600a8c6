"""Parity harness part 2: vocoder GAN smoke + diarizer DER + CLI.

See ttsx/eval/parity.py for the experiment overview. Split out to respect
the per-directory LoC gate (ttsx/utils/check_file_sizes.py).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ttsx.data.tonecorpus import ToneCorpus
from ttsx.eval.parity import (AUDIO, _batch_sampler, _tts_cfg,
                              acoustic_parity,
                              refiner_parity)
from ttsx.eval.parity_common import make_corpus


# ---------------------------------------------------------------------------
# 4. vocoder GAN smoke at reference-capacity discriminators
# ---------------------------------------------------------------------------
def vocoder_gan_smoke(steps: int = 500, frames: int = 64, batch: int = 4,
                      n_speakers: int = 4, seed: int = 0,
                      corpus: str = "tone") -> Dict:
    import jax
    import jax.numpy as jnp
    from ttsx.train.blocks import VocoderBlock
    from ttsx.eval.parity import _normalize_mels, _model_batch

    cfg = _tts_cfg()
    corpus = make_corpus(corpus, n_speakers=n_speakers, audio=AUDIO,
                         seed=seed)
    # normalized mel input — the space the flagship's generator sees
    feats = _model_batch(_normalize_mels(
        corpus.features(corpus.utterances(8, frames, seed=seed))))
    # wav length must equal frames * hop for the generator contract
    hop = 1
    for f in cfg.vocoder.upsample_factors:
        hop *= f
    T = feats["mel"].shape[1]
    feats["wav"] = feats["wav"][:, :T * hop]
    block = VocoderBlock(cfg)
    sampler = _batch_sampler(feats, batch, seed)
    first = {k: jnp.asarray(v) for k, v in next(sampler).items()}
    states = block.init_state(jax.random.PRNGKey(seed), first)
    d_hist, g_hist, r1_hist = [], [], []
    t0 = time.perf_counter()
    for step in range(steps):
        mb = {k: jnp.asarray(v) for k, v in next(sampler).items()}
        states, dm = block.disc_step(states, mb)
        states, gm = block.gen_step(states, mb)
        d_hist.append(float(dm["d_loss"]))
        r1_hist.append(float(dm["r1"]))
        g_hist.append(float(gm["g_loss"]))
    train_s = time.perf_counter() - t0
    tail_d = np.asarray(d_hist[-100:])
    tail_g = np.asarray(g_hist[-100:])
    n_params = sum(int(np.prod(np.asarray(p.shape)))
                   for p in jax.tree_util.tree_leaves(
                       (states.mpd.params, states.msd.params,
                        states.mbd.params)))
    return {"exp": "vocoder_gan_smoke", "steps": steps,
            "d_loss_tail_mean": float(tail_d.mean()),
            "d_loss_tail_std": float(tail_d.std()),
            "g_loss_tail_mean": float(tail_g.mean()),
            "g_loss_tail_std": float(tail_g.std()),
            "r1_tail_mean_on_r1_steps": float(
                np.mean([r for r in r1_hist[-100:] if r > 0.0]) if
                any(r > 0.0 for r in r1_hist[-100:]) else 0.0),
            "stable": bool(np.isfinite(d_hist).all()
                           and np.isfinite(g_hist).all()),
            "disc_params": n_params, "train_seconds": train_s}


# ---------------------------------------------------------------------------
# 5. diarizer -> DER (host-side)
# ---------------------------------------------------------------------------
def _train_slice_encoder(*a, **kw):
    # moved to parity_diar (per-file LoC gate); thin re-export
    from ttsx.eval.parity_diar import _train_slice_encoder as f
    return f(*a, **kw)


def diarizer_parity(n_speakers: int = 3, n_turns: int = 12,
                    seed: int = 0, out_dir: Optional[str] = None,
                    trained: bool = True, train_steps: int = 400,
                    corpus: str = "tone") -> Dict:
    import tempfile
    from ttsx.data.dataset import write_wav
    from ttsx.pipeline.diarizer.controller import DiarizerController
    from ttsx.pipeline.diarizer.embedding import SliceEmbedder
    from ttsx.eval.metrics import diarization_error_rate

    corpus = make_corpus(corpus, n_speakers=max(n_speakers, 4),
                         audio=AUDIO, seed=seed)
    wav, truth = corpus.dialogue(list(range(n_speakers)), n_turns,
                                 seed=seed)
    out = Path(out_dir or tempfile.mkdtemp())
    wav_path = out / "dialogue.wav"
    write_wav(wav_path, wav.astype(np.float32), AUDIO.sample_rate)

    def run(embedder, tag):
        ctl = DiarizerController(AUDIO, embedder=embedder,
                                 min_dur=0.8, max_dur=3.0)
        res = ctl.diarize_single(str(wav_path), str(out / f"diar_{tag}"))
        hyp = [(s, e, spk) for (s, e), spk in
               zip(res.get("slices", []), res.get("speakers", []))]
        return {"der": float(diarization_error_rate(truth, hyp)),
                "der_collar_250ms": float(diarization_error_rate(
                    truth, hyp, collar=0.25)),
                "n_hyp_speakers": len(set(res.get("speakers", []))),
                "n_slices": len(res.get("slices", []))}

    result: Dict = {"exp": "diarizer", "n_true_speakers": n_speakers,
                    "n_turns": n_turns,
                    "untrained": run(None, "untrained")}
    if trained:
        cfg, params = _train_slice_encoder(corpus, steps=train_steps,
                                           seed=seed)
        emb = SliceEmbedder(AUDIO, cfg=cfg, params=params)
        result["trained"] = run(emb, "trained")
        result["train_steps"] = train_steps
    return result


# ---------------------------------------------------------------------------
def _lazy(name, module="ttsx.eval.parity_e2e"):
    def run(**kw):
        import importlib
        return getattr(importlib.import_module(module), name)(**kw)
    return run


EXPERIMENTS = {
    "refenc": _lazy("refenc_parity", "ttsx.eval.parity_refenc"),
    "prosody": _lazy("prosody_parity", "ttsx.eval.parity_prosody"),
    "acoustic": acoustic_parity,
    "refiner": refiner_parity,
    "vocoder": vocoder_gan_smoke,
    "vocoder_quality": _lazy("vocoder_parity", "ttsx.eval.parity_vocoder"),
    "e2e": _lazy("e2e_parity"),
    "diarizer": diarizer_parity,
    "diarizer_hard": _lazy("diarizer_hard", "ttsx.eval.parity_diar"),
}


def main(argv=None):
    p = argparse.ArgumentParser("ttsx-parity")
    p.add_argument("--exp", default="all",
                   choices=[*EXPERIMENTS, "all"])
    p.add_argument("--out", default="eval_results/parity.json")
    p.add_argument("--cpu", action="store_true",
                   help="force host CPU (tests / no-TPU boxes)")
    # quality-curve leg controls (vocoder_quality): cumulative-step
    # checkpoint resume lives in vocoder_parity(save_dir=...); these make
    # the curve legs reproducible from the CLI instead of ad-hoc scripts
    p.add_argument("--steps", type=int, default=None,
                   help="cumulative step target for the experiment")
    p.add_argument("--save-dir", default=None,
                   help="checkpoint dir to resume/extend (vocoder_quality)")
    p.add_argument("--key", default=None,
                   help="record result under this key instead of the "
                        "experiment name (e.g. vocoder_quality_84k)")
    p.add_argument("--override", action="append", default=[],
                   metavar="FIELD=VALUE",
                   help="VocoderConfig field override for ablation legs, "
                        "e.g. --override lambda_energy=1.0 (repeatable)")
    p.add_argument("--arg", action="append", default=[],
                   metavar="K=V",
                   help="extra experiment kwarg (JSON value), e.g. "
                        "--arg utts_train=64 for a data-scale leg "
                        "(repeatable)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    # "all" = the standard per-stage set; the heavyweight chained runs
    # (vocoder_quality trains a full GAN, e2e re-trains three stages)
    # stay opt-in by name
    heavy = {"vocoder_quality", "e2e", "diarizer_hard"}
    names = ([n for n in EXPERIMENTS if n not in heavy]
             if args.exp == "all" else [args.exp])
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    results = {}
    if out_path.exists():
        results = json.loads(out_path.read_text())
    kw = {}
    if args.steps is not None:
        kw["steps"] = args.steps
    if args.save_dir is not None:
        kw["save_dir"] = args.save_dir
    if args.override:
        ov = {}
        for item in args.override:
            field, _, raw = item.partition("=")
            try:
                ov[field] = json.loads(raw)
            except json.JSONDecodeError:
                ov[field] = raw
        kw["vocoder_overrides"] = ov
    for item in args.arg:
        k, _, raw = item.partition("=")
        try:
            kw[k] = json.loads(raw)
        except json.JSONDecodeError:
            kw[k] = raw
    if kw and (len(names) != 1 or args.exp == "all"):
        p.error("--steps/--save-dir/--override/--arg need a single --exp")
    for name in names:
        r = EXPERIMENTS[name](**kw)
        r = {k: v for k, v in r.items() if not k.startswith("_")}
        if name == "refiner" and "acoustic" in r:
            # the refiner run embeds a full acoustic experiment
            results["acoustic"] = r.pop("acoustic")
        if "vocoder_overrides" in kw:
            r["vocoder_overrides"] = kw["vocoder_overrides"]
        if args.arg:
            r["cli_args"] = {k: kw[k] for k in
                             (i.partition("=")[0] for i in args.arg)}
        results[args.key or name] = r
        print(json.dumps({args.key or name: r}))
        out_path.write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
