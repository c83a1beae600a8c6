"""CLI implementations (argparse, host-side)."""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def add_common_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """--device/--seed/--output-dir shared parser
    (reference_encoder/cli.py:3-16)."""
    parser.add_argument("--device", default="tpu",
                        help="tpu | cpu (forces jax platform)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-dir", default="./output")
    return parser


def _apply_device(device: str):
    if device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def main_observer(argv=None):
    """ttsx-observer --job <wav> | --watch <dir> (main.py:419-441)."""
    p = argparse.ArgumentParser("ttsx-observer")
    add_common_args(p)
    p.add_argument("--job", help="process a single wav")
    p.add_argument("--watch", help="watch a directory for *.ready markers")
    p.add_argument("--config", help="YAML/JSON config file")
    p.add_argument("--git-repo", help="repo for artifact sync")
    args = p.parse_args(argv)
    _apply_device(args.device)

    from ttsx.pipeline import ObserverPipeline, watch
    if args.job:
        pipe = ObserverPipeline(git_repo=args.git_repo)
        summary = pipe.run_job(args.job, args.output_dir)
        print(json.dumps(summary, indent=1))
        return 0 if summary["status"] != "failed" else 1
    if args.watch:
        import time
        watcher, worker, q = watch(args.watch, args.output_dir,
                                   git_repo=args.git_repo)
        print(f"watching {args.watch} (ctrl-c to stop)")
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            watcher.stop()
            worker.stop()
        return 0
    p.print_help()
    return 2


def main_diarize(argv=None):
    """hyperdiarizer CLI (hyper_diarizer/cli.py:192-222)."""
    p = argparse.ArgumentParser("ttsx-diarize")
    add_common_args(p)
    p.add_argument("wavs", nargs="+")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--eval", dest="eval_rttm",
                   help="reference RTTM for DER/purity")
    p.add_argument("--snapshot", help="ReID memory snapshot to load/save")
    p.add_argument("--workers", type=int, default=4,
                   help="thread-pool size for batch mode "
                        "(ref cli.py:204-210 Pool processes)")
    args = p.parse_args(argv)
    _apply_device(args.device)

    from ttsx.pipeline.diarizer import DiarizerController, ReIDMemory
    # bounded CLI run log (hyper_diarizer/cli.py:33-36 RotatingFileHandler)
    import logging
    from ttsx.utils.logs import attach_rotating_handler
    attach_rotating_handler(logging.getLogger("ttsx.diarizer"),
                            Path(args.output_dir) / "diarizer.log")
    memory = ReIDMemory()
    if args.snapshot and Path(args.snapshot).exists():
        memory.load_snapshot(args.snapshot)
    ctl = DiarizerController(memory=memory)
    if len(args.wavs) == 1:
        res = ctl.diarize_single(args.wavs[0], args.output_dir,
                                 streaming=args.streaming)
        ok = bool(res)
    else:
        res = ctl.diarize_batch(args.wavs, args.output_dir,
                                workers=args.workers)
        ok = any(res.values())
    if args.snapshot:
        memory.snapshot(args.snapshot)
    if args.eval_rttm:
        job = Path(args.wavs[0]).stem
        hyp = Path(args.output_dir) / f"{job}.rttm"
        print(json.dumps(ctl.evaluate(args.eval_rttm, str(hyp))))
    return 0 if ok else 1


def main_train(argv=None):
    """ttsx-train: unified three-stage trainer on a dataset tree."""
    p = argparse.ArgumentParser("ttsx-train")
    add_common_args(p)
    p.add_argument("--config", help="TTSXConfig YAML/JSON")
    p.add_argument("--data-root", required=False)
    p.add_argument("--max-steps", type=int)
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic batches (smoke mode)")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)
    _apply_device(args.device)

    from ttsx.core.config import TTSXConfig, load_config
    from ttsx.train import UnifiedTrainer, JSONLLogger, StepTimeArtifact
    cfg = load_config(args.config) if args.config else TTSXConfig()

    if args.synthetic or not args.data_root:
        from ttsx.data.synthetic import synthetic_stream
        steps = args.max_steps or 10
        stream = synthetic_stream(cfg, batch=2, frames=16, n=steps)
    else:
        from ttsx.data import (TTSDataset, TTSDatasetConfig, TTSCollator,
                               CollatorConfig, collator_to_trainer_batch)
        ds = TTSDataset(TTSDatasetConfig(
            audio_root=args.data_root, audio=cfg.audio,
            text_emb_dim=cfg.acoustic.text_emb_dim))
        coll = TTSCollator(CollatorConfig(audio=cfg.audio))

        def stream_fn():
            import numpy as np
            rng = np.random.default_rng(cfg.train.seed)
            bi = 0
            while True:
                idx = rng.choice(len(ds), cfg.train.batch_size)
                raw = coll([ds[int(i)] for i in idx], batch_idx=bi)
                bi += 1
                yield collator_to_trainer_batch(raw, cfg)
        stream = stream_fn()

    out = Path(args.output_dir)
    trainer = UnifiedTrainer(
        cfg, stream,
        callbacks=[JSONLLogger(str(out / "train_log.jsonl")),
                   StepTimeArtifact(str(out / "step_times.json"))],
        checkpoint_dir=str(out / "checkpoints"))
    if args.resume:
        trainer.restore_checkpoint("last")
    state = trainer.train(max_steps=args.max_steps)
    print(json.dumps({"global_step": state.global_step,
                      "best_val": state.best_val}))
    return 0


def main_synth(argv=None):
    """ttsx-synth: text/mel -> waveform via the flagship pipeline."""
    p = argparse.ArgumentParser("ttsx-synth")
    add_common_args(p)
    p.add_argument("--text", default="hello world")
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--checkpoint")
    p.add_argument("--zoo", nargs="?", const="", metavar="DIR",
                   help="load the git-tracked pretrained slim exports "
                        "(default dir: eval_results/zoo); uses the zoo's "
                        "training config")
    p.add_argument("--sde", action="store_true")
    p.add_argument("--out", default="synth.wav")
    args = p.parse_args(argv)
    _apply_device(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ttsx.core.config import TTSXConfig
    from ttsx.models.pipeline import TTSPipeline
    from ttsx.data.dataset import TextEncoder, write_wav

    rng = jax.random.PRNGKey(args.seed)
    if args.zoo is not None:
        from ttsx import zoo
        pipe, params = zoo.load_pipeline(zoo_dir=args.zoo or None, rng=rng,
                                         frames=args.frames)
        missing = params.pop("_missing")
        if missing:
            print(json.dumps({"zoo_missing_stages": missing}))
        cfg = pipe.cfg
    else:
        cfg = TTSXConfig()
        pipe = TTSPipeline(cfg)
        params = pipe.init_params(rng, batch=1, frames=args.frames)
    if args.checkpoint:
        from ttsx.train.checkpoint import restore_checkpoint
        restored = restore_checkpoint(args.checkpoint, "best", params)
        if restored:
            params = restored[0]

    te = TextEncoder(cfg.acoustic.text_emb_dim)
    emb = jnp.asarray(te(args.text))[None, None, :]
    text_emb = jnp.broadcast_to(emb, (1, args.frames,
                                      cfg.acoustic.text_emb_dim))
    prosody = jnp.zeros((1, args.frames, 18))
    emo = jnp.full((1, 6), 1 / 6)
    spk = jnp.zeros((1, cfg.acoustic.speaker_dim))
    sid = jnp.zeros((1,), jnp.int32)
    # jit the whole synthesis: one compiled program instead of an eager
    # per-op dispatch storm (fatal on remote-TPU backends)
    synth = jax.jit(lambda p, t, pr, e, s, i, r: pipe.synthesize(
        p, t, pr, e, s, i, rng=r, use_sde=args.sde).wav,
        static_argnums=())
    wav = synth(params, text_emb, prosody, emo, spk, sid, rng)
    write_wav(args.out, np.asarray(wav)[0, :, 0], cfg.vocoder.sr)
    print(json.dumps({"wav": args.out,
                      "samples": int(wav.shape[1]),
                      "seconds": wav.shape[1] / cfg.vocoder.sr}))
    return 0


def main_bench(argv=None):
    """ttsx-bench: CI latency gates (acoustic4/ci.py semantics)."""
    p = argparse.ArgumentParser("ttsx-bench")
    add_common_args(p)
    args = p.parse_args(argv)
    _apply_device(args.device)

    import jax
    import jax.numpy as jnp
    from ttsx.core.config import AcousticConfig
    from ttsx.models import AcousticModel
    from ttsx.eval import ci_latency_gate, CIGateError

    cfg = AcousticConfig()
    model = AcousticModel(cfg)
    B, T = 2, 128
    text = jnp.zeros((B, T, cfg.text_emb_dim))
    pros = jnp.zeros((B, T, 18))
    emo = jnp.full((B, 6), 1 / 6)
    params = model.init(jax.random.PRNGKey(0), text, pros, emo)
    model_fn = jax.jit(lambda t, pr, e: model.apply(params, t, pr, e).mel)

    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(cfg.conformer_layers):
                x = nn.Dense(cfg.hidden_channels)(x)
                x = nn.relu(x)
            return nn.Dense(80)(x)

    mlp = MLP()
    mlp_params = mlp.init(jax.random.PRNGKey(0), text)
    mlp_fn = jax.jit(lambda t: mlp.apply(mlp_params, t))
    try:
        res = ci_latency_gate(model_fn, mlp_fn, (text, pros, emo), (text,),
                              factor=cfg.ci_latency_factor)
        print(json.dumps({"ratio": res["ratio"], "pass": True}))
        return 0
    except CIGateError as e:
        print(json.dumps({"pass": False, "error": str(e)}))
        return 1


if __name__ == "__main__":
    sys.exit(main_observer())


# refenc console scripts live in ttsx/cli/refenc.py (LoC gate); lazy
# re-export keeps `from ttsx.cli.main import main_refenc_*` working for
# tests and existing imports without a circular-import hazard (refenc.py
# imports this module for add_common_args)
def __getattr__(name):
    if name.startswith("main_refenc_"):
        from ttsx.cli import refenc
        return getattr(refenc, name)
    raise AttributeError(name)
