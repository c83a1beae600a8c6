"""refenc console-script entry points (reference_encoder/setup.py
entry_points: refenc-train / refenc-eer / refenc-latency / refenc-fuse).
Split from ttsx/cli/main.py for the per-directory LoC gate."""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from ttsx.cli.main import add_common_args, _apply_device


def _restore_refenc_params(cfg, checkpoint: str, mel, seed: int):
    """Load the encoder params from a refenc-train checkpoint dir
    (best/ preferred, then final/)."""
    import jax
    from ttsx.train.refenc_trainer import RefEncTrainer
    from ttsx.train.checkpoint import restore_checkpoint

    template = RefEncTrainer(cfg).init_state(jax.random.PRNGKey(seed), mel)
    for tag in ("best", "final"):
        restored = restore_checkpoint(checkpoint, tag,
                                      {"refenc": template})
        if restored is not None:
            # trainer state params = {"model": ..., "<loss>_w": ...}
            return restored[0]["refenc"].params["model"]
    raise SystemExit(f"no best/ or final/ checkpoint under {checkpoint}")


def main_refenc_train(argv=None):
    """refenc-train: speaker-encoder training from a (path TAB speaker)
    file list (reference_encoder/train.py:35-192 contract: balanced
    sampling, crops, SpecAugment, periodic EER, best/final checkpoints).
    Host IO runs on the native prefetch executor (ttsx/native/prefetch.c,
    Python-thread fallback); the mel frontend is ONE batched in-graph
    call per batch. Crops are a fixed length for XLA static shapes."""
    p = argparse.ArgumentParser("refenc-train")
    add_common_args(p)
    p.add_argument("file_list")
    p.add_argument("--eval-list", help="held-out list for periodic EER")
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop-seconds", type=float, default=3.0)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--no-augment", action="store_true")
    args = p.parse_args(argv)
    _apply_device(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ttsx.core.config import RefEncConfig
    from ttsx.data import (WavBatchLoader, load_file_list, read_wav,
                           spec_augment)
    from ttsx.dsp import mel_spectrogram
    from ttsx.train.refenc_trainer import RefEncTrainer

    items = load_file_list(args.file_list)
    spk2id = {s: i for i, s in enumerate(sorted({s for _, s in items}))}
    cfg = RefEncConfig(num_speakers=max(len(spk2id), 2),
                       total_steps=args.max_steps,
                       eval_every=args.eval_every)
    sr = cfg.audio.sample_rate
    crop = int(args.crop_seconds * sr)
    trainer = RefEncTrainer(cfg)
    mel_fn = jax.jit(lambda w: mel_spectrogram(w, cfg.audio))
    rng = np.random.default_rng(args.seed)

    def to_mel(wav_batch):
        mel = np.asarray(mel_fn(jnp.asarray(wav_batch)))
        if not args.no_augment:
            mel = spec_augment(mel, rng, freq_mask=15, time_mask=35)
        return mel

    eval_fn = None
    if args.eval_list:
        ev_batches = []
        mels, labs = [], []
        for path, spk in load_file_list(args.eval_list):
            wav, _ = read_wav(path, sr)
            wav = (np.pad(wav, (0, max(0, crop - len(wav))))[:crop]
                   .astype(np.float32))
            mels.append(np.asarray(mel_fn(jnp.asarray(wav[None])))[0])
            labs.append(spk2id.get(spk, -1))
            if len(mels) == args.batch:
                ev_batches.append((np.stack(mels), np.asarray(labs)))
                mels, labs = [], []
        if mels:
            ev_batches.append((np.stack(mels), np.asarray(labs)))
        eval_fn = lambda state: trainer.evaluate_eer(state, ev_batches)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    # speaker balance (SpeakerBalancedSampler contract): oversample each
    # speaker's items to the max per-speaker count so the loader's uniform
    # sampling is balanced in expectation
    by_spk: dict = {}
    for pa, s in items:
        by_spk.setdefault(s, []).append(pa)
    cap = max(len(v) for v in by_spk.values())
    balanced = [(v[i % len(v)], spk2id[s])
                for s, v in by_spk.items() for i in range(cap)]
    with WavBatchLoader(balanced, crop=crop,
                        batch=args.batch, sample_rate=sr,
                        workers=args.workers, seed=args.seed) as loader:
        # drop batches containing undecodable rows (label -1 sentinel)
        stream = ((to_mel(w), l) for w, l in loader if (l >= 0).all())
        res = trainer.train(
            stream, eval_fn=eval_fn,
            max_steps=args.max_steps,
            checkpoint_dir=str(out / "checkpoints"),
            rng=jax.random.PRNGKey(args.seed))
        native = loader.is_native
    print(json.dumps({"steps": res["steps"], "best_eer": res["best_eer"],
                      "n_speakers": len(spk2id),
                      "native_loader": native,
                      "checkpoints": str(out / "checkpoints")}))
    return 0


def main_refenc_fuse(argv=None):
    """refenc-fuse: export the speaker encoder as serialized StableHLO +
    AOT-compile check — the TPU-native analog of verify_fusion.py:5-29's
    TorchScript + FX conv-BN fusion (fusion itself is XLA's job)."""
    p = argparse.ArgumentParser("refenc-fuse")
    add_common_args(p)
    p.add_argument("--checkpoint", help="refenc-train checkpoint dir")
    p.add_argument("--out", default="reference_encoder_exported.hlo")
    args = p.parse_args(argv)
    _apply_device(args.device)

    import jax
    import jax.numpy as jnp
    from ttsx.core.config import RefEncConfig
    from ttsx.models import ReferenceEncoder
    from ttsx.eval.export import export_reference_encoder, aot_compile

    cfg = RefEncConfig()
    model = ReferenceEncoder(cfg)
    frames = int(2.0 * cfg.audio.sample_rate / cfg.audio.hop_length)
    mel = jnp.zeros((1, frames, cfg.audio.n_mels), jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), mel)
    if args.checkpoint:
        params = _restore_refenc_params(cfg, args.checkpoint, mel,
                                        args.seed)
    blob = export_reference_encoder(params, cfg, args.out)
    exe = aot_compile(lambda m: model.apply(params, m), (mel,))
    print(json.dumps({"path": args.out, "bytes": len(blob),
                      "aot_compiled": exe is not None}))
    return 0


def main_refenc_eer(argv=None):
    """refenc-eer: EER over a (path TAB speaker) file list
    (reference_encoder/verify_eer.py:44-61)."""
    p = argparse.ArgumentParser("refenc-eer")
    add_common_args(p)
    p.add_argument("file_list")
    p.add_argument("--checkpoint",
                   help="checkpoint dir written by refenc-train "
                        "(containing best/ or final/)")
    p.add_argument("--allow-random", action="store_true",
                   help="permit an EER run on freshly initialized weights "
                        "(meaningless number; for harness smoke tests only)")
    args = p.parse_args(argv)
    _apply_device(args.device)
    if not args.checkpoint and not args.allow_random:
        # an EER from random weights looks like a metric but isn't
        p.error("refenc-eer requires --checkpoint (or --allow-random to "
                "explicitly accept a meaningless random-weight EER)")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ttsx.core.config import RefEncConfig
    from ttsx.models import ReferenceEncoder
    from ttsx.data.dataset import load_file_list, read_wav
    from ttsx.dsp import mel_spectrogram
    from ttsx.eval import all_pairs_eer

    cfg = RefEncConfig()
    model = ReferenceEncoder(cfg)
    params = None
    embs, spks = [], []
    for path, spk in load_file_list(args.file_list):
        wav, _ = read_wav(path, cfg.audio.sample_rate)
        mel = mel_spectrogram(jnp.asarray(wav[None]), cfg.audio)
        if params is None:
            params = model.init(jax.random.PRNGKey(args.seed), mel)
            if args.checkpoint:
                params = _restore_refenc_params(cfg, args.checkpoint,
                                                mel, args.seed)
        embs.append(np.asarray(model.apply(params, mel))[0])
        spks.append(spk)
    uniq = {s: i for i, s in enumerate(sorted(set(spks)))}
    eer = all_pairs_eer(np.stack(embs),
                        np.asarray([uniq[s] for s in spks]))
    print(json.dumps({"eer": eer, "n": len(embs)}))
    return 0


def main_refenc_latency(argv=None):
    """refenc-latency: 100-run average forward latency on a 2 s mel
    (reference_encoder/latency_benchmark.py:6-23)."""
    p = argparse.ArgumentParser("refenc-latency")
    add_common_args(p)
    p.add_argument("--runs", type=int, default=100)
    args = p.parse_args(argv)
    _apply_device(args.device)

    import jax
    import jax.numpy as jnp
    from ttsx.core.config import RefEncConfig
    from ttsx.models import ReferenceEncoder
    from ttsx.eval import time_fn

    cfg = RefEncConfig()
    model = ReferenceEncoder(cfg)
    frames = int(2.0 * cfg.audio.sample_rate / cfg.audio.hop_length)
    mel = jnp.zeros((1, frames, cfg.audio.n_mels))
    params = model.init(jax.random.PRNGKey(args.seed), mel)
    fn = jax.jit(lambda m: model.apply(params, m))
    stats = time_fn(fn, mel, runs=args.runs)
    print(json.dumps({"avg_ms": stats["mean_s"] * 1e3, "runs": args.runs}))
    return 0
