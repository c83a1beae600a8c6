"""One-shot TPU dump for offline hard-diarizer clustering iteration.

Replicates eval/parity_diar.py's production path exactly (same stream,
same trained nets) but stops after embedding: everything downstream
(tcn context, clustering, k estimation, stitching, overlap labeling,
DER) is pure numpy and iterates instantly on CPU from the dumped npz.

Writes eval_results/diar_embs.npz with:
  wav, sr, truth (structured: start/end/spk), ov_truth,
  slices_raw (VAD), regions (screened overlaps: start/end/prob),
  win_plain / emb_plain   (no-screen split path),
  win_screen / emb_screen (screen-split path).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ttsx.eval.parity_common import AUDIO, make_corpus

SEED = 0
N_SPK, N_TURNS, NOISE_DB, OV_PROB = 6, 48, 12.0, 0.3
TRAIN_STEPS, SCREEN_STEPS = 800, 300
SUBSEG = 1.0


def main():
    from ttsx.eval.parity_aux import _train_slice_encoder
    from ttsx.pipeline.diarizer.controller import DiarizerController
    from ttsx.pipeline.diarizer.embedding import SliceEmbedder
    from ttsx.pipeline.diarizer.overlap import (screen_stream,
                                                split_slices_at_overlaps)
    from ttsx.pipeline.diarizer.overlap_net import (OverlapScreen,
                                                    train_overlap_net)
    from ttsx.pipeline.diarizer.slicer import dynamic_slice

    corpus = make_corpus("tone", n_speakers=max(N_SPK, 4), audio=AUDIO,
                         seed=SEED)
    wav, truth, ov_truth = corpus.dialogue_hard(
        list(range(N_SPK)), N_TURNS, noise_db=NOISE_DB,
        overlap_prob=OV_PROB, seed=SEED)

    cfg, params = _train_slice_encoder(corpus, steps=TRAIN_STEPS,
                                       seed=SEED, noise_db=NOISE_DB)
    emb = SliceEmbedder(AUDIO, cfg=cfg, params=params)
    net = train_overlap_net(corpus, AUDIO, steps=SCREEN_STEPS, seed=SEED)
    screen = OverlapScreen(AUDIO, net["params"])

    slices_raw, _stats = dynamic_slice(wav, AUDIO, 0.8, 3.0)
    regions = screen_stream(wav, AUDIO, screen, slices_raw)

    ctl = DiarizerController(AUDIO, subsegment_s=SUBSEG)
    win_plain = ctl._explode(slices_raw)
    win_screen = ctl._explode(
        split_slices_at_overlaps(slices_raw, regions))

    emb_plain = emb.extract(wav, win_plain)
    emb_screen = emb.extract(wav, win_screen)

    out = Path("eval_results/diar_embs.npz")
    np.savez_compressed(
        out, wav=wav, sr=AUDIO.sample_rate,
        truth_start=np.asarray([s for s, _, _ in truth]),
        truth_end=np.asarray([e for _, e, _ in truth]),
        truth_spk=np.asarray([spk for _, _, spk in truth]),
        ov_truth=np.asarray(ov_truth, np.float64).reshape(-1, 2),
        slices_raw=np.asarray(slices_raw, np.float64),
        regions=np.asarray(regions, np.float64).reshape(-1, 3),
        win_plain=np.asarray(win_plain, np.float64),
        win_screen=np.asarray(win_screen, np.float64),
        emb_plain=emb_plain, emb_screen=emb_screen,
        overlap_eval=json.dumps(net["eval"]))
    print(json.dumps({
        "n_slices_raw": len(slices_raw), "n_regions": len(regions),
        "n_win_plain": len(win_plain), "n_win_screen": len(win_screen),
        "emb_dim": int(emb_plain.shape[1]),
        "overlap_eval": net["eval"]}))


if __name__ == "__main__":
    main()
