"""Offline hard-diarizer clustering iteration from dump_diar_embs.npz.

Pure numpy — replicates the controller's post-embedding pipeline
(context -> cluster -> smooth -> merge -> stitch -> overlap labeling ->
DER) so clustering/k-estimation variants evaluate in seconds on CPU
instead of a 12-minute TPU benchmark run per trial.
"""
from __future__ import annotations

import itertools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ttsx.eval.metrics import diarization_error_rate
from ttsx.pipeline.diarizer.cluster import (
    ReIDMemory, merge_clusters, spectral_cluster, stitch_segments,
    KMeansClusterer, GreedyModularityClusterer, time_aware_sim)
from ttsx.pipeline.diarizer.controller import trim_cross_speaker_overlaps

D = np.load("eval_results/diar_embs.npz", allow_pickle=True)
TRUTH = [(float(s), float(e), str(k)) for s, e, k in
         zip(D["truth_start"], D["truth_end"], D["truth_spk"])]
REGIONS = [tuple(r) for r in D["regions"]]
TRUE_K = len(set(k for _, _, k in TRUTH))


def oracle_labels(wins):
    """Dominant true speaker per window (overlap -> the more-covered)."""
    lab = []
    for s, e in wins:
        cover = {}
        for ts, te, spk in TRUTH:
            cover[spk] = cover.get(spk, 0.0) + max(
                0.0, min(e, te) - max(s, ts))
        lab.append(max(cover, key=cover.get) if cover else "sil")
    uniq = sorted(set(lab))
    return np.asarray([uniq.index(l) for l in lab]), lab


def label_overlaps(slices, labels, embs):
    """detect_overlaps' screened branch from the dumped regions."""
    e_norm = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    uniq = np.unique(labels)
    protos = {int(c): e_norm[labels == c].mean(axis=0) for c in uniq}
    for c in protos:
        protos[c] = protos[c] / (np.linalg.norm(protos[c]) + 1e-8)
    out = []
    for s, e, p in REGIONS:
        mid = 0.5 * (s + e)
        order = np.argsort([abs(0.5 * (a + b) - mid) for a, b in slices])
        i0 = int(order[0])
        la = int(labels[i0])
        cands = [(float(protos[int(c)] @ e_norm[i0]), int(c))
                 for c in uniq if int(c) != la]
        lb = max(cands)[1] if cands else la
        out.append((s, e, la, lb, p))
    return out


def run_pipeline(wins, embs, cluster_fn, tcn=True, smooth=True,
                 merge_thresh=0.0, use_overlaps=True, reassign=0):
    wins = [tuple(w) for w in wins]
    starts = np.asarray([s for s, _ in wins])
    e = embs
    if tcn:
        e = ReIDMemory.tcn_context(e, starts)
    labels = cluster_fn(e, starts)
    if smooth:
        labels = ReIDMemory.smooth_labels(labels, starts, e)
    if merge_thresh > 0:
        labels = merge_clusters(e, labels, merge_thresh)
    for _ in range(reassign):
        uniq = np.unique(labels)
        en = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-8)
        protos = np.stack([en[labels == c].mean(0) for c in uniq])
        protos /= np.linalg.norm(protos, axis=1, keepdims=True) + 1e-8
        labels = uniq[np.argmax(en @ protos.T, axis=1)]
        _, labels = np.unique(labels, return_inverse=True)
    segs, seg_labels, seg_embs = stitch_segments(wins, labels, e)
    speakers = [f"c{int(l)}" for l in seg_labels]
    hyp = []
    if use_overlaps:
        ovs = label_overlaps(segs, seg_labels, seg_embs)
        hyp += [(s, e_, f"c{spk}") for s, e_, la, lb, _p in ovs
                for spk in (la, lb)]
    segs = trim_cross_speaker_overlaps(segs, speakers)
    hyp = [(s, e_, spk) for (s, e_), spk in zip(segs, speakers)] + hyp
    return {
        "der": round(float(diarization_error_rate(TRUTH, hyp)), 4),
        "der_collar": round(float(diarization_error_rate(
            TRUTH, hyp, collar=0.25)), 4),
        "k": int(len(set(speakers))), "n_segs": len(segs)}


def nme_spectral(embs, starts=None, max_k=10, ps=(10, 20, 30, 40, 50,
                                                  60, 70, 80)):
    """NME-SC style: sweep the affinity row-pruning percentile, pick the
    p that maximizes (eigengap / k) normalized, then cluster at that p
    with the eigengap k."""
    e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    n = len(e)
    aff0 = np.clip(e @ e.T, 0.0, None)
    np.fill_diagonal(aff0, 0.0)
    best = None
    for p in ps:
        floor = np.percentile(aff0, p, axis=1, keepdims=True)
        aff = np.where(aff0 >= floor, aff0, 0.0)
        aff = 0.5 * (aff + aff.T)
        d = aff.sum(axis=1)
        dinv = 1.0 / np.sqrt(d + 1e-8)
        lap = np.eye(n) - dinv[:, None] * aff * dinv[None, :]
        w, v = np.linalg.eigh(lap)
        kmax = int(min(max_k, n - 1))
        gaps = np.diff(w[: kmax + 1])
        k = int(np.argmax(gaps[1:])) + 2 if kmax >= 2 else 1
        g = float(gaps[k - 1])
        score = g / max(k, 1)
        if best is None or score > best[0]:
            best = (score, k, v)
    _, k, v = best
    vecs = v[:, :k]
    vecs = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-8)
    return KMeansClusterer(k=k).cluster_embeddings(vecs)


def main():
    for tag in ("plain", "screen"):
        wins, embs = D[f"win_{tag}"], D[f"emb_{tag}"]
        olab, names = oracle_labels(wins)
        # embedding separability diagnostic
        en = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
        cos = en @ en.T
        same = np.asarray([[a == b for b in names] for a in names])
        off = ~np.eye(len(en), dtype=bool)
        print(f"== {tag}: {len(wins)} windows, same-cos "
              f"{cos[same & off].mean():.3f} diff-cos "
              f"{cos[~same & off].mean():.3f}")

        variants = {
            "oracle_labels": lambda e, s: olab,
            "current_eigengap": lambda e, s: spectral_cluster(e),
            "spectral_oracle_k": lambda e, s: spectral_cluster(e, k=TRUE_K),
            "nme": lambda e, s: nme_spectral(e),
            "kmeans_sqrt": lambda e, s:
                KMeansClusterer().cluster_embeddings(e),
            "modularity": lambda e, s:
                GreedyModularityClusterer().cluster(time_aware_sim(e, s)),
        }
        for name, fn in variants.items():
            for tcn in (True, False):
                r = run_pipeline(wins, embs, fn, tcn=tcn)
                print(f"  {name:20s} tcn={int(tcn)} -> {r}")


if __name__ == "__main__":
    main()
