"""Observer ingestion pipeline orchestrator.

Re-designs reference_encoder/main.py:67-154 pipeline():
  diarize input wav -> per-speaker wavs -> prosody + transcription ->
  drift -> alignment -> tier1 -> tier2 -> anomaly -> fingerprint -> arc ->
  plot_map -> observer report -> dynamic learning -> git sync,
with per-stage step timing, defensive per-stage failure isolation
(SURVEY §5.3), and job status (queued/processing/done/partial-failure/
failed). Resource logging (main.py:49-65) uses psutil when available.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

from ttsx.core.config import AudioConfig
from ttsx.pipeline.contracts import write_json_atomic
from ttsx.pipeline.diarizer.controller import DiarizerController
from ttsx.pipeline.asr import (ASRService, TranscriptionStage,
                               ProsodyExtractStage)
from ttsx.pipeline.drift import DriftStage
from ttsx.pipeline.alignment import AlignmentStage
from ttsx.pipeline.tiers import Tier1Stage, Tier2Stage
from ttsx.pipeline.anomaly import AnomalyStage
from ttsx.pipeline.fingerprint import FingerprintStage, ArcStage
from ttsx.pipeline.plot_map import PlotMapStage
from ttsx.pipeline.dynamic_learning import DynamicLearningStage
from ttsx.pipeline.git_sync import GitSyncStage
from ttsx.pipeline.observer_ui import ReviewSession

log = logging.getLogger("ttsx.pipeline")


def log_resources() -> Dict:
    """RAM/CPU snapshot (main.py:49-65; nvidia-smi -> jax device stats)."""
    out: Dict = {"time": time.time()}
    try:
        import psutil
        out["ram_gb"] = psutil.virtual_memory().used / 1e9
        out["cpu_pct"] = psutil.cpu_percent(interval=None)
    except Exception:
        pass
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        if stats:
            out["device_bytes_in_use"] = stats.get("bytes_in_use")
    except Exception:
        pass
    return out


class ObserverPipeline:
    def __init__(self, au: Optional[AudioConfig] = None,
                 diarizer: Optional[DiarizerController] = None,
                 asr: Optional[ASRService] = None,
                 prosody_params=None,
                 git_repo: Optional[str] = None):
        self.au = au or AudioConfig()
        self.diarizer = diarizer or DiarizerController(self.au)
        self.asr = asr or ASRService(audio=self.au)
        self.stages = [
            ProsodyExtractStage(params=prosody_params),
            TranscriptionStage(self.asr),
            DriftStage(),
            AlignmentStage(),
            Tier1Stage(),
            Tier2Stage(),
            AnomalyStage(),
            FingerprintStage(),
            ArcStage(),
            PlotMapStage(),
            DynamicLearningStage(),
            GitSyncStage(git_repo),
        ]

    def run_job(self, input_wav: str, output_dir: str,
                job_id: Optional[str] = None) -> Dict:
        job_id = job_id or Path(input_wav).stem
        out_dir = Path(output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        # bounded run log for watcher deployments (ref main.py's
        # RotatingFileHandler intent; ttsx.utils.logs)
        from ttsx.utils.logs import attach_rotating_handler
        attach_rotating_handler(log, out_dir / "pipeline.log")
        context: Dict = {
            "job_id": job_id,
            "input_wav": input_wav,
            "output_dir": str(out_dir),
            "speaker_ids": [],
            "step_times": {},
            "resources": [log_resources()],
        }
        status = "done"

        # 1) diarize + rebuild per-speaker wavs (+ transcripts if asr text)
        t0 = time.perf_counter()
        dia = self.diarizer.diarize_single(input_wav, str(out_dir),
                                           asr=self.asr)
        context["step_times"]["diarize"] = time.perf_counter() - t0
        if not dia:
            status = "partial-failure"
        context["speaker_ids"] = sorted(set(dia.get("speakers", [])))

        # 2) sequential JSON-dataflow stages
        results = {}
        for stage in self.stages:
            out = stage(context)
            results[stage.name] = out
            if out.get("status") == "failed":
                log.warning("stage %s failed: %s", stage.name,
                            out.get("error"))
                status = "partial-failure"
            context["resources"].append(log_resources())

        # 3) observer static report
        try:
            ReviewSession(str(out_dir)).html_report(
                str(out_dir / "observer_report.html"))
        except Exception as e:
            log.warning("observer report failed: %s", e)
            status = "partial-failure"

        write_json_atomic(out_dir / "step_times.json",
                          context["step_times"])
        summary = {"job_id": job_id, "status": status,
                   "speakers": context["speaker_ids"],
                   "stages": {k: v.get("status") for k, v in results.items()},
                   "step_times": context["step_times"]}
        write_json_atomic(out_dir / "job_summary.json", summary)
        return summary


def watch(watch_dir: str, output_root: str, **kwargs):
    """--watch mode: trigger watcher + worker loop (main.py:419-441)."""
    from ttsx.pipeline.trigger import (JobQueue, TriggerWatcher, Worker,
                                       install_graceful_shutdown)
    pipe = ObserverPipeline(**kwargs)
    q = JobQueue()

    def process(job):
        return pipe.run_job(job["input_wav"],
                            str(Path(output_root) / job["job_id"]),
                            job["job_id"])

    watcher = TriggerWatcher(watch_dir, q)
    worker = Worker(q, process)
    install_graceful_shutdown(watcher, worker)
    watcher.start()
    worker.start()
    return watcher, worker, q
