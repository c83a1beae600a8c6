from ttsx.pipeline.contracts import (
    Stage, file_lock, write_json_atomic, read_json, speaker_dir)
from ttsx.pipeline.sentiment import polarity_scores, vader_vector
from ttsx.pipeline import emotion_utils
from ttsx.pipeline.drift import DriftStage, detect_drift, savgol_smooth
from ttsx.pipeline.alignment import AlignmentStage
from ttsx.pipeline.tiers import Tier1Stage, Tier2Stage
from ttsx.pipeline.anomaly import AnomalyStage, repetition_ratio
from ttsx.pipeline.fingerprint import FingerprintStage, ArcStage, kmeans_1d
from ttsx.pipeline.plot_map import PlotMapStage
from ttsx.pipeline.dynamic_learning import (
    DynamicLearningStage, load_tagged_data, update_validation_set,
    update_rule_confidences, check_accuracy_drop)
from ttsx.pipeline.git_sync import GitSyncStage, build_manifest
from ttsx.pipeline.trigger import (
    JobQueue, TriggerWatcher, Worker, install_graceful_shutdown)
from ttsx.pipeline.asr import ASRService, TranscriptionStage, ProsodyExtractStage
from ttsx.pipeline.observer_ui import ReviewSession
from ttsx.pipeline.orchestrator import ObserverPipeline, watch, log_resources
