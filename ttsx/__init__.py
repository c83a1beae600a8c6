"""ttsx — TPU-native TTS framework (rebuild of TTS-Core-Remastered-1).

Public surface. Imports are lazy so `import ttsx` stays cheap and pulling
one subsystem doesn't drag the rest (the pipeline stages, trainers, and
serving layer each import jax/flax trees of their own).
"""
from __future__ import annotations

__version__ = "0.4.0"

# name -> "module:attr" (resolved on first access)
_EXPORTS = {
    # config tree
    "TTSXConfig": "ttsx.core.config:TTSXConfig",
    "AudioConfig": "ttsx.core.config:AudioConfig",
    "RefEncConfig": "ttsx.core.config:RefEncConfig",
    "ProsodyConfig": "ttsx.core.config:ProsodyConfig",
    "AcousticConfig": "ttsx.core.config:AcousticConfig",
    "RefinerConfig": "ttsx.core.config:RefinerConfig",
    "VocoderConfig": "ttsx.core.config:VocoderConfig",
    "TrainConfig": "ttsx.core.config:TrainConfig",
    "save_config": "ttsx.core.config:save_config",
    "load_config": "ttsx.core.config:load_config",
    # models
    "TTSPipeline": "ttsx.models.pipeline:TTSPipeline",
    "SynthesisOutput": "ttsx.models.pipeline:SynthesisOutput",
    "ReferenceEncoder": "ttsx.models.reference_encoder:ReferenceEncoder",
    "ProsodyPredictor": "ttsx.models.prosody:ProsodyPredictor",
    "AcousticModel": "ttsx.models.acoustic:AcousticModel",
    "ScoreSDERefiner": "ttsx.models.refiner:ScoreSDERefiner",
    "Generator": "ttsx.models.vocoder:Generator",
    # training
    "UnifiedTrainer": "ttsx.train.engine:UnifiedTrainer",
    "Observer": "ttsx.train.observer:Observer",
    # serving
    "SynthesisServer": "ttsx.serve:SynthesisServer",
    "StreamingSynthesizer": "ttsx.streaming:StreamingSynthesizer",
    "serve_from_zoo": "ttsx.zoo:serve_from_zoo",
    "load_pipeline": "ttsx.zoo:load_pipeline",
    "load_refenc": "ttsx.zoo:load_refenc",
    "load_prosody": "ttsx.zoo:load_prosody",
    "load_diar_encoder": "ttsx.zoo:load_diar_encoder",
    # ingestion pipeline + diarizer
    "ObserverPipeline": "ttsx.pipeline:ObserverPipeline",
    "DiarizerController": "ttsx.pipeline.diarizer:DiarizerController",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    try:
        target = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'ttsx' has no attribute {name!r}")
    import importlib
    mod, attr = target.split(":")
    value = getattr(importlib.import_module(mod), attr)
    globals()[name] = value  # cache
    return value


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
