"""Host-side ASR / prosody-extract stages with pluggable service backends.

The reference runs WhisperX + ProsodyPredictorV15 per speaker
(reference_encoder/main.py:96-107, 322-383; modules/transcription/*).
External pretrained ASR nets are out-of-scope to retrain (SURVEY §2.9);
they sit behind the `ASRService` interface. The default backend is an
energy-VAD segmenter that emits timing-accurate segments with empty text —
every downstream JSON contract holds; a Whisper-class service can be
plugged in via `transcribe_fn` when available.

Prosody extraction runs the in-graph ProsodyPredictor (TPU) over the mel
frontend — the TPU-native replacement for the librosa/parselmouth fallback.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

from ttsx.core.config import AudioConfig, ProsodyConfig
from ttsx.pipeline.contracts import Stage, speaker_dir, write_json_atomic


class ASRService:
    """transcribe(wav, sr) -> {"segments": [{start, end, text, avg_logprob}]}"""

    def __init__(self, transcribe_fn: Optional[Callable] = None,
                 audio: AudioConfig | None = None,
                 vad_threshold: float = 0.05, min_gap_s: float = 0.3):
        self.transcribe_fn = transcribe_fn
        self.audio = audio or AudioConfig()
        self.vad_threshold = vad_threshold
        self.min_gap_s = min_gap_s

    def transcribe(self, wav: np.ndarray, sr: int) -> Dict:
        if self.transcribe_fn is not None:
            return self.transcribe_fn(wav, sr)
        # VAD segmentation fallback: correct timings, empty text
        import jax.numpy as jnp
        from ttsx.dsp import energy_vad
        v = np.asarray(energy_vad(jnp.asarray(wav[None]), self.audio))[0]
        hop_s = self.audio.hop_length / self.audio.sample_rate
        segments: List[Dict] = []
        start = None
        gap = 0
        max_gap = int(self.min_gap_s / hop_s)
        for i, on in enumerate(v):
            if on:
                if start is None:
                    start = i
                gap = 0
            elif start is not None:
                gap += 1
                if gap > max_gap:
                    segments.append(self._seg(start, i - gap, hop_s))
                    start, gap = None, 0
        if start is not None:
            segments.append(self._seg(start, len(v) - 1, hop_s))
        return {"segments": segments, "language": None}

    @staticmethod
    def _seg(a: int, b: int, hop_s: float) -> Dict:
        return {"start": round(a * hop_s, 3), "end": round((b + 1) * hop_s, 3),
                "text": "", "avg_logprob": 0.0, "vad_score": 1.0}


class TranscriptionStage(Stage):
    """Per-speaker transcription with VAD cleanup and >N-sample chunking
    (modules/transcription/transcription.py:15-136)."""
    name = "transcription"

    def __init__(self, asr: Optional[ASRService] = None,
                 chunk_s: float = 600.0, overlap_s: float = 0.5):
        self.asr = asr or ASRService()
        self.chunk_s = chunk_s
        self.overlap_s = overlap_s

    def run(self, context: Dict) -> Dict:
        from ttsx.data.dataset import read_wav
        results = {}
        sr = self.asr.audio.sample_rate
        for spk in context.get("speaker_ids", []):
            wav_path = Path(context["output_dir"]) / "speakers" / f"{spk}.wav"
            if not wav_path.exists():
                continue
            wav, _ = read_wav(wav_path, sr)
            chunk = int(self.chunk_s * sr)
            segments: List[Dict] = []
            if len(wav) <= chunk:
                segments = self.asr.transcribe(wav, sr)["segments"]
            else:
                # 10-min chunking with offset merge (transcription.py:37-52)
                step = chunk - int(self.overlap_s * sr)
                for off in range(0, len(wav), step):
                    part = wav[off:off + chunk]
                    if len(part) < sr // 2:
                        break
                    segs = self.asr.transcribe(part, sr)["segments"]
                    t0 = off / sr
                    for s in segs:
                        segments.append({**s, "start": s["start"] + t0,
                                         "end": s["end"] + t0})
                segments.sort(key=lambda s: s["start"])
            d = speaker_dir(context, spk)
            write_json_atomic(d / "transcript.json", {"segments": segments})
            results[spk] = {"n_segments": len(segments)}
        return {"speakers": results}


class ProsodyExtractStage(Stage):
    """Per-speaker prosody trend via the TPU ProsodyPredictor + DSP f0
    (main.py:322-352 prosody_extract)."""
    name = "prosody"

    def __init__(self, cfg: Optional[ProsodyConfig] = None, params=None,
                 max_frames: int = 4096):
        self.cfg = cfg or ProsodyConfig()
        self.params = params  # None -> DSP-only trend (no model)
        self.max_frames = max_frames
        self._predictor = None

    def run(self, context: Dict) -> Dict:
        import jax
        import jax.numpy as jnp
        from ttsx.data.dataset import read_wav
        from ttsx.dsp import mel_spectrogram, extract_f0_energy

        results = {}
        au = self.cfg.audio
        # fixed analysis window: long recordings stream through ONE
        # compiled program (main.py:156-295 >1 GB chunk processing,
        # expressed as static-shape windows instead of ffmpeg splits)
        win = self.max_frames * au.hop_length
        for spk in context.get("speaker_ids", []):
            wav_path = Path(context["output_dir"]) / "speakers" / f"{spk}.wav"
            if not wav_path.exists():
                continue
            wav, _ = read_wav(wav_path, au.sample_rate)
            f0_parts, en_parts, v_parts = [], [], []
            for off in range(0, max(len(wav), 1), win):
                part = wav[off:off + win]
                if len(part) < au.win_length:
                    break
                pad = win - len(part)
                if pad:
                    part = np.concatenate(
                        [part, np.zeros(pad, np.float32)])
                w = jnp.asarray(part[None])
                f0c, enc, vc = extract_f0_energy(w, au)
                n_valid = (len(wav) - off) // au.hop_length
                f0_parts.append(np.asarray(f0c)[0][:n_valid])
                en_parts.append(np.asarray(enc)[0][:n_valid])
                v_parts.append(np.asarray(vc)[0][:n_valid])
            f0 = np.concatenate(f0_parts) if f0_parts else np.zeros(0)
            energy = np.concatenate(en_parts) if en_parts else np.zeros(0)
            voiced = np.concatenate(v_parts) if v_parts else np.zeros(0,
                                                                      bool)
            trend = {
                "f0": f0.round(2).tolist(),
                "energy": energy.round(5).tolist(),
                "voiced_ratio": float(voiced.mean()) if len(voiced) else 0.0,
            }
            if self.params is not None:
                from ttsx.models.prosody import ProsodyPredictor
                if self._predictor is None:
                    self._predictor = ProsodyPredictor(self.cfg)
                head = jnp.asarray(wav[None, :win])
                mel = mel_spectrogram(head, au)[:, :self.max_frames]
                feats = self._predictor.apply(self.params, mel)
                trend["model_f0"] = np.asarray(
                    feats["f0"])[0].round(2).tolist()
                trend["speech_rate"] = float(feats["speech_rate"][0, 0])
                trend["pause_dur"] = float(feats["pause_dur"][0, 0])
                trend["mfcc"] = np.asarray(feats["mfcc"])[0].round(3).tolist()
            d = speaker_dir(context, spk)
            write_json_atomic(d / "prosody_trend.json", trend)
            results[spk] = {"frames": len(trend["f0"])}
        return {"speakers": results}
