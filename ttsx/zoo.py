"""Pretrained-parameter zoo: load git-tracked slim exports into a
runnable `TTSPipeline`.

The parity harness (`python -m ttsx.eval.parity_aux --exp e2e --arg
zoo_dir='"eval_results/zoo"'`) trains the chain on the tone corpus and
exports acoustic/refiner/vocoder slim npz files; this module restores
them, so a fresh clone can synthesize with trained weights without
retraining (the full Orbax checkpoints are gitignored and do not survive
round boundaries).

The reference ships no pretrained weights at all (SURVEY §5.4 — its
trainers write local torch.save files); this is a capability on top of
parity.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax

DEFAULT_ZOO = Path(__file__).resolve().parent.parent / "eval_results/zoo"


def zoo_info(zoo_dir: Optional[str] = None) -> Dict:
    """Metadata of the checked-in zoo ({} if absent)."""
    zd = Path(zoo_dir) if zoo_dir else DEFAULT_ZOO
    meta = zd / "zoo.json"
    return json.loads(meta.read_text()) if meta.exists() else {}


def load_pipeline(cfg=None, zoo_dir: Optional[str] = None,
                  rng: Optional[jax.Array] = None,
                  frames: int = 128) -> Tuple["TTSPipeline", Dict]:
    """Build a TTSPipeline and fill its params from the zoo.

    Stages without an export keep their fresh init (a warning key lists
    them in the returned params dict under "_missing").
    Config must match the one the zoo was trained with (the default is
    `ttsx.eval.parity._tts_cfg()` — see zoo.json).
    """
    from ttsx.models.pipeline import TTSPipeline
    from ttsx.train.slim_export import load_slim

    if cfg is None:
        from ttsx.eval.parity import _tts_cfg
        cfg = _tts_cfg()
    zd = Path(zoo_dir) if zoo_dir else DEFAULT_ZOO
    pipe = TTSPipeline(cfg)
    params = pipe.init_params(rng if rng is not None
                              else jax.random.PRNGKey(0), frames=frames)
    missing = []
    ac = zd / "acoustic.npz"
    if ac.exists():
        params["acoustic"] = load_slim(
            str(ac), {"acoustic": params["acoustic"]})["acoustic"]
    else:
        missing.append("acoustic")
    rf = zd / "refiner.npz"
    if rf.exists():
        params["refiner"] = load_slim(
            str(rf), {"refiner": params["refiner"]})["refiner"]
    else:
        missing.append("refiner")
    vc = zd / "vocoder.npz"
    if vc.exists():
        got = load_slim(str(vc), {"gen_ema": params["generator"],
                                  "gst": params["gst"]})
        params["generator"], params["gst"] = got["gen_ema"], got["gst"]
    else:
        missing.append("vocoder")
    params["_missing"] = missing
    return pipe, params
