"""Orbax checkpointing of train-state pytrees (+ PRNG keys).

TPU-native replacement for the reference's torch.save flat dicts with
model/opt/sched/scaler/EMA + RNG states (train/engine/trainer.py:129-151);
JAX PRNG keys are part of the state pytree, so bit-reproducible resume
comes for free. best/periodic policy per SURVEY §5.4.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _split_static(states: Dict[str, Any]):
    """Extract the array pytree (TrainStates keep tx/apply_fn static)."""
    return jax.tree_util.tree_map(np.asarray, states)


def save_checkpoint(directory: str, tag: str, block_states: Dict[str, Any],
                    step: int, extra: Optional[Dict] = None) -> None:
    path = Path(directory).absolute() / tag
    ckptr = ocp.PyTreeCheckpointer()
    arrays = jax.tree_util.tree_map(lambda x: x, block_states)
    ckptr.save(path / "state", arrays, force=True)
    meta = {"step": int(step), "extra": extra or {}}
    (path / "meta.json").write_text(json.dumps(meta))


def restore_checkpoint(directory: str, tag: str,
                       template_states: Dict[str, Any]
                       ) -> Optional[Tuple[Dict, int, Dict]]:
    path = Path(directory).absolute() / tag
    if not (path / "meta.json").exists():
        return None
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path / "state", item=template_states)
    meta = json.loads((path / "meta.json").read_text())
    return restored, meta["step"], meta.get("extra", {})
