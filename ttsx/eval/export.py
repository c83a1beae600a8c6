"""Model export: AOT compilation + serialized StableHLO artifacts.

TPU-native replacement for the reference's TorchScript export with FX
Conv-BN fusion (reference_encoder/verify_fusion.py:5-29). On TPU, operator
fusion is XLA's job — the export path is jax.export (StableHLO bytes that
reload without Python model code) plus an AOT-compiled executable for
same-topology serving.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def export_stablehlo(fn: Callable, args: Sequence[Any],
                     path: str | Path) -> bytes:
    """Serialize jit(fn) at the given example args to StableHLO bytes."""
    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    Path(path).write_bytes(blob)
    return blob


def load_stablehlo(path: str | Path) -> Callable:
    """Reload a serialized function; returns a callable over jax arrays."""
    from jax import export as jexport
    blob = Path(path).read_bytes()
    exported = jexport.deserialize(bytearray(blob))
    return exported.call


def aot_compile(fn: Callable, args: Sequence[Any]):
    """AOT-lower and compile; returns the executable (compile happens now,
    not at first call — the serving-warmup equivalent of scripting)."""
    lowered = jax.jit(fn).lower(*args)
    return lowered.compile()


def export_reference_encoder(params, cfg=None, path: str | Path =
                             "reference_encoder_exported.hlo"):
    """Export the speaker encoder like verify_fusion.py exports
    reference_encoder_scripted.pt."""
    from ttsx.core.config import RefEncConfig
    from ttsx.models.reference_encoder import ReferenceEncoder

    cfg = cfg or RefEncConfig()
    model = ReferenceEncoder(cfg)
    frames = int(2.0 * cfg.audio.sample_rate / cfg.audio.hop_length)
    mel = jnp.zeros((1, frames, cfg.audio.n_mels), jnp.float32)

    def fn(m):
        return model.apply(params, m)

    return export_stablehlo(fn, (mel,), path)
