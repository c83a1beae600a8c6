"""First-party native (C) host components.

The TPU compute path is jax/XLA/Pallas; everything host-side that sits on
the data-loading hot path is a candidate for native code. Members:

  * `_ttsx_wavio` — single-pass RIFF/WAVE decoder (parse -> mono-mix ->
    normalize -> linear resample straight into the output numpy buffer),
    replacing the scipy read + two numpy temporaries per file in
    `ttsx.data.dataset.read_wav` (reference decodes via torchaudio's C++
    readers inside dataloader workers, data_loading1/data.set.py:26-158).
  * `_ttsx_prefetch` — pthreads data-loading executor: a worker pool
    decodes + random-crops wavs and assembles whole [batch, crop] batches
    into a bounded ring buffer entirely outside the GIL (the ttsx
    equivalent of the reference's DataLoader(num_workers=4) worker
    processes, reference_encoder/train.py:52-69). Both share the decode
    core in wav_core.h.

Extensions are compiled on first import with the toolchain in the image
and cached next to this file; import falls back to None (callers keep the
Python paths) if no compiler is available. Build explicitly with
`python -m ttsx.native.build`.
"""
from __future__ import annotations

import os
import sysconfig
from pathlib import Path

_HERE = Path(__file__).parent
_EXT = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
_SOURCES = {
    "_ttsx_wavio": ["wavio.c"],
    "_ttsx_prefetch": ["prefetch.c"],
}
_SHARED_HDRS = ["wav_core.h"]


def _build_one(mod: str, verbose: bool = False) -> bool:
    import subprocess

    import numpy as np

    cc = os.environ.get("CC", "gcc")
    cmd = [
        cc, "-O3", "-shared", "-fPIC", "-std=c11", "-pthread",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        *[str(_HERE / s) for s in _SOURCES[mod]],
        "-o", str(_HERE / (mod + _EXT)),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if verbose and r.returncode != 0:
        print(r.stderr)
    return r.returncode == 0


def build(verbose: bool = False) -> bool:
    """Compile every native extension next to this file."""
    return all(_build_one(m, verbose) for m in _SOURCES)


def _load(mod: str):
    so = _HERE / (mod + _EXT)
    srcs = [_HERE / s for s in _SOURCES[mod]] + \
           [_HERE / h for h in _SHARED_HDRS]
    if not so.exists() or so.stat().st_mtime < max(s.stat().st_mtime
                                                  for s in srcs):
        if not _build_one(mod):
            return None
    try:
        import importlib
        return importlib.import_module(f"ttsx.native.{mod}")
    except ImportError:
        return None


wavio = _load("_ttsx_wavio")
prefetch = _load("_ttsx_prefetch")

__all__ = ["wavio", "prefetch", "build"]
