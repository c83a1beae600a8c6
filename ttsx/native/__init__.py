"""First-party native (C) host components.

The TPU compute path is jax/XLA/Pallas; everything host-side that sits on
the data-loading hot path is a candidate for native code. First member:
`_ttsx_wavio`, a single-pass RIFF/WAVE decoder (parse -> mono-mix ->
normalize -> linear resample straight into the output numpy buffer),
replacing the scipy read + two numpy temporaries per file in
`ttsx.data.dataset.read_wav` (reference decodes via torchaudio's C++
readers inside dataloader workers, data_loading1/data.set.py:26-158).

The extension is compiled on first import with the toolchain in the image
and cached next to this file; import falls back to None (callers keep the
scipy path) if no compiler is available. Build explicitly with
`python -m ttsx.native.build`.
"""
from __future__ import annotations

import os
import sysconfig
from pathlib import Path

_HERE = Path(__file__).parent
_SO = _HERE / ("_ttsx_wavio" + (sysconfig.get_config_var("EXT_SUFFIX")
                                or ".so"))


def build(verbose: bool = False) -> bool:
    """Compile wavio.c -> _ttsx_wavio*.so next to this file."""
    import subprocess

    import numpy as np

    src = _HERE / "wavio.c"
    cc = os.environ.get("CC", "gcc")
    cmd = [
        cc, "-O3", "-shared", "-fPIC", "-std=c11",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        str(src), "-o", str(_SO),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if verbose and r.returncode != 0:
        print(r.stderr)
    return r.returncode == 0


def _load():
    if not _SO.exists() or _SO.stat().st_mtime < (_HERE / "wavio.c").stat().st_mtime:
        if not build():
            return None
    try:
        from ttsx.native import _ttsx_wavio  # type: ignore
        return _ttsx_wavio
    except ImportError:
        return None


wavio = _load()

__all__ = ["wavio", "build"]
