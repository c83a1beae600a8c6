"""Slim (inference-only) parameter export.

The full Orbax train-state trees (G+D+opts+EMA, ~hundreds of MB) are
gitignored and do not survive round boundaries — round 2's cumulative
vocoder checkpoint was lost with the clone. This module exports just the
parameters needed to *synthesize* (EMA generator + GST) as a compressed
float16 npz small enough to track in git, and restores them into a fresh
init so a later round can evaluate, serve, or warm-start training from
the trained weights.

Reference analog: the reference ships no checkpoint at all; its trainers
save full `torch.save` dicts only (vocoder7/trainer.py, SURVEY §5.4).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

# leaves smaller than this stay float32 (norm scales/biases are cheap and
# precision-sensitive; the big conv kernels dominate the file size)
_F16_MIN_SIZE = 1024


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(kp): np.asarray(leaf) for kp, leaf in flat}


def save_slim(path: str, trees: Dict[str, Any]) -> None:
    """Write `trees` (name -> param pytree) as one compressed npz.

    float32 leaves with >= _F16_MIN_SIZE elements are stored float16;
    everything else keeps its dtype. Keys are ``<name>|<keystr>``.
    """
    import os

    out: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        for key, leaf in _flatten(tree).items():
            if leaf.dtype == np.float32 and leaf.size >= _F16_MIN_SIZE:
                leaf = leaf.astype(np.float16)
            out[f"{name}|{key}"] = leaf
    # atomic replace: zoo exports are re-written by live training legs
    # while tests/serving may be reading them (an in-place savez gave a
    # reader a truncated zip -> EOFError, observed round 5)
    tmp = f"{path}.tmp.{os.getpid()}"
    np.savez_compressed(tmp, **out)
    # savez appends .npz to paths without the suffix
    if not tmp.endswith(".npz") and os.path.exists(f"{tmp}.npz"):
        tmp = f"{tmp}.npz"
    os.replace(tmp, path)


def load_slim(path: str, templates: Dict[str, Any],
              allow_missing: Any = False) -> Dict[str, Any]:
    """Restore pytrees from a `save_slim` file.

    `templates` supplies the tree structure and target dtypes (a fresh
    `.init()` result); every template leaf must be present in the file
    unless `allow_missing` — then absent leaves keep their template
    (fresh-init) values. That is the warm-start upgrade path for params
    added after an export was written (e.g. the zero-init `scale_proj`
    of VocoderConfig.scale_cond: fresh zeros reproduce the exported
    model's forward exactly until trained).

    `allow_missing` may be True (any leaf may fall back — every fallback
    is reported on stderr) or an iterable of key substrings: a missing
    leaf whose key contains none of them still raises, so a wrong file /
    renamed module / truncated npz cannot silently load a partially
    random model (ADVICE r2 medium #1).
    """
    import sys

    allowlist = None
    if allow_missing and not isinstance(allow_missing, bool):
        allowlist = tuple(allow_missing)
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}
    missing: list = []
    out: Dict[str, Any] = {}
    for name, template in templates.items():
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for kp, tleaf in flat:
            key = f"{name}|{jax.tree_util.keystr(kp)}"
            if key not in stored:
                if allow_missing and (allowlist is None
                                      or any(s in key for s in allowlist)):
                    missing.append(key)
                    leaves.append(np.asarray(tleaf))
                    continue
                raise KeyError(f"slim export {path!r} is missing {key!r}")
            arr = stored[key]
            if arr.shape != np.shape(tleaf):
                raise ValueError(
                    f"{key!r}: stored shape {arr.shape} != template "
                    f"{np.shape(tleaf)}")
            leaves.append(arr.astype(np.asarray(tleaf).dtype))
        out[name] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(
                jax.tree_util.tree_map(lambda x: 0, template)), leaves)
    if missing:
        print(f"load_slim: {len(missing)} leaves absent from {path!r} "
              f"kept fresh-init values: {missing}", file=sys.stderr)
    return out


def save_vocoder_slim(path: str, states: Any,
                      meta: Optional[Dict] = None) -> None:
    """Export the synthesis-relevant subset of a VocoderBlock state:
    the EMA generator (falling back to live params) and GST."""
    gen = (states.gen.ema_params if states.gen.ema_params is not None
           else states.gen.params)
    trees = {"gen_ema": gen, "gst": states.gst.params}
    if meta:
        trees["_meta"] = {k: np.asarray(v) for k, v in meta.items()}
    save_slim(path, trees)


# params that may legitimately be absent from an older export: leaves
# added to the model AFTER the export was written, all zero-init so the
# warm-started forward is bit-identical until trained. Anything else
# missing means the wrong file, and load_vocoder_slim must raise.
_WARM_START_OK = ("scale_proj",)


def load_slim_meta(path: str) -> Dict[str, np.ndarray]:
    """Read the `_meta` entries of a slim export (e.g. `mel_scale_mean`,
    the train-corpus scale vector a scale_cond
    SynthesisServer needs as `scale_stats`). Empty dict if none."""
    prefix = "_meta|"
    with np.load(path) as data:
        return {k[len(prefix):].strip("[']"): data[k]
                for k in data.files if k.startswith(prefix)}


def load_vocoder_slim(path: str, states: Any) -> Any:
    """Return `states` with generator live+EMA params and GST params
    replaced by a slim export (shapes must match the fresh init)."""
    got = load_slim(path, {"gen_ema": states.gen.params,
                           "gst": states.gst.params},
                    allow_missing=_WARM_START_OK)
    gen = states.gen.replace(params=got["gen_ema"])
    if states.gen.ema_params is not None:
        gen = gen.replace(ema_params=got["gen_ema"])
    return states.replace(gen=gen, gst=states.gst.replace(
        params=got["gst"]))
