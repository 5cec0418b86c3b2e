"""Checkpoint / resume.

The reference torch.saves model+optimizer+scheduler state dicts per epoch
(`basic_vqa/experiment.py:398-430`). Here the whole train state is one
pytree (params, optimizer states, arch params, epoch, rng key) serialized
as numpy arrays — a single artifact per model, resumable across hosts since
params are replicated on the DP mesh.

Checkpoints are self-describing: `save_state(..., config=cfg)` embeds the
full Config and the lctvqa version, so `eval.py` (and any future loader)
can rebuild the exact model without the caller re-specifying dims.

Format (since r5): a ZIP of raw little-endian leaf bytes + a JSON
skeleton — NO pickle (r4 verdict #7: `--resume` on a checkpoint from an
untrusted directory is the same arbitrary-code-execution surface the r4
serving artifacts closed; same reasoning, same fix). The skeleton
reconstructs dict/list/tuple containers, scalars, numpy arrays, and —
via a module WHITELIST (optax/lctvqa/jax only) — the optax namedtuple
optimizer states and the frozen Config dataclasses. Nothing outside the
whitelist is ever imported, and no bytes from the file are executed.
Legacy pickle checkpoints still load behind `trusted=True`.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import zipfile
from typing import Any, Optional

# Only classes from these packages are reconstructed by (module, name)
# reference. Importing a module runs its top-level code, so an untrusted
# skeleton must not be able to name arbitrary modules.
_SAFE_MODULE_ROOTS = ("optax", "lctvqa", "jax")


def _np_dtype(name: str):
    import numpy as np
    try:
        return np.dtype(name)
    except TypeError:  # bfloat16 etc. live in ml_dtypes
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


def _encode(obj: Any, leaves: list):
    """Object -> JSON-safe skeleton; array leaves appended to `leaves`."""
    import numpy as np
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"py": obj}
    if isinstance(obj, dict):
        return {"d": {str(k): _encode(v, leaves) for k, v in obj.items()}}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # namedtuple
        cls = type(obj)
        return {"nt": {"mod": cls.__module__, "name": cls.__qualname__,
                       "v": [_encode(v, leaves) for v in obj]}}
    if isinstance(obj, list):
        return {"l": [_encode(v, leaves) for v in obj]}
    if isinstance(obj, tuple):
        return {"tu": [_encode(v, leaves) for v in obj]}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        cls = type(obj)
        return {"dc": {"mod": cls.__module__, "name": cls.__qualname__,
                       "f": {f.name: _encode(getattr(obj, f.name), leaves)
                             for f in dataclasses.fields(obj)}}}
    a = np.asarray(obj)
    leaves.append(a)
    return {"a": len(leaves) - 1}


def _resolve(mod: str, name: str):
    """Import a whitelisted class by (module, qualname); None otherwise."""
    if mod.split(".", 1)[0] not in _SAFE_MODULE_ROOTS:
        return None
    import importlib
    try:
        obj = importlib.import_module(mod)
        for part in name.split("."):
            obj = getattr(obj, part)
        return obj
    except (ImportError, AttributeError):
        return None


def _decode(skel, leaves: list):
    if "py" in skel:
        return skel["py"]
    if "a" in skel:
        return leaves[skel["a"]]
    if "d" in skel:
        return {k: _decode(v, leaves) for k, v in skel["d"].items()}
    if "l" in skel:
        return [_decode(v, leaves) for v in skel["l"]]
    if "tu" in skel:
        return tuple(_decode(v, leaves) for v in skel["tu"])
    if "nt" in skel:
        vals = [_decode(v, leaves) for v in skel["nt"]["v"]]
        cls = _resolve(skel["nt"]["mod"], skel["nt"]["name"])
        # an off-whitelist namedtuple degrades to a plain tuple (it still
        # carries the data; optax/lctvqa states always resolve)
        return cls(*vals) if cls is not None else tuple(vals)
    if "dc" in skel:
        fields = {k: _decode(v, leaves) for k, v in skel["dc"]["f"].items()}
        cls = _resolve(skel["dc"]["mod"], skel["dc"]["name"])
        if cls is None:
            return fields
        return cls(**fields)
    raise ValueError(f"unknown checkpoint skeleton node: {list(skel)}")


def save_state(path: str, state: Any, config: Optional[Any] = None) -> None:
    import jax
    import numpy as np

    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x))
        if hasattr(x, "shape") else x, state)
    if config is not None and "config" not in host_state:
        from lctvqa import __version__
        host_state = dict(host_state, config=config,
                          lctvqa_version=__version__)
    leaves: list = []
    skeleton = _encode(host_state, leaves)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
        z.writestr("tree.json", json.dumps(
            {"version": 1, "skeleton": skeleton,
             "leaves": [{"dtype": a.dtype.name, "shape": list(a.shape)}
                        for a in leaves]}))
        for i, a in enumerate(leaves):
            z.writestr(f"leaves/{i}", np.ascontiguousarray(a).tobytes())
    os.replace(tmp, path)


def load_state(path: str, trusted: bool = False) -> Any:
    """ZIP checkpoints (the current format) load with no code execution;
    legacy pickle checkpoints require trusted=True (CLI: --trusted)."""
    import numpy as np

    if not zipfile.is_zipfile(path):
        if not trusted:
            raise ValueError(
                f"{path} is a legacy pickle checkpoint; pickle.load "
                "executes arbitrary code from the file. Pass "
                "trusted=True/--trusted only for checkpoints you produced "
                "yourself, or re-save with the current lctvqa")
        with open(path, "rb") as f:
            return pickle.load(f)
    with zipfile.ZipFile(path) as z:
        tree = json.loads(z.read("tree.json"))
        leaves = [
            np.frombuffer(z.read(f"leaves/{i}"),
                          _np_dtype(spec["dtype"])).reshape(spec["shape"])
            for i, spec in enumerate(tree["leaves"])]
    return _decode(tree["skeleton"], leaves)


def load_config(path: str, trusted: bool = False) -> Optional[Any]:
    """The Config a checkpoint was written with (None for old artifacts)."""
    return load_state(path, trusted=trusted).get("config")


def exists(path: str) -> bool:
    return os.path.exists(path)
