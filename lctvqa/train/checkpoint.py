"""Checkpoint / resume.

The reference torch.saves model+optimizer+scheduler state dicts per epoch
(`basic_vqa/experiment.py:398-430`). Here the whole train state is one
pytree (params, optimizer states, arch params, epoch, rng key) serialized
as numpy arrays — a single artifact per model, resumable across hosts since
params are replicated on the DP mesh.

Checkpoints are self-describing: `save_state(..., config=cfg)` embeds the
full Config and the lctvqa version, so `eval.py` (and any future loader)
can rebuild the exact model without the caller re-specifying dims.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional


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
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)


def load_state(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_config(path: str) -> Optional[Any]:
    """The Config a checkpoint was written with (None for old artifacts)."""
    return load_state(path).get("config")


def exists(path: str) -> bool:
    return os.path.exists(path)
