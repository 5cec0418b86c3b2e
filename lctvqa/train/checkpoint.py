"""Checkpoint / resume.

The reference torch.saves model+optimizer+scheduler state dicts per epoch
(`basic_vqa/experiment.py:398-430`). Here the whole train state is one
pytree (params, optimizer states, arch params, epoch, rng key) serialized
as numpy arrays — a single artifact per model, resumable across hosts since
params are replicated on the DP mesh.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any) -> None:
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x))
        if hasattr(x, "shape") else x, state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)


def load_state(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def exists(path: str) -> bool:
    return os.path.exists(path)
