"""Data-parallel mesh utilities.

The reference is strictly single-device (SURVEY.md §2 "parallelism
statement"); this is the new-capability layer required by BASELINE.json:
batch sharded over a `data` axis of a `jax.sharding.Mesh`, parameters and
architecture weights replicated. Train steps are `jit`-ed with these
shardings, so XLA inserts the ICI all-reduces for weight AND arch gradients
(losses are global-batch means) — every replica holds identical params and
alphas by construction.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devs)
    assert n <= len(devs), f"requested {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """device_put every array in the batch with its batch axis sharded."""
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) if hasattr(v, "shape") else v
            for k, v in batch.items()}
