"""Multi-host data parallelism scaffolding.

The single-host DP mesh (parallel/mesh.py) extends to multiple hosts via
`jax.distributed`: every process contributes its local devices to one
global mesh; each host feeds its own shard of the global batch
(process-disjoint question indices); parameters stay replicated; XLA's
collectives ride ICI within a slice and DCN across slices.

This host has one chip, so multi-host paths are exercised only by the
8-virtual-device tests + dryrun; the API is kept minimal and standard so a
real pod slice can use it unchanged.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough (env-autodetected on TPU
    pods when called with no args). Safe to call once per process."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data"):
    """Mesh over ALL devices of all processes."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def process_index_range(total: int) -> range:
    """This process's contiguous shard of a global index space, for feeding
    per-host batch shards (len divisible handling: last host takes the
    remainder)."""
    import jax

    per = total // jax.process_count()
    start = jax.process_index() * per
    end = total if jax.process_index() == jax.process_count() - 1 \
        else start + per
    return range(start, end)


def make_global_batch(local_batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble a global jax.Array from per-host shards
    (jax.make_array_from_process_local_data)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in local_batch.items():
        if hasattr(v, "shape"):
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out
