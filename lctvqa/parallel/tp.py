"""Tensor parallelism: 2-D (data, model) mesh for the VGG classifier.

The reference is strictly single-device; `parallel/mesh.py` adds the DP
axis. This module adds the intra-layer (megatron-style) split for the two
linears that carry ~99% of the model's linear FLOPs — the kept VGG
classifier `fc6` (25088x4096, reference `basic_vqa/models.py:22-29`)
column-parallel and `fc7` (4096x4096) row-parallel — expressed purely as
`jax.sharding` annotations on the parameter pytree. XLA's SPMD
partitioner propagates the shardings through the elementwise ReLU/dropout
between them and inserts exactly one `psum` over the `model` axis after
fc7 (the scaling-book recipe: annotate the weights, let XLA place the
collectives on ICI). Everything else — convs, LSTM, small heads — stays
replicated over `model` and data-parallel over `data`.

The column/row pairing means no activation ever materializes gathered:
fc6's output (and the dropout mask over it) lives model-sharded, fc7
contracts over the sharded dim and reduces. Works for both fp (`w`/`b`)
and int8-quantized (`w_q`/`w_s`/`b`, lctvqa/quant.py) parameter leaves:
`w_q` keeps the same [in, out] layout as `w`, and the per-output-channel
scale `w_s` shards exactly like the bias.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS, MODEL_AXIS = "data", "model"

# Per-leaf PartitionSpecs inside a TP-split linear's param dict.
# Column-parallel: out-features sharded (w [in, out] -> (None, model)).
# Row-parallel: in-features sharded; bias/scales replicated (added once
# after the psum).
_COL = {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS),
        "w_q": P(None, MODEL_AXIS), "w_s": P(MODEL_AXIS)}
_ROW = {"w": P(MODEL_AXIS, None), "b": P(),
        "w_q": P(MODEL_AXIS, None), "w_s": P()}

# Param-dict key -> rule. fc6/fc7 appear only in the VGG subtree
# (models/vgg.py), in every model family that embeds the VGG encoder
# (W, EF arch_type='fixed', and their int8-quantized serving trees).
TP_RULES = {"fc6": _COL, "fc7": _ROW}


def make_mesh_2d(dp: int = 0, mp: int = 1, devices=None) -> Mesh:
    """(dp x mp) mesh with axes (data, model). dp=0 -> use all devices.

    On real hardware the model axis should be the minor (fastest-ICI)
    dimension of the slice; jax.devices() order already is.
    """
    devs = list(devices if devices is not None else jax.devices())
    dp = dp or len(devs) // mp
    assert dp * mp <= len(devs), \
        f"requested {dp}x{mp} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[: dp * mp]).reshape(dp, mp),
                (DATA_AXIS, MODEL_AXIS))


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings mirroring `params`: TP rules on fc6/fc7,
    replicated elsewhere. Feed to jax.device_put / jit shardings."""
    def leaf(spec):
        return NamedSharding(mesh, spec)

    def rec(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k in TP_RULES and isinstance(v, dict):
                    rule = TP_RULES[k]
                    out[k] = {lk: leaf(rule.get(lk, P())) for lk in v}
                else:
                    out[k] = rec(v)
            return out
        if isinstance(tree, (list, tuple)):
            return type(tree)(rec(v) for v in tree)
        return leaf(P())

    return rec(params)


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with TP shardings applied."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch split over data, replicated over model."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
