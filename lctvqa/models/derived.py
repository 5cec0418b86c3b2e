"""Fixed network built from a discovered Genotype — the "derived
architecture" trained after PC-DARTS search (BASELINE.json config #5:
"PC-DARTS cell search ... then derived-arch train").

The reference repo logs genotypes per epoch (`experiment.py:136-137`) but
ships no derived-network trainer (its `train_search.py` is dead upstream
code, SURVEY.md §1); this completes the search -> derive -> retrain loop.
Cell structure follows the standard DARTS derived network: per node, two
chosen ops (stride 2 for reduction-cell edges from the two cell inputs),
affine BNs, node states summed, `concat` nodes concatenated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models.genotypes import Genotype
from lctvqa.models.search import (OUTPUT_SIZE, factorized_reduce_apply,
                                  factorized_reduce_init, op_apply, op_init,
                                  relu_conv_bn_apply, relu_conv_bn_init)
from lctvqa.ops import conv as C


def _gene(genotype: Genotype, reduction: bool):
    gene = genotype.reduce if reduction else genotype.normal
    concat = (genotype.reduce_concat if reduction
              else genotype.normal_concat)
    return list(gene), list(concat)


def derived_cell_schedule(cfg: ModelConfig, genotype: Genotype):
    """Per-cell channel/reduction plan like search.cell_schedule, but the
    concat width (number of concatenated node states -> output channel
    multiplier) comes from the GENOTYPE per cell type, not from
    cfg.darts_multiplier. That makes non-uniform presets (NASNet/AmoebaNet:
    5 nodes, different normal/reduce concat widths) retrainable; for
    uniform genotypes this reduces exactly to search.cell_schedule."""
    c_curr = cfg.darts_stem_multiplier * cfg.darts_init_ch
    c_pp, c_p = c_curr, c_curr
    c_curr = cfg.darts_init_ch
    sched = []
    reduction_prev = False
    for i in range(cfg.darts_layers):
        reduction = i in (cfg.darts_layers // 3, 2 * cfg.darts_layers // 3)
        if reduction:
            c_curr *= 2
        _, concat = _gene(genotype, reduction)
        sched.append(dict(c_pp=c_pp, c_p=c_p, c=c_curr, reduction=reduction,
                          reduction_prev=reduction_prev))
        reduction_prev = reduction
        c_pp, c_p = c_p, len(concat) * c_curr
    return sched


def derived_out_features(cfg: ModelConfig, genotype: Genotype) -> int:
    sched = derived_cell_schedule(cfg, genotype)
    _, concat = _gene(genotype, sched[-1]["reduction"])
    return len(concat) * sched[-1]["c"] * OUTPUT_SIZE * OUTPUT_SIZE


def derived_cell_init(key, genotype, c_pp, c_p, c, reduction,
                      reduction_prev):
    k0, k1, key = jax.random.split(key, 3)
    p = {}
    if reduction_prev:
        p["pre0"] = factorized_reduce_init(k0, c_pp, c, affine=True)
    else:
        p["pre0"] = relu_conv_bn_init(k0, c_pp, c, affine=True)
    p["pre1"] = relu_conv_bn_init(k1, c_p, c, affine=True)
    gene, _ = _gene(genotype, reduction)
    ops = []
    for name, from_idx in gene:
        key, kk = jax.random.split(key)
        stride = 2 if reduction and from_idx < 2 else 1
        ops.append(op_init(kk, name, c, stride, affine=True))
    p["ops"] = ops
    return p


def derived_cell_apply(p, s0, s1, genotype, reduction, reduction_prev,
                       dtype):
    if reduction_prev:
        s0 = factorized_reduce_apply(p["pre0"], s0, dtype)
    else:
        s0 = relu_conv_bn_apply(p["pre0"], s0, dtype)
    s1 = relu_conv_bn_apply(p["pre1"], s1, dtype)
    gene, concat = _gene(genotype, reduction)
    states = [s0, s1]
    # gene lists 2 ops per node: node i consumes gene[2i], gene[2i+1]
    for i in range(len(gene) // 2):
        parts = []
        for j in (2 * i, 2 * i + 1):
            name, from_idx = gene[j]
            stride = 2 if reduction and from_idx < 2 else 1
            parts.append(op_apply(p["ops"][j], name, states[from_idx],
                                  stride, dtype))
        states.append(parts[0] + parts[1])
    return jnp.concatenate([states[i] for i in concat], axis=-1)


def derived_network_init(key, cfg: ModelConfig, genotype: Genotype):
    """Stem + derived cells; same channel/reduction plan as the search
    network (cell_schedule), so a searched arch retrains at equal size."""
    k_stem, key = jax.random.split(key)
    c_stem = cfg.darts_stem_multiplier * cfg.darts_init_ch
    p = {
        "stem_conv": C.torch_conv_init(k_stem, 3, 3, 3, c_stem),
        "stem_bn": C.batchnorm_init(c_stem, affine=True),
        "cells": [],
    }
    for spec in derived_cell_schedule(cfg, genotype):
        key, kk = jax.random.split(key)
        p["cells"].append(derived_cell_init(
            kk, genotype, spec["c_pp"], spec["c_p"], spec["c"],
            spec["reduction"], spec["reduction_prev"]))
    return p


def derived_network_apply(p, cfg: ModelConfig, genotype: Genotype, x,
                          dtype=None):
    s = C.conv2d(p["stem_conv"], x, stride=1, padding=1, dtype=dtype)
    s0 = s1 = C.batchnorm(p["stem_bn"], s)
    # per-cell remat as in search.network_apply (HBM-bound bwd); disabled
    # under the ambient BN capture/eval contexts (re-trace would
    # double-consume them)
    remat = cfg.remat_cells and not cfg.bn_eval_stats
    for cell_p, spec in zip(p["cells"], derived_cell_schedule(cfg, genotype)):

        def _cell(cp, t0, t1, _spec=spec):
            return derived_cell_apply(cp, t0, t1, genotype,
                                      _spec["reduction"],
                                      _spec["reduction_prev"], dtype)

        if remat:
            _cell = jax.checkpoint(_cell)
        s0, s1 = s1, _cell(cell_p, s0, s1)
    out = C.adaptive_avg_pool(s1, OUTPUT_SIZE)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
    return out
