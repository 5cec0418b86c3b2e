"""Microbenchmark: PC-DARTS trunk fwd / fwd+bwd at reference dims
(batch 64, 64px), folded-BN mixture vs explicit per-op BN, f32 vs bf16.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_darts.py
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lctvqa import compile_cache
    compile_cache.enable()
    from lctvqa.config import ModelConfig
    from lctvqa.models import search

    results = {}
    base = ModelConfig(img_size=64, qst_vocab_size=8192,
                       ans_vocab_size=1000, arch_type="darts")
    key = jax.random.PRNGKey(0)
    params = search.network_init(key, base)
    arch = search.arch_init(key, base)
    x = jnp.asarray(np.random.RandomState(0).randn(64, 64, 64, 3),
                    jnp.float32)

    def sync(out):
        # tunnel: block_until_ready is a no-op; ONE scalar readback of the
        # last (stream-ordered) output forces the whole queue
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(jnp.ravel(leaf)[0])

    def bench(fn, *args, iters=20):
        sync(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    import sys
    # all non-pallasmix variants pin pallas_mixed_op=False so they measure
    # the pure XLA execution strategies
    all_variants = [
        ("float32_plain", dict(compute_dtype="float32",
                               fold_bn_mixture=False, remat_cells=False)),
        ("float32_fold", dict(compute_dtype="float32",
                              fold_bn_mixture=True, remat_cells=False)),
        ("bfloat16_plain", dict(compute_dtype="bfloat16",
                                fold_bn_mixture=False, remat_cells=False)),
        ("bfloat16_fold", dict(compute_dtype="bfloat16",
                               fold_bn_mixture=True, remat_cells=False)),
        ("bfloat16_pallasmix", dict(compute_dtype="bfloat16",
                                    fold_bn_mixture=True,
                                    pallas_mixed_op=True)),
        ("bfloat16_packed", dict(compute_dtype="bfloat16",
                                 fold_bn_mixture=True,
                                 pack_conv_branches=True)),
        ("bfloat16_fold_remat", dict(compute_dtype="bfloat16",
                                     fold_bn_mixture=True,
                                     remat_cells=True)),
        ("bfloat16_plain_remat", dict(compute_dtype="bfloat16",
                                      fold_bn_mixture=False,
                                      remat_cells=True)),
        ("bfloat16_fused_fold", dict(compute_dtype="bfloat16",
                                     fold_bn_mixture=True,
                                     fuse_mixed_ops=True)),
        ("bfloat16_fused_plain", dict(compute_dtype="bfloat16",
                                      fold_bn_mixture=False,
                                      fuse_mixed_ops=True)),
    ]
    # optional variant-name filters on argv
    sel = sys.argv[1:]
    variants = ([v for v in all_variants if any(s in v[0] for s in sel)]
                if sel else all_variants)
    from lctvqa.models import search_fused
    for tag, over in variants:
        over.setdefault("pallas_mixed_op", False)
        cfg = dataclasses.replace(base, **over)
        dtype = jnp.dtype(cfg.compute_dtype)
        apply_fn = (search_fused.network_apply_fused if cfg.fuse_mixed_ops
                    else search.network_apply)

        fwd = jax.jit(lambda p, a, f=apply_fn, c=cfg, d=dtype:
                      f(p, a, c, x, dtype=d))

        def loss(p, a, f=apply_fn, c=cfg, d=dtype):
            return jnp.sum(f(p, a, c, x, dtype=d) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        results[f"fwd_ms_{tag}"] = round(bench(fwd, params, arch), 3)
        results[f"fwdbwd_ms_{tag}"] = round(
            bench(bwd, params, arch, iters=10), 3)
        print(tag, results[f"fwd_ms_{tag}"],
              results[f"fwdbwd_ms_{tag}"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
