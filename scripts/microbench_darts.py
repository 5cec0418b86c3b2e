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

    for dt in ("float32", "bfloat16"):
        for fold in (False, True):
            cfg = dataclasses.replace(base, compute_dtype=dt,
                                      fold_bn_mixture=fold)
            dtype = jnp.dtype(dt)

            fwd = jax.jit(lambda p, a: search.network_apply(
                p, a, cfg, x, dtype=dtype))

            def loss(p, a):
                return jnp.sum(search.network_apply(p, a, cfg, x,
                                                    dtype=dtype) ** 2)

            bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
            tag = f"{dt}_{'fold' if fold else 'plain'}"
            results[f"fwd_ms_{tag}"] = round(bench(fwd, params, arch), 3)
            results[f"fwdbwd_ms_{tag}"] = round(
                bench(bwd, params, arch, iters=10), 3)
            print(tag, results[f"fwd_ms_{tag}"],
                  results[f"fwdbwd_ms_{tag}"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
