"""Perf probe: what does the per-node channel_shuffle actually cost?

Measures the darts trunk fwd / fwd+bwd (reference dims, bf16, BN-folded
mixture — the shipped default) twice: as shipped, and with
`search.channel_shuffle` monkeypatched to identity. The second variant is
NUMERICALLY WRONG (the shuffle is load-bearing for partial-channel
mixing) — it exists only to bound the win available to a shuffle-fold
rewrite (lazy permutation folded into downstream convs / gathers), the
round-1 NOTES "remaining wins" item #1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_shuffle_cost.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa.config import ModelConfig
    from lctvqa.models import search

    cfg = ModelConfig(img_size=64, qst_vocab_size=8192,
                      ans_vocab_size=1000, arch_type="darts")
    key = jax.random.PRNGKey(0)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(64, 64, 64, 3),
                    jnp.float32)
    dtype = jnp.bfloat16

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(jnp.ravel(leaf)[0])

    def bench(fn, *args, iters=20):
        sync(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}
    real_shuffle = search.channel_shuffle
    for tag, shuf in (("shipped", real_shuffle),
                      ("noshuffle", lambda t, g: t)):
        search.channel_shuffle = shuf
        fwd = jax.jit(lambda p, a: search.network_apply(p, a, cfg, x,
                                                        dtype=dtype))
        bwd = jax.jit(jax.grad(
            lambda p, a: jnp.sum(
                search.network_apply(p, a, cfg, x, dtype=dtype) ** 2),
            argnums=(0, 1)))
        results[f"fwd_ms_{tag}"] = round(bench(fwd, params, arch), 3)
        results[f"fwdbwd_ms_{tag}"] = round(
            bench(bwd, params, arch, iters=10), 3)
        print(tag, results[f"fwd_ms_{tag}"], results[f"fwdbwd_ms_{tag}"],
              flush=True)
    search.channel_shuffle = real_shuffle
    print(json.dumps(results))


if __name__ == "__main__":
    main()
