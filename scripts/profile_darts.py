"""Profile the PC-DARTS trunk fwd+bwd on the TPU and print a device-time
breakdown by op category (parsed from the jax.profiler xplane dump).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_darts.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

import numpy as np


def capture(mode: str = "fwdbwd", fold: str = "fold"):
    import jax
    import jax.numpy as jnp

    from lctvqa import compile_cache
    compile_cache.enable()
    import dataclasses

    from lctvqa.config import ModelConfig
    from lctvqa.models import search

    cfg = ModelConfig(img_size=64, qst_vocab_size=8192, ans_vocab_size=1000,
                      arch_type="darts", compute_dtype="bfloat16",
                      fold_bn_mixture=(fold != "nofold"),
                      pallas_mixed_op=(fold == "pallasmix"),
                      pack_conv_branches=(fold == "packed"))
    key = jax.random.PRNGKey(0)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(64, 64, 64, 3),
                    jnp.float32)
    dtype = jnp.bfloat16

    if mode == "fwd":
        fn = jax.jit(lambda p, a: search.network_apply(p, a, cfg, x,
                                                       dtype=dtype))
    else:
        def loss(p, a):
            return jnp.sum(search.network_apply(p, a, cfg, x,
                                                dtype=dtype) ** 2)
        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(jnp.ravel(leaf)[0])

    sync(fn(params, arch))  # compile + warm
    log_dir = tempfile.mkdtemp(prefix="darts_prof_")
    with jax.profiler.trace(log_dir):
        out = None
        for _ in range(5):
            out = fn(params, arch)
        sync(out)
    return log_dir


CATEGORIES = [
    ("conv", re.compile(r"conv|%conv", re.I)),
    ("reduce/BN-stats", re.compile(r"reduce", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|bitcast", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
    ("dynamic-slice/concat", re.compile(r"slice|concatenate|pad", re.I)),
]


def parse(log_dir: str):
    """Aggregate device-plane event durations from the xplane dump."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        is_device = ("TPU" in plane.name or "/device" in plane.name.lower()
                     or "gpu" in plane.name.lower())
        if not is_device:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        total_ps = 0
        by_name = collections.Counter()
        # Only the serialized 'XLA Ops' timeline — 'Async XLA Ops' (DMA)
        # overlap compute and would be double-counted.
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                by_name[name] += ev.duration_ps
                total_ps += ev.duration_ps
        if not total_ps:
            continue
        print(f"\n== plane: {plane.name}  total {total_ps/1e9/5:.3f} ms/iter")
        by_cat = collections.Counter()
        for name, ps in by_name.items():
            for cat, rx in CATEGORIES:
                if rx.search(name):
                    by_cat[cat] += ps
                    break
            else:
                by_cat["other"] += ps
        for cat, ps in by_cat.most_common():
            print(f"  {cat:24s} {ps/1e9/5:8.3f} ms/iter")
        print("  -- top 25 ops --")
        for name, ps in by_name.most_common(25):
            print(f"  {ps/1e9/5:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
    # argv[2]: 'fold' (default) | 'nofold' | 'packed' | 'pallasmix'
    fold = sys.argv[2] if len(sys.argv) > 2 else "fold"
    d = capture(mode, fold)
    print("trace dir:", d)
    parse(d)
