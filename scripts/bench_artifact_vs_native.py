"""A/B: exported-artifact serving path vs native jit, on the attached chip.

The round-3 headline (batch-1024 pairs/s) was measured through a native
`jax.jit(w_forward)` program; the serving stack dispatches through
`jax.export.deserialize(...).call` instead. This script times both on
identical inputs at batch 64 and 1024 and reports the artifact-path
overhead — the number that decides whether the serving artifact can
carry the headline (VERDICT r3 item #1).

Method matches bench.py: queued dispatches bounded by one scalar
readback (block_until_ready does not block through the axon tunnel).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/bench_artifact_vs_native.py --artifact /tmp/w_serve.lctx
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

QLEN = 25


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--artifact", type=str, required=True)
    p.add_argument("--batches", type=str, default="64,1024")
    p.add_argument("--iters", type=int, default=4096,
                   help="target pairs per timing loop (iters = max(10, "
                        "target // batch))")
    args = p.parse_args(argv)

    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa.config import ModelConfig
    from lctvqa.data.pipeline import normalize_images
    from lctvqa.export import load_artifact
    from lctvqa.models import vqa_w

    model = load_artifact(args.artifact)
    meta = model.meta
    assert meta["family"] == "w", meta["family"]
    mcfg = ModelConfig(img_size=meta["img_size"],
                       max_qst_len=meta["max_qst_len"],
                       qst_vocab_size=meta["qst_vocab_size"],
                       ans_vocab_size=meta["ans_vocab_size"],
                       arch_type="fixed")
    # make_serve_artifact initializes with PRNGKey(0) at this config; the
    # native path re-derives the identical params so both programs run
    # the same weights (verified by logits parity below).
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)

    @jax.jit
    def native(p, u8, qst):
        return vqa_w.w_forward(p, mcfg, normalize_images(u8), qst,
                               deterministic=True)

    artifact_fn = model._fns["answer_logits"]
    bundle = model._params

    rng = np.random.RandomState(0)
    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        u8 = jnp.asarray(rng.randint(0, 256, (b, meta["img_size"],
                                              meta["img_size"], 3),
                                     dtype=np.uint8))
        qst = jnp.asarray(rng.randint(0, meta["qst_vocab_size"],
                                      (b, meta["max_qst_len"])).astype(
            np.int32))
        row = {}
        # parity first (also compiles both programs)
        a = np.asarray(artifact_fn(bundle, u8, qst), np.float32)
        n = np.asarray(native(params, u8, qst), np.float32)
        row["max_abs_diff"] = round(float(np.max(np.abs(a - n))), 6)
        iters = max(10, args.iters // b)
        for tag, fn, fargs in (("native", native, (params, u8, qst)),
                               ("artifact", artifact_fn,
                                (bundle, u8, qst))):
            float(fn(*fargs)[0, 0])  # warm
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(*fargs)
            float(out[0, 0])
            dt = time.perf_counter() - t0
            row[f"{tag}_pairs_per_sec"] = round(b * iters / dt, 1)
            row[f"{tag}_ms_per_batch"] = round(dt / iters * 1e3, 3)
        row["artifact_overhead_pct"] = round(
            100.0 * (row["native_pairs_per_sec"]
                     / row["artifact_pairs_per_sec"] - 1.0), 2)
        results[b] = row
        print(b, json.dumps(row), flush=True)
    print(json.dumps({"artifact_vs_native": results}))


if __name__ == "__main__":
    main()
