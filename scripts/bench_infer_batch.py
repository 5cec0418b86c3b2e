"""Inference (preproc + W-model forward) throughput vs batch size.

The headline metric is serving throughput — pairs/sec/chip — and batch
is a free serving parameter. bench.py historically measured the
reference train-config batch (64); this sweep finds the chip's best
batch. Method matches bench.py: queued dispatches bounded by one final
scalar readback.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/bench_infer_batch.py [64 128 256 512 1024]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

IMG, QVOCAB, AVOCAB, QLEN = 64, 8192, 1000, 25


def main():
    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa.config import ModelConfig
    from lctvqa.data.pipeline import normalize_images
    from lctvqa.models import vqa_w

    cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                      ans_vocab_size=AVOCAB, arch_type="fixed",
                      compute_dtype="bfloat16")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def step(params, u8, qst):
        img = normalize_images(u8)
        return vqa_w.w_forward(params, cfg, img, qst, deterministic=True)

    batches = [int(b) for b in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    rng = np.random.RandomState(0)
    results = {}
    for b in batches:
        u8 = jnp.asarray(rng.randint(0, 256, (b, IMG, IMG, 3),
                                     dtype=np.uint8))
        qst = jnp.asarray(rng.randint(0, QVOCAB, (b, QLEN)).astype(
            np.int32))
        try:
            float(step(params, u8, qst)[0, 0])  # compile + warm
        except Exception as e:  # noqa: BLE001 — record OOM boundary
            results[b] = {"error": str(e)[:120]}
            print(b, results[b], flush=True)
            continue
        iters = max(10, 4096 // b)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = step(params, u8, qst)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        results[b] = {"pairs_per_sec": round(b * iters / dt, 1),
                      "ms_per_batch": round(dt / iters * 1e3, 3)}
        print(b, results[b], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
