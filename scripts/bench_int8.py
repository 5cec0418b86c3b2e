"""int8 vs bf16 serving throughput and agreement vs batch size.

Sweeps the W-model serving forward in both numerics at each batch, plus
argmax answer agreement (int8 vs bf16 on identical inputs). The int8
path dispatches inside conv2d/linear on quantized params (lctvqa/quant
.py); whether XLA:TPU lowers s8xs8->s32 convs to the MXU's double-rate
mode is exactly what this script establishes — flip nothing until run.

Method matches bench.py: queued dispatches bounded by one readback.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/bench_int8.py [64 256 1024]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

IMG, QVOCAB, AVOCAB, QLEN = 64, 8192, 1000, 25
MIN_ITERS, ITERS_TARGET = 10, 4096  # module constants: CPU smoke shrinks


def main():
    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa import quant
    from lctvqa.config import ModelConfig
    from lctvqa.data.pipeline import normalize_images
    from lctvqa.models import vqa_w

    cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                      ans_vocab_size=AVOCAB, arch_type="fixed",
                      compute_dtype="bfloat16")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_w_model(params)

    @jax.jit
    def step_bf16(p, u8, qst):
        return vqa_w.w_forward(p, cfg, normalize_images(u8), qst,
                               deterministic=True)

    @jax.jit
    def step_int8(qp, u8, qst):
        return quant.w_forward_int8(qp, cfg, normalize_images(u8), qst)

    batches = [int(b) for b in sys.argv[1:]] or [64, 256, 1024]
    rng = np.random.RandomState(0)
    results = {}
    for b in batches:
        u8 = jnp.asarray(rng.randint(0, 256, (b, IMG, IMG, 3),
                                     dtype=np.uint8))
        qst = jnp.asarray(rng.randint(0, QVOCAB, (b, QLEN)).astype(
            np.int32))
        row = {}
        for tag, fn, p in (("bf16", step_bf16, params),
                           ("int8", step_int8, qparams)):
            try:
                float(fn(p, u8, qst)[0, 0])  # compile + warm
            except Exception as e:  # noqa: BLE001 — record the boundary
                row[tag] = {"error": str(e)[:160]}
                continue
            iters = max(MIN_ITERS, ITERS_TARGET // b)
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(p, u8, qst)
            float(out[0, 0])
            dt = time.perf_counter() - t0
            row[tag] = {"pairs_per_sec": round(b * iters / dt, 1),
                        "ms_per_batch": round(dt / iters * 1e3, 3)}
        if "error" not in row.get("int8", {}) and \
                "error" not in row.get("bf16", {}):
            agree = float(jnp.mean(
                jnp.argmax(step_int8(qparams, u8, qst), 1)
                == jnp.argmax(step_bf16(params, u8, qst), 1)))
            row["answer_agreement"] = round(agree, 4)
        results[b] = row
        print(b, json.dumps(row), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
