"""Chained-dispatch stage1+stage2 step timing, maxpool-variant A/B.

The headline train number regressed when max_pool gained its custom JVP
(bench.py scanned variant: 443 pairs/s = 144 ms/step chip-side). This
bench isolates the train-step program from bench.py's packing and from
tunnel RTT: K steps are CHAINED (step i+1 consumes step i's params, so
the final loss readback bounds the whole chain), no packing, and the
max_pool derivative is either the shipped custom JVP ('jvp') or XLA's
select_and_scatter ('sns', monkeypatched reduce_window-only max_pool).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/bench_train_step.py [jvp sns]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa.config import Config, MeshConfig, ModelConfig, TrainConfig
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.ops import conv as C
    from lctvqa.train.steps import make_lct_steps

    BATCH, IMG, QVOCAB, AVOCAB, QLEN = 64, 64, 8192, 1000, 25


    rng = np.random.RandomState(0)
    batch = {
        "image_u8": jnp.asarray(rng.randint(0, 255, (BATCH, IMG, IMG, 3),
                                            dtype=np.uint8)),
        "question": jnp.asarray(
            rng.randint(4, QVOCAB, (BATCH, QLEN)).astype(np.int32)),
        "answer_label": jnp.asarray(
            rng.randint(0, AVOCAB, (BATCH,)).astype(np.int32)),
        "answer_multi_choice": jnp.asarray(rng.randint(
            -1, AVOCAB, (BATCH, 10)).astype(np.int32)),
    }

    variants = sys.argv[1:] or ["jvp", "sns"]
    shipped = C.max_pool  # = the select_and_scatter-derivative default
    results = {}
    for tag in variants:
        C.max_pool = C.max_pool_tap_jvp if tag == "jvp" else shipped
        cfg = Config(model=ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                                       ans_vocab_size=AVOCAB,
                                       arch_type="darts"),
                     train=TrainConfig(batch_size=BATCH),
                     mesh=MeshConfig(num_devices=1))
        steps = make_lct_steps(cfg, unk_idx=1)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        ef_params, arch = vqa_ef.init_ef_model(k1, cfg.model)
        w_params = vqa_w.init_w_model(k2, cfg.model)
        ef_opt = steps["ef_tx"].init(ef_params)
        w_opt = steps["w_tx"].init(w_params)

        def one(ef_p, ef_o, w_p, w_o, r):
            r1, r2 = jax.random.split(r)
            ef_p, ef_o, l1, _, _ = steps["stage1"](ef_p, arch, ef_o,
                                                   batch, r1)
            w_p, w_o, l2, _ = steps["stage2"](w_p, w_o, ef_p, arch,
                                              batch, r2)
            return ef_p, ef_o, w_p, w_o, l2

        keys = [jax.random.PRNGKey(10 + i) for i in range(20)]
        t0 = time.perf_counter()
        s = one(ef_params, ef_opt, w_params, w_opt, keys[0])
        float(s[4])
        compile_s = time.perf_counter() - t0
        ef_p, ef_o, w_p, w_o = ef_params, ef_opt, w_params, w_opt
        K = 16
        t0 = time.perf_counter()
        for i in range(K):
            ef_p, ef_o, w_p, w_o, l2 = one(ef_p, ef_o, w_p, w_o, keys[i])
        float(l2)  # bounds the whole chain
        ms = (time.perf_counter() - t0) / K * 1e3
        results[tag] = {"ms_per_step": round(ms, 2),
                        "pairs_per_sec": round(BATCH / ms * 1e3, 1),
                        "compile_s": round(compile_s, 1)}
        print(tag, results[tag], flush=True)

        if tag.endswith("+scan"):
            continue
        # scanned variant: K steps in ONE jitted fori_loop, raw pytree
        # carry (no packing) — isolates loop/carry overhead from the
        # chained-dispatch methodology above
        def k_steps(ef_p, ef_o, w_p, w_o, r):
            def body(_, carry):
                ef_p, ef_o, w_p, w_o, r, _l = carry
                r1, r2, r = jax.random.split(r, 3)
                ef_p, ef_o, l1, _, _ = steps["stage1"](ef_p, arch, ef_o,
                                                       batch, r1)
                w_p, w_o, l2, _ = steps["stage2"](w_p, w_o, ef_p, arch,
                                                  batch, r2)
                return ef_p, ef_o, w_p, w_o, r, l2

            return jax.lax.fori_loop(
                0, K, body,
                (ef_p, ef_o, w_p, w_o, r, jnp.float32(0.0)))

        scan_fn = jax.jit(k_steps, donate_argnums=(0, 1, 2, 3))
        t0 = time.perf_counter()
        out = scan_fn(ef_p, ef_o, w_p, w_o, keys[0])
        float(out[5])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = scan_fn(*out[:4], keys[1])
        float(out[5])
        ms = (time.perf_counter() - t0) / K * 1e3
        results[tag + "+scan"] = {"ms_per_step": round(ms, 2),
                                  "pairs_per_sec": round(BATCH / ms * 1e3,
                                                         1),
                                  "compile_s": round(compile_s, 1)}
        print(tag + "+scan", results[tag + "+scan"], flush=True)
    C.max_pool = shipped
    print(json.dumps(results))


if __name__ == "__main__":
    main()
