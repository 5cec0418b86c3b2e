"""Trusted stage-3 (tri-level arch update) timing + remat A/B.

Round-2 found the isolated stage-3 re-measure physically impossible
(3.5 ms < one trunk forward): scalar-readback synchronization does not
provably bound an arbitrary program through the axon tunnel, because the
readback only orders against the stream the OUTPUT was produced on. This
bench closes that: K full stage-3 updates are CHAINED — update i+1
consumes update i's (arch, arch_opt) outputs — so the final arch value
is data-dependent on every one of the K updates and reading ONE arch
scalar back bounds the whole chain by construction. (A jitted fori_loop
variant was tried first and rejected: the while body defeats XLA's
cross-iteration buffer reuse and the tri-level program OOMs HBM.)

Variants: architect_mode in {exact, exact-indirect, fd} x stage3_remat,
at reference dims (batch 64, 64px, full EF+W models).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stage3.py [variant ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH, IMG, QLEN, QVOCAB, AVOCAB = 64, 64, 25, 8192, 1000


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lctvqa import compile_cache
    compile_cache.enable()
    from lctvqa.config import Config, ModelConfig, TrainConfig
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.train.steps import make_lct_steps

    base_m = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                         ans_vocab_size=AVOCAB, arch_type="darts",
                         compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, base_m)
    w_params = vqa_w.init_w_model(jax.random.PRNGKey(1), base_m)
    rng = np.random.RandomState(0)
    batch = {
        "image_u8": jax.device_put(rng.randint(
            0, 256, (BATCH, IMG, IMG, 3), dtype=np.uint8)),
        "question": jax.device_put(rng.randint(
            0, QVOCAB, (BATCH, QLEN)).astype(np.int32)),
        "answer_label": jax.device_put(rng.randint(
            0, AVOCAB, (BATCH,)).astype(np.int32)),
        "answer_multi_choice": jax.device_put(rng.randint(
            -1, AVOCAB, (BATCH, 10)).astype(np.int32)),
    }
    lr = jnp.float32(1e-3)
    # K chained dispatches, not a fori_loop: wrapping stage3 in a while
    # body defeats XLA's buffer reuse across iterations (K=3 needed
    # 15.8 G HBM vs 15.75 available; K=8 also exceeded 35 min compile).
    # Chaining update i+1 on update i's (arch, opt) outputs gives the
    # same guarantee — the final arch readback is data-dependent on
    # every update — at single-update memory; per-dispatch tunnel
    # overhead (~35 ms) is <4% at the ~1 s/update scale measured.
    K = 6

    all_variants = [
        ("exact", dict(architect_mode="exact", stage3_remat=False)),
        ("exact_remat", dict(architect_mode="exact", stage3_remat=True)),
        ("exact-indirect", dict(architect_mode="exact-indirect",
                                stage3_remat=False)),
        # exact-indirect at reference dims OOMs HBM without remat (16.04G
        # of 15.75G, 30.7% util: 16x layout padding on tiny-channel f32
        # pool temps under the double transpose) — remat is its only
        # runnable configuration on v5e.
        ("exact-indirect_remat", dict(architect_mode="exact-indirect",
                                      stage3_remat=True)),
        ("fd", dict(architect_mode="fd", stage3_remat=False)),
    ]
    sel = sys.argv[1:]
    variants = ([v for v in all_variants if v[0] in sel]
                if sel else all_variants)
    results = {}
    for tag, tkw in variants:
        cfg = Config(model=base_m,
                     train=TrainConfig(batch_size=BATCH, **tkw))
        steps = make_lct_steps(cfg, unk_idx=1)
        arch_opt = steps["arch_tx"].init(arch)
        s3 = steps["stage3"]
        keys = [jax.random.PRNGKey(3 + i) for i in range(K)]

        t0 = time.perf_counter()
        a, ao, _v = s3(arch, arch_opt, ef_params, w_params, batch, batch,
                       lr, lr, keys[0])
        float(jnp.ravel(a["alphas_normal"])[0])  # compile + warm
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        a, ao = arch, arch_opt
        for i in range(K):
            a, ao, _v = s3(a, ao, ef_params, w_params, batch, batch,
                           lr, lr, keys[i])
        float(jnp.ravel(a["alphas_normal"])[0])  # bounds ALL K updates
        ms = (time.perf_counter() - t0) / K * 1e3
        results[tag] = {"ms_per_update": round(ms, 2),
                        "compile_s": round(compile_s, 1)}
        print(tag, results[tag], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
