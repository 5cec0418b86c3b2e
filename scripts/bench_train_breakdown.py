"""Per-stage timing breakdown of the LCT train step (chained dispatch).

Attributes the chip-side train-step time (bench.py's scanned variant)
to: stage1 (EF fwd+bwd+Adam), stage2 (EF.generate 30-step scan + 2x W
fwd + bwd + Adam), and ef_generate alone (the sequential-scan suspect —
SURVEY.md hard-part #4). Each section is chained on its own outputs so
the final readback bounds the chain.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/bench_train_breakdown.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--remat_cells", action="store_true",
                   help="match run_224px.py's memory-saving config")
    p.add_argument("--sections", type=str,
                   default="stage1,stage2,ef_generate",
                   help="comma subset of stage1,stage2,ef_generate,"
                        "trunk,ef,w — trunk/ef/w are fwd+bwd-only "
                        "decompositions (darts trunk alone / full EF "
                        "loss / full W loss) that attribute the stage "
                        "walls to trunk vs LSTM+heads vs VGG")
    args = p.parse_args()

    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa.config import Config, MeshConfig, ModelConfig, TrainConfig
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.train.steps import make_lct_steps

    BATCH, IMG, QVOCAB, AVOCAB, QLEN = (args.batch_size, args.img_size,
                                        8192, 1000, 25)
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
    cfg = Config(model=ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                                   ans_vocab_size=AVOCAB,
                                   arch_type="darts",
                                   remat_cells=args.remat_cells),
                 train=TrainConfig(batch_size=BATCH),
                 mesh=MeshConfig(num_devices=1))
    steps = make_lct_steps(cfg, unk_idx=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    ef_params, arch = vqa_ef.init_ef_model(k1, cfg.model)
    w_params = vqa_w.init_w_model(k2, cfg.model)
    ef_opt = steps["ef_tx"].init(ef_params)
    w_opt = steps["w_tx"].init(w_params)
    keys = [jax.random.PRNGKey(10 + i) for i in range(max(40, args.iters))]
    K = args.iters
    results = {}

    def timed(tag, chain, readback):
        t0 = time.perf_counter()
        out = chain(0)
        readback(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(K):
            out = chain(i)
        readback(out)
        ms = (time.perf_counter() - t0) / K * 1e3
        results[tag] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1)}
        print(tag, results[tag], flush=True)

    sections = set(args.sections.split(","))

    # stage1 chained on (ef_params, ef_opt)
    st = {"ef": ef_params, "efo": ef_opt}

    def chain1(i):
        st["ef"], st["efo"], l1, _, _ = steps["stage1"](
            st["ef"], arch, st["efo"], batch, keys[i])
        return l1

    if "stage1" in sections:
        timed("stage1", chain1, lambda l: float(l))

    # stage2 chained on (w_params, w_opt); EF params fixed
    st2 = {"w": w_params, "wo": w_opt}

    def chain2(i):
        st2["w"], st2["wo"], l2, _ = steps["stage2"](
            st2["w"], st2["wo"], ef_params, arch, batch, keys[i])
        return l2

    if "stage2" in sections:
        timed("stage2", chain2, lambda l: float(l))

    # fwd+bwd-only decompositions. Each is chained on its own params via a
    # tiny SGD-style update INSIDE the jitted program — without it, the
    # iterations are loop-invariant and nothing stops XLA/host caching from
    # collapsing the repeat; with it the K calls are a real dependent chain
    # whose final loss readback bounds the whole sequence. stage1 ~= ef +
    # grad-clip + Adam; ef - trunk ~= the LSTM/teacher-forcing/head share;
    # stage2 ~= ef_generate + 2x W fwd + W bwd + Adam.
    from lctvqa.train.steps import normalize_images
    img_n = jax.jit(lambda u8: normalize_images(u8, (0.485, 0.456, 0.406),
                                                (0.229, 0.224, 0.225)))(
        batch["image_u8"])

    def make_graddesc(loss_fn):
        @jax.jit
        def step(p, r):
            l, g = jax.value_and_grad(loss_fn)(p, r)
            newp = jax.tree_util.tree_map(
                lambda x, gg: (x - 1e-6 * gg.astype(x.dtype)), p, g)
            return newp, l
        return step

    if "trunk" in sections:
        trunk_step = make_graddesc(
            lambda p, r: jnp.sum(vqa_ef.ef_img_encode(
                p, arch, cfg.model, img_n, r, False).astype(jnp.float32)))
        stt = {"p": ef_params}

        def chain_t(i):
            stt["p"], l = trunk_step(stt["p"], keys[i])
            return l

        timed("trunk_fwdbwd", chain_t, lambda l: float(l))

    if "ef" in sections:
        ef_step = make_graddesc(
            lambda p, r: vqa_ef.ef_loss(p, arch, cfg.model, img_n,
                                        batch["question"],
                                        batch["answer_label"], r, False))
        ste = {"p": ef_params}

        def chain_e(i):
            ste["p"], l = ef_step(ste["p"], keys[i])
            return l

        timed("ef_fwdbwd", chain_e, lambda l: float(l))

    if "w" in sections:
        w_step = make_graddesc(
            lambda p, r: vqa_w.w_loss(p, cfg.model, img_n,
                                      batch["question"],
                                      batch["answer_label"], rng=r,
                                      deterministic=False))
        stw = {"p": w_params}

        def chain_w(i):
            stw["p"], l = w_step(stw["p"], keys[i])
            return l

        timed("w_fwdbwd", chain_w, lambda l: float(l))

    # generate alone (jitted standalone; fresh rng each call, chained on
    # nothing device-side — use the token readback to bound each call,
    # timing K sequential dispatch+readbacks, RTT included; the deltas
    # between stage2 and this still bound the scan's share)
    img = (batch["image_u8"].astype(jnp.float32) / 255.0 - 0.45) / 0.225
    gen = jax.jit(lambda p, a, im, r: vqa_ef.ef_generate(
        p, a, cfg.model, im, rng=r, deterministic=False,
        sample_deterministic=True))

    def chain3(i):
        q, alog = gen(ef_params, arch, img, keys[i])
        return alog

    if "ef_generate" in sections:
        timed("ef_generate", chain3, lambda a: float(jnp.sum(a)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
