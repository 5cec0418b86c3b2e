"""Measure the fused decode kernels vs their XLA-scan baselines on the chip.

1. ef_qst_generate: 30-step greedy decode, jnp lax.scan (+Pallas cell)
   vs the whole-loop fused kernel (ops/pallas_generate.py).
2. W-model forward: per-step Pallas cell scan vs the whole-sequence
   final-state kernel (ops/pallas_lstm.lstm_seq_final_pallas), at the
   reference train batch and the serving batch.

Method matches bench.py: queue N stream-ordered dispatches, bound the
chain with one readback of the last output. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode.py
"""

from __future__ import annotations

import json
import time

import numpy as np

B, IMG, H, E, V, A, T = 64, 64, 512, 300, 8192, 1000, 30
SERVE_BATCH = 1024  # module constant: CPU smoke shrinks it


def main():
    from lctvqa import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from lctvqa.config import ModelConfig
    from lctvqa.data.pipeline import normalize_images
    from lctvqa.models import qst_encoder, vqa_w

    results = {}

    def timed(fn, *args, iters=50, read=lambda o: float(o[0, 0])):
        read(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        read(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    # ---- 1. generate loop --------------------------------------------
    qp = qst_encoder.ef_qst_encoder_init(
        jax.random.PRNGKey(0), qst_vocab_size=V, word_embed_size=E,
        embed_size=H, num_layers=1, hidden_size=H)
    img_emb = jax.device_put(np.random.RandomState(0).randn(
        B, H).astype(np.float32))
    bf16 = jnp.bfloat16

    try:
        scan_gen = jax.jit(lambda p, e: qst_encoder.ef_qst_generate(
            p, e, T, deterministic=True, dtype=bf16, use_pallas=True))
        fused_gen = jax.jit(lambda p, e: qst_encoder.ef_qst_generate(
            p, e, T, deterministic=True, dtype=bf16,
            use_pallas_generate=True))
        read_tok = lambda o: int(np.asarray(o[0, T - 1]))
        ms_scan = timed(scan_gen, qp, img_emb, read=read_tok)
        ms_fused = timed(fused_gen, qp, img_emb, read=read_tok)
        results["generate_scan_ms"] = round(ms_scan, 3)
        results["generate_fused_ms"] = round(ms_fused, 3)
        results["generate_tokens_per_sec_scan"] = round(
            B * T / ms_scan * 1e3)
        results["generate_tokens_per_sec_fused"] = round(
            B * T / ms_fused * 1e3)
        # token parity on-chip
        t_scan = np.asarray(scan_gen(qp, img_emb))
        t_fused = np.asarray(fused_gen(qp, img_emb))
        results["generate_token_match"] = float((t_scan == t_fused).mean())
    except Exception as e:  # noqa: BLE001 — don't lose later sections
        results["generate_error"] = repr(e)[:300]
    print(json.dumps(results), flush=True)

    # ---- 2. W forward ------------------------------------------------
    rng = np.random.RandomState(1)
    for batch in (B, SERVE_BATCH):
        u8 = jax.device_put(rng.randint(0, 256, (batch, IMG, IMG, 3),
                                        dtype=np.uint8))
        qst = jax.device_put(rng.randint(0, V, (batch, T)).astype(
            np.int32))
        for seq in (False, True):
            cfg = ModelConfig(img_size=IMG, qst_vocab_size=V,
                              ans_vocab_size=A, arch_type="fixed",
                              compute_dtype="bfloat16",
                              pallas_seq_lstm=seq)
            params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)

            @jax.jit
            def step(p, u8, qst, cfg=cfg):
                return vqa_w.w_forward(p, cfg, normalize_images(u8), qst,
                                       deterministic=True)

            key = f"w_fwd_b{batch}_{'seqkernel' if seq else 'scan'}"
            try:
                ms = timed(step, params, u8, qst,
                           iters=50 if batch == B else 20)
            except Exception as e:  # noqa: BLE001
                results[key + "_error"] = repr(e)[:300]
                print(json.dumps({key + "_error":
                                  results[key + "_error"]}), flush=True)
                continue
            results[key + "_ms"] = round(ms, 3)
            results[key + "_pairs_per_sec"] = round(batch / ms * 1e3)
            print(json.dumps({key + "_ms": results[key + "_ms"],
                              key + "_pairs_per_sec":
                              results[key + "_pairs_per_sec"]}),
                  flush=True)

    # ---- 3. full stage1+stage2 train step, kernel on/off -------------
    from lctvqa.config import Config, MeshConfig, TrainConfig
    from lctvqa.models import vqa_ef
    from lctvqa.train.steps import make_lct_steps

    QLEN = 25
    batch = {
        "image_u8": jax.device_put(rng.randint(
            0, 255, (B, IMG, IMG, 3), dtype=np.uint8)),
        "question": jax.device_put(rng.randint(
            4, V, (B, QLEN)).astype(np.int32)),
        "answer_label": jax.device_put(rng.randint(
            0, A, (B,)).astype(np.int32)),
        "answer_multi_choice": jax.device_put(rng.randint(
            -1, A, (B, 10)).astype(np.int32)),
    }
    for tag, seq, gen in [("base", False, False), ("seq", True, False),
                          ("gen", False, True), ("seq+gen", True, True)]:
        cfg = Config(model=ModelConfig(img_size=IMG, qst_vocab_size=V,
                                       ans_vocab_size=A,
                                       arch_type="darts",
                                       pallas_seq_lstm=seq,
                                       pallas_generate=gen),
                     train=TrainConfig(batch_size=B),
                     mesh=MeshConfig(num_devices=1))
        steps = make_lct_steps(cfg, unk_idx=1)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        ef_params, arch = vqa_ef.init_ef_model(k1, cfg.model)
        w_params = vqa_w.init_w_model(k2, cfg.model)
        ef_opt = steps["ef_tx"].init(ef_params)
        w_opt = steps["w_tx"].init(w_params)

        def one(ef_p, ef_o, w_p, w_o, r, steps=steps):
            r1, r2 = jax.random.split(r)
            ef_p, ef_o, l1, _, _ = steps["stage1"](ef_p, arch, ef_o,
                                                   batch, r1)
            w_p, w_o, l2, _ = steps["stage2"](w_p, w_o, ef_p, arch,
                                              batch, r2)
            return ef_p, ef_o, w_p, w_o, l2

        keys = [jax.random.PRNGKey(10 + i) for i in range(20)]
        try:
            s = one(ef_params, ef_opt, w_params, w_opt, keys[0])
            float(s[4])  # compile + warm
            ef_p, ef_o, w_p, w_o = ef_params, ef_opt, w_params, w_opt
            K = 16
            t0 = time.perf_counter()
            for i in range(K):
                ef_p, ef_o, w_p, w_o, l2 = one(ef_p, ef_o, w_p, w_o,
                                               keys[i])
            float(l2)  # bounds the whole chain
        except Exception as e:  # noqa: BLE001
            results[f"train_step_{tag}_error"] = repr(e)[:300]
            print(json.dumps({f"train_step_{tag}_error":
                              results[f"train_step_{tag}_error"]}),
                  flush=True)
            continue
        ms = (time.perf_counter() - t0) / K * 1e3
        results[f"train_step_{tag}_ms"] = round(ms, 2)
        results[f"train_step_{tag}_pairs_per_sec"] = round(B / ms * 1e3)
        print(json.dumps({f"train_step_{tag}_ms": round(ms, 2)}),
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
