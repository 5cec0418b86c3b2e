"""Checkpoint evaluation CLI — the reference's `model-eval.ipynb` as a
script: load an experiment checkpoint, report val loss / multi-choice
accuracy / BLEU4, and print deterministic vs temperature-sampled generated
questions for a few images.

    python -m lctvqa.eval --exp my_exp --input_dir data/vqa/hdf5_64
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--root_stats_dir", type=str, default="./experiment_data")
    p.add_argument("--input_dir", type=str, default="data/vqa/hdf5_64")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--num_show", type=int, default=4)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--arch_type", type=str, default="darts")
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--int8", action="store_true",
                   help="serve the checkpoint int8-quantized (lctvqa/quant"
                        ".py; fixed/derived encoders only — decode a "
                        "searched supernet to a genotype first)")
    p.add_argument("--tp", type=int, default=1,
                   help="model-parallel degree: serve over a 2-D "
                        "(data x model) mesh with the VGG classifier "
                        "megatron-split (parallel/tp.py); device_count "
                        "must be divisible by TP")
    p.add_argument("--trusted", action="store_true",
                   help="allow loading LEGACY pickle checkpoints "
                        "(pickle.load executes code from the file)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lctvqa.config import ModelConfig
    from lctvqa.data import pipeline
    from lctvqa.models import search, vqa_ef
    from lctvqa.text import VocabDict
    from lctvqa.train import checkpoint
    from lctvqa.train.metrics import (VqaStruct, calc_bleu_scores, mask_unk,
                                      num_correct)

    qv = VocabDict(os.path.join(args.input_dir, "vocab_questions.txt"))
    av = VocabDict(os.path.join(args.input_dir, "vocab_answers.txt"))

    exp_dir = os.path.join(args.root_stats_dir, args.exp)
    state = checkpoint.load_state(os.path.join(exp_dir, "ef_model.ckpt"),
                                  trusted=args.trusted)
    ef_params, arch = state["ef_params"], state["arch"]
    if state.get("config") is not None:
        # checkpoints are self-describing: rebuild the exact model config
        mcfg = state["config"].model
        version = state.get("lctvqa_version", "?")
        print(f"model config from checkpoint (lctvqa {version})")
    else:
        # legacy artifact without an embedded config: flags must match
        mcfg = ModelConfig(arch_type=args.arch_type, img_size=args.img_size,
                           qst_vocab_size=qv.vocab_size,
                           ans_vocab_size=av.vocab_size,
                           compute_dtype=args.compute_dtype)
    print(f"loaded epoch {state['epoch']} from {exp_dir}")
    if args.int8:
        # One tree rewrite; every forward below dispatches int8 on the
        # quantized conv/linear params (see lctvqa/quant.py).
        from lctvqa import quant
        if mcfg.arch_type == "darts":
            raise SystemExit("--int8 cannot serve the darts supernet; "
                             "retrain with --arch_type derived first "
                             "(python -m lctvqa.genotype <ckpt>)")
        ef_params = quant.quantize_model(ef_params)
        print("serving int8 (weights quantized; LSTM/depthwise stay fp)")
    if arch is not None:
        print("genotype:", search.genotype(arch, mcfg.darts_steps,
                                           mcfg.darts_multiplier))

    put_batch = lambda x: x  # noqa: E731 — identity off-mesh
    dp_axis = 1
    if args.tp > 1:
        import dataclasses

        from lctvqa.parallel import tp as tp_lib
        ndev = jax.device_count()
        if ndev % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide "
                             f"device_count {ndev}")
        dp = ndev // args.tp
        if args.batch_size % max(dp, 1):
            raise SystemExit(f"--batch_size {args.batch_size} not "
                             f"divisible by the data axis ({dp})")
        # Pallas kernels are single-chip accelerations; Mosaic custom
        # calls cannot be auto-partitioned (same guard as Experiment).
        mcfg = dataclasses.replace(
            mcfg, pallas_mixed_op=False, use_pallas_lstm=False,
            pallas_generate=False, pallas_seq_lstm=False)
        mesh2 = tp_lib.make_mesh_2d(dp, args.tp)
        ef_params = tp_lib.shard_params(ef_params, mesh2)
        if arch is not None:
            arch = jax.device_put(arch, tp_lib.replicated(mesh2))
        bsh = tp_lib.batch_sharding(mesh2)
        put_batch = lambda x: jax.device_put(np.asarray(x), bsh)  # noqa: E731
        dp_axis = dp
        print(f"serving on a {dp}x{args.tp} (data x model) mesh")

    data = pipeline.VqaH5Dataset(args.input_dir, "val")
    vqa_struct = VqaStruct(args.input_dir, "valid.npy")
    rng = np.random.default_rng(0)

    @jax.jit
    def eval_step(params, arch, u8, qst, labels, mc):
        img = pipeline.normalize_images(u8)
        ans_logits, _ = vqa_ef.ef_forward(params, arch, mcfg, img, qst,
                                          deterministic=True)
        pred = jnp.argmax(ans_logits, axis=1)
        corr = num_correct(mask_unk(pred, av.unk2idx), mc)
        gen_det, gen_ans = vqa_ef.ef_generate(params, arch, mcfg, img,
                                              deterministic=True)
        return corr, gen_det, jnp.argmax(gen_ans, 1)

    @jax.jit
    def sample_step(params, arch, u8, key):
        img = pipeline.normalize_images(u8)
        gen, _ = vqa_ef.ef_generate(params, arch, mcfg, img, rng=key,
                                    deterministic=True,
                                    sample_deterministic=False,
                                    temperature=args.temperature)
        return gen

    total_corr = n = 0
    total_b4 = 0.0
    for bi, batch in enumerate(pipeline.epoch_batches(
            data, args.batch_size, rng, shuffle=False)):
        if bi >= args.num_batches:
            break
        if len(batch["image_u8"]) % dp_axis:
            break  # ragged final batch cannot shard over the data axis
        corr, gen_det, gen_pred = eval_step(
            ef_params, arch, put_batch(batch["image_u8"]),
            put_batch(batch["question"]),
            put_batch(batch["answer_label"]),
            put_batch(batch["answer_multi_choice"]))
        total_corr += int(corr)
        n += len(batch["image_u8"])
        names = data.image_names(batch["index"])
        total_b4 += calc_bleu_scores(names, np.asarray(gen_det), qv,
                                     vqa_struct)
        if bi == 0:
            gen_sto = sample_step(ef_params, arch,
                                  put_batch(batch["image_u8"]),
                                  jax.random.PRNGKey(1))
            print("\n=== deterministic vs stochastic generation ===")
            for i in range(min(args.num_show, len(names))):
                gt = qv.arr2qst(batch["question"][i])
                print(f"[{names[i]}]")
                print(f"  gt:     {gt}")
                print(f"  argmax: {qv.arr2qst(np.asarray(gen_det)[i])} "
                      f"-> {av.idx2word(int(gen_pred[i]))}")
                print(f"  T={args.temperature}: "
                      f"{qv.arr2qst(np.asarray(gen_sto)[i])}")
    print(f"\nval multi-choice acc (unk-masked): {total_corr / n:.4f} "
          f"over {n} items; BLEU4 {total_b4 / min(args.num_batches, bi + 1):.2f}")


if __name__ == "__main__":
    main()
