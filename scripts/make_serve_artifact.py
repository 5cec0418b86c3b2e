"""Build a reference-dims serving artifact without a training run.

The serving load bench (scripts/bench_serving.py) needs an exported
artifact; producing one normally takes a full experiment + export. For
chip-side load measurement only the program SHAPES matter (64px images,
reference vocab/answer sizes), so this initializes a fresh W model at
reference dims over a synthetic vocab and exports it.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/make_serve_artifact.py \
      --out /tmp/w_serve.lctx [--img_size 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import tempfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/w_serve.lctx")
    p.add_argument("--img_size", type=int, default=64)
    args = p.parse_args()

    from lctvqa import compile_cache
    compile_cache.enable()
    import jax

    from lctvqa import export as exp_mod
    from lctvqa.config import ModelConfig
    from lctvqa.data import synthetic
    from lctvqa.models import vqa_w

    with tempfile.TemporaryDirectory() as td:
        synth = os.path.join(td, "synth")
        synthetic.make_dataset(synth, num_images=4, num_questions=8,
                               img_size=args.img_size)
        mcfg = ModelConfig(img_size=args.img_size, arch_type="fixed")
        # Pad the synthetic vocab files out to the model's reference dims
        # (export.py validates vocab length == head size; for a
        # shapes-only serving artifact the filler words are inert).
        for fname, want in (("vocab_questions.txt", mcfg.qst_vocab_size),
                            ("vocab_answers.txt", mcfg.ans_vocab_size)):
            path = os.path.join(synth, fname)
            with open(path) as f:
                n = sum(1 for _ in f)
            with open(path, "a") as f:
                for i in range(want - n):
                    f.write(f"fillerword{i}\n")
        params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)
        artifact = exp_mod.export_state({"w_params": params}, mcfg,
                                        input_dir=synth)
        exp_mod.save_artifact(artifact, args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
