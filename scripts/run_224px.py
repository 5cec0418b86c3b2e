"""224px configuration exercised end-to-end (round-2 verdict #5).

The reference's full-resolution config (`utils/preprocess_images.py:85`
defaults to 224) is what the chunked-h5 lazy reader and `remat_cells`
exist for; this script runs ONE epoch of the full LCT loop (all three
stages) at 224px on the attached chip with `preload='lazy'` +
`remat_cells`, then prints per-stage ms and HBM stats for NOTES.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_224px.py \
          [--batch_size 64] [--no_remat] [--skip_stage3]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_images", type=int, default=64)
    p.add_argument("--num_questions", type=int, default=256)
    p.add_argument("--num_epochs", type=int, default=1,
                   help="r3 verdict #9: epoch 1 is compile-dominated; "
                        "run >=2 and read the LAST epoch's wall for the "
                        "warm steady-state ms/step")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--skip_stage3", action="store_true")
    p.add_argument("--skip_val", action="store_true")
    p.add_argument("--report_freq", type=int, default=1,
                   help="report_freq=1 forces a loss readback (device "
                        "sync) every step; a large value leaves the "
                        "epoch async-dispatched so the wall isolates "
                        "device exec + input from per-step sync. The "
                        "compiled programs are identical either way "
                        "(host-side logging only), so flipping this "
                        "hits the persistent compile cache.")
    args = p.parse_args()

    from lctvqa import compile_cache
    compile_cache.enable()
    import dataclasses

    import jax

    from lctvqa.config import (Config, DataConfig, MeshConfig, ModelConfig,
                               TrainConfig)
    from lctvqa.data.synthetic import make_dataset
    from lctvqa.text import VocabDict
    from lctvqa.train.experiment import Experiment

    data_dir = os.path.join(tempfile.gettempdir(), "vqa_synth224")
    if not os.path.exists(os.path.join(data_dir, "images.h5")):
        t0 = time.time()
        make_dataset(data_dir, num_images=args.num_images,
                     num_questions=args.num_questions, img_size=224,
                     n_answers=64)
        print(f"dataset built in {time.time() - t0:.1f}s")
    qv = VocabDict(os.path.join(data_dir, "vocab_questions.txt"))
    av = VocabDict(os.path.join(data_dir, "vocab_answers.txt"))

    model = ModelConfig(img_size=224, qst_vocab_size=qv.vocab_size,
                        ans_vocab_size=av.vocab_size, arch_type="darts",
                        compute_dtype="bfloat16",
                        remat_cells=not args.no_remat)
    cfg = Config(
        model=model,
        train=TrainConfig(batch_size=args.batch_size, num_epochs=1,
                          arch_update_freq=2000,
                          skip_stage2=False,
                          skip_stage3=args.skip_stage3,
                          report_freq=args.report_freq),
        data=DataConfig(input_dir=data_dir, preload_images="lazy"),
        mesh=MeshConfig(num_devices=1),
        exp_name="run224",
        root_stats_dir=tempfile.mkdtemp(prefix="run224_"))
    t0 = time.time()
    exp = Experiment(cfg)
    import numpy as np

    from lctvqa.data.pipeline import VqaH5Dataset
    assert isinstance(exp.data["train"], VqaH5Dataset)
    assert not isinstance(exp.data["train"].images, np.ndarray), \
        "lazy mode expected (images must stay an h5 dataset)"
    steps_per_epoch = max(len(exp.data["train"]) // args.batch_size, 1)
    epoch_walls = []
    for _ in range(args.num_epochs):
        te = time.time()
        exp.train_epoch()
        epoch_walls.append(round(time.time() - te, 1))
    if not args.skip_val:
        exp.val()
    wall = time.time() - t0
    warm_ms_per_step = (epoch_walls[-1] * 1e3 / steps_per_epoch
                        if len(epoch_walls) > 1 else None)
    dev = jax.devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats()
        stats = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                    "bytes_limit") if k in ms}
    except Exception as e:  # noqa: BLE001 — memory_stats optional on axon
        stats = {"memory_stats_error": str(e)}
    print(json.dumps({
        "img_size": 224,
        "batch_size": args.batch_size,
        "remat_cells": not args.no_remat,
        "train_ef_loss": exp.train_ef_loss,
        "val_ef_loss": exp.val_ef_loss,
        "wall_s_total": round(wall, 1),
        "epoch_walls_s": epoch_walls,
        "steps_per_epoch": steps_per_epoch,
        "warm_ms_per_step": (round(warm_ms_per_step, 1)
                             if warm_ms_per_step else None),
        "hbm": stats,
    }))


if __name__ == "__main__":
    main()
