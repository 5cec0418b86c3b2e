"""Input-pipeline throughput A/B (BASELINE.json config #2).

Measures host-side batch-assembly throughput (pairs/s) of the rebuilt
pipeline against a faithful emulation of the reference's per-item torch
DataLoader, on the SAME synthetic dataset on the SAME host — the only
benchmark in BASELINE.json that is purely host work, so it is measurable
without the TPU.

Paths measured:

  lctvqa vectorized      VqaH5Dataset(preload='ram') + epoch_batches
                         (whole-batch numpy/native assembly; uint8 images
                         — normalization happens on-device, fused)
  lctvqa +native         same with the C++ core (fused row gather +
                         answer sampling), if built
  reference-style torch  per-item h5 reads + PIL + ToTensor+Normalize
                         (fp32 on host) + np.random.choice answer
                         sampling under torch default collate — the
                         semantics of `basic_vqa/data_loader_v2.py:17-77`

The architectural difference being measured is the design, not the
library: the reference converts+normalizes each image to fp32 on the
host and collates item dicts; the rebuild ships uint8 and assembles
whole batches with vectorized gathers.

Usage: python scripts/bench_pipeline.py [--input_dir D] [--batch_size 64]
         [--epochs 3] [--num_images 256] [--num_questions 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def _bench_lctvqa(input_dir: str, batch_size: int, epochs: int,
                  use_native: bool) -> float:
    from lctvqa.data.pipeline import VqaH5Dataset, epoch_batches

    ds = VqaH5Dataset(input_dir, "train", preload="ram")
    rng = np.random.default_rng(0)
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in epoch_batches(ds, batch_size, rng,
                                   num_workers=1):
            # touch the arrays so lazy views can't defer work
            n += batch["image_u8"].shape[0]
            assert batch["answer_label"].shape[0] == batch_size
    # epoch_batches routes through ds.gather(use_native=...) internally;
    # for the pure-numpy row we re-run gather directly
    if not use_native:
        n, t0 = 0, time.perf_counter()
        for _ in range(epochs):
            idx = np.arange(len(ds))
            rng.shuffle(idx)
            for s in range(0, len(ds) - batch_size + 1, batch_size):
                b = ds.gather(idx[s:s + batch_size], rng,
                              use_native=False)
                n += b["image_u8"].shape[0]
    return n / (time.perf_counter() - t0)


def _bench_reference_style(input_dir: str, batch_size: int,
                           epochs: int, num_workers: int = 0) -> float:
    """Reference data_loader_v2 semantics (per-item h5 + PIL + host fp32
    normalize + default collate), reimplemented minimally for timing."""
    import h5py
    import torch
    from PIL import Image

    from lctvqa.text import VocabDict

    # ToTensor + Normalize equivalents (torchvision isn't in this image):
    # per-item HWC uint8 -> CHW fp32 in [0,1] -> imagenet-normalized.
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    def tf(img):
        t = torch.from_numpy(np.asarray(img, np.uint8).copy())
        t = t.permute(2, 0, 1).float().div_(255.0)
        return t.sub_(mean).div_(std)
    ans_vocab = VocabDict(os.path.join(input_dir, "vocab_answers.txt"))

    class PerItem(torch.utils.data.Dataset):
        def __init__(self):
            self.h5_img = self.h5_qa = None
            with h5py.File(os.path.join(input_dir, "qst-ans.h5"), "r") as f:
                self.n = len(f["train/enc_qst"])
            with h5py.File(os.path.join(input_dir, "images.h5"), "r") as f:
                ids = f["train/coco_ids"][()]
            self.img_row = {int(c): i for i, c in enumerate(ids)}

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            if self.h5_qa is None:  # lazy per-worker handles
                self.h5_qa = h5py.File(
                    os.path.join(input_dir, "qst-ans.h5"), "r")
                self.h5_img = h5py.File(
                    os.path.join(input_dir, "images.h5"), "r")
            g = self.h5_qa["train"]
            enc_qst = g["enc_qst"][i].astype("int64")
            enc_ans = g["enc_ans"][i]
            row = self.img_row[int(g["img_id"][i])]
            img = tf(Image.fromarray(self.h5_img["train/images"][row]))
            valid = enc_ans.nonzero()[0]
            label = (np.random.choice(valid) if valid.size
                     else ans_vocab.unk2idx)
            mc = np.full(10, -1, np.int64)
            mc[:min(valid.size, 10)] = valid[:10]
            return {"image": img, "question": enc_qst,
                    "answer_label": int(label),
                    "answer_multi_choice": mc}

    loader = torch.utils.data.DataLoader(
        PerItem(), batch_size=batch_size, shuffle=True, drop_last=True,
        num_workers=num_workers)
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch["image"].shape[0]
    return n / (time.perf_counter() - t0)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input_dir", type=str, default=None,
                   help="existing dataset dir (default: build synthetic)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--num_images", type=int, default=256)
    p.add_argument("--num_questions", type=int, default=8192)
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--torch_workers", type=int, default=0,
                   help="DataLoader workers for the reference-style path")
    args = p.parse_args(argv)

    input_dir = args.input_dir
    if input_dir is None:
        from lctvqa.data.synthetic import make_dataset
        input_dir = os.path.join(tempfile.gettempdir(),
                                 f"vqa_pipe_{args.num_questions}")
        if not os.path.exists(os.path.join(input_dir, "qst-ans.h5")):
            print(f"building synthetic dataset in {input_dir} ...")
            make_dataset(input_dir, num_images=args.num_images,
                         num_questions=args.num_questions,
                         img_size=args.img_size, n_answers=64)

    from lctvqa import native
    rows = {}
    rows["lctvqa_numpy"] = _bench_lctvqa(
        input_dir, args.batch_size, args.epochs, use_native=False)
    if native.available():
        rows["lctvqa_native"] = _bench_lctvqa(
            input_dir, args.batch_size, args.epochs, use_native=True)
    else:
        print("(C++ core not built; python -m lctvqa.native.build)")
    rows["reference_style_torch"] = _bench_reference_style(
        input_dir, args.batch_size, args.epochs, args.torch_workers)

    best = max(v for k, v in rows.items() if k.startswith("lctvqa"))
    ref = rows["reference_style_torch"]
    print(f"\n{'path':<24} {'pairs/s':>12}")
    for k, v in rows.items():
        print(f"{k:<24} {v:>12.0f}")
    print(f"\nspeedup (best lctvqa / reference-style): {best / ref:.1f}x")
    print(json.dumps({"pipeline_bench": {k: round(v, 1)
                                         for k, v in rows.items()},
                      "speedup": round(best / ref, 1)}))


if __name__ == "__main__":
    main()
