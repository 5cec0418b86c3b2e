"""Search-quality A/B of the LCT architect modes (round-2 verdict #10).

The 'exact' mode includes the direct alpha -> generate -> pseudo-QA
gradient path that the reference's finite-difference scheme drops;
'exact-indirect' truncates it the same way the reference does; 'fd'
replays the reference math literally (optim/architect_lct.py:29-36).
Gradient-level cross-checks exist in tests/test_architect.py — this
script asks the OUTCOME question: which mode steers the architecture
toward a planted optimal op faster?

Planted signal: the answer label is a deterministic function of a 2x2
checkerboard pattern's presence in the image (amplitude well above the
noise floor), and the question tokens are uninformative. A 2px parity
signal survives convolution primitives (sep/dil convs learn a
high-frequency detector; skip preserves it) but is destroyed by
avg_pool_3x3 smoothing and distorted by max_pool — so a search that
works should move normal-edge alpha mass from the pool ops toward the
conv/skip group. We track, per arch update: the unrolled W' val loss
(the tri-level objective) and the normal-cell alpha mass on
conv+skip vs pool ops, plus the decoded genotype at the end.

Run (CPU ok, ~minutes at the tiny dims):
    PYTHONPATH=/root/repo python scripts/ab_architect_modes.py \
        [--steps 60] [--modes exact,exact-indirect,fd]

Results are printed as one table row per mode; copy into NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# the axon TPU plugin ignores JAX_PLATFORMS (NOTES.md); the config knob
# works iff applied before backend init — this script is CPU-only so it
# never competes with TPU benchmarks for the tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=1 --xla_cpu_max_isa=AVX2")


CONV_SKIP = ("skip_connect", "sep_conv_3x3", "sep_conv_5x5",
             "sep_conv_7x7", "dil_conv_3x3", "dil_conv_5x5",
             "conv_7x1_1x7")
POOLS = ("max_pool_3x3", "avg_pool_3x3")


def make_planted_dataset(out_dir: str, n: int = 64, img: int = 32,
                         seed: int = 0):
    """Synthetic dataset whose answer is 'yes' iff the image carries a
    2x2 checkerboard; vocab/h5/npy in the standard on-disk formats."""
    from lctvqa.data.synthetic import make_dataset
    import h5py

    make_dataset(out_dir, num_images=n, num_questions=2 * n,
                 img_size=img, n_answers=8, seed=seed)
    rng = np.random.RandomState(seed + 1)
    yy, xx = np.meshgrid(np.arange(img), np.arange(img), indexing="ij")
    checker = (((yy // 2 + xx // 2) % 2) * 2.0 - 1.0)[..., None]
    split_has = {}
    with h5py.File(os.path.join(out_dir, "images.h5"), "r+") as fd:
        for split in ("train", "val"):
            imgs = fd[split]["images"][:]
            m = imgs.shape[0]
            has = rng.rand(m) < 0.5
            split_has[split] = has
            base = rng.randint(96, 160, imgs.shape).astype(np.float64)
            base += np.where(has[:, None, None, None], 60.0 * checker, 0.0)
            fd[split]["images"][:] = np.clip(base, 0, 255).astype(np.uint8)
    # labels follow the planted pattern (answers vocab: idx of yes/no)
    from lctvqa.text import VocabDict
    av = VocabDict(os.path.join(out_dir, "vocab_answers.txt"))
    yes, no = av.word2idx("yes"), av.word2idx("no")
    with h5py.File(os.path.join(out_dir, "qst-ans.h5"), "r+") as fd:
        for split in ("train", "val"):
            img_ids = fd[split]["img_id"][:]
            with h5py.File(os.path.join(out_dir, "images.h5"), "r") as f2:
                coco = {int(c): i for i, c in
                        enumerate(f2[split]["coco_ids"][:])}
            has = split_has[split]
            enc = np.zeros_like(fd[split]["enc_ans"][:])
            for row, iid in enumerate(img_ids):
                lab = yes if has[coco[int(iid)]] else no
                enc[row, :] = 0
                enc[row, lab] = 10
            fd[split]["enc_ans"][:] = enc
    return out_dir


def alpha_mass(arch, which="alphas_normal"):
    import jax
    from lctvqa.models.genotypes import PRIMITIVES
    a = np.asarray(jax.nn.softmax(np.asarray(arch[which]), axis=-1))
    conv = sum(a[:, PRIMITIVES.index(p)].mean() for p in CONV_SKIP
               if p in PRIMITIVES)
    pool = sum(a[:, PRIMITIVES.index(p)].mean() for p in POOLS)
    return float(conv), float(pool)


def run_mode(mode: str, data_dir: str, steps: int, seed: int = 10,
             arch_lr: float = 6e-3, arch_wd: float = 1e-3,
             layers: int = 3):
    import jax

    from lctvqa.config import (Config, DataConfig, MeshConfig, ModelConfig,
                               TrainConfig)
    from lctvqa.models import search
    from lctvqa.text import VocabDict
    from lctvqa.train.experiment import Experiment

    qv = VocabDict(os.path.join(data_dir, "vocab_questions.txt"))
    av = VocabDict(os.path.join(data_dir, "vocab_answers.txt"))
    model = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=qv.vocab_size,
        ans_vocab_size=av.vocab_size, img_size=32, darts_init_ch=4,
        # layers=3 so the NORMAL alphas are live (with layers=1 the lone
        # cell is a reduction cell and alphas_normal has zero gradient by
        # construction — the grad probe's note below)
        darts_layers=layers, darts_steps=2, darts_multiplier=2,
        compute_dtype="float32", vgg_width_mult=1 / 16, vgg_fc_dim=32)
    cfg = Config(
        model=model,
        train=TrainConfig(batch_size=16, num_epochs=1, arch_update_freq=1,
                          skip_stage2=False, skip_stage3=False,
                          report_freq=1000, architect_mode=mode, seed=seed,
                          # 10x+ the reference arch lr: a 48-update probe
                          # at 6e-4 moves group alpha-mass by <5e-5 (raw
                          # |d alpha| ~2e-3 but direction-canceling), so
                          # the planted-op question needs a lr/steps
                          # combination whose max logit travel (~steps *
                          # lr) is O(1). arch_wd=0 leaves the recovery
                          # regime visible: at the reference's 1e-3 the
                          # decay pull back to uniform dominates the
                          # tri-level gradient at probe scale (r3 NOTES).
                          arch_learning_rate=arch_lr,
                          arch_weight_decay=arch_wd),
        data=DataConfig(input_dir=data_dir),
        mesh=MeshConfig(num_devices=1),
        exp_name=f"ab_{mode}",
        root_stats_dir=tempfile.mkdtemp(prefix=f"ab_{mode}_"))
    exp = Experiment(cfg)
    conv0, pool0 = alpha_mass(exp.arch)
    t0 = time.time()
    epochs = max(1, steps // max(len(exp.data["train"]) //
                                 cfg.train.batch_size, 1))
    traj = []
    for _ in range(epochs):
        exp.train_epoch()
        c, p = alpha_mass(exp.arch)
        traj.append(round(c - p, 4))
    conv1, pool1 = alpha_mass(exp.arch)
    geno = search.genotype(exp.arch, model.darts_steps,
                           model.darts_multiplier)
    n_pool = sum(1 for op, _ in geno.normal if op in POOLS)
    return {
        "mode": mode,
        "seed": seed,
        "arch_lr": arch_lr,
        "arch_wd": arch_wd,
        "epochs": epochs,
        "conv_mass_delta": round(conv1 - conv0, 4),
        "pool_mass_delta": round(pool1 - pool0, 4),
        "margin_trajectory": traj,  # (conv+skip mass − pool mass) / epoch
        "pool_ops_in_genotype": n_pool,
        "genotype_normal": [op for op, _ in geno.normal],
        "final_train_ef_acc": round(exp.train_ef_acc[-1], 4),
        "wall_s": round(time.time() - t0, 1),
    }


def run_grad_probe(data_dir: str, epochs: int = 10, seed: int = 10):
    """Paired raw-gradient A/B: one common trajectory (stage3 OFF), and at
    every epoch end all three modes compute their arch gradient on the
    SAME (arch, ef_params, w_params, batch) state. This isolates the mode
    question from optimizer dynamics: the outcome probe above showed the
    tri-level gradient is small enough that arch weight-decay (1e-3) pulls
    alpha back to uniform regardless of mode, so post-hoc alpha mass
    cannot separate modes at probe scale. Reported per mode:
      pool_push   mean d(pool-mass direction) under descent on the probe
                  gradient — negative = the mode steers away from the
                  pool ops (the planted signal's correct direction)
      sign-       fraction of probes with pool_push < 0
      |g|         mean gradient norm (alphas_normal)
    plus pairwise cosine similarity between the modes' alpha gradients.
    """
    import jax.numpy as jnp

    from lctvqa.config import (Config, DataConfig, MeshConfig, ModelConfig,
                               TrainConfig)
    from lctvqa.models.genotypes import PRIMITIVES
    from lctvqa.optim.architect_lct import make_lct_arch_grad
    from lctvqa.text import VocabDict
    from lctvqa.train.experiment import Experiment, _dev_batch
    from lctvqa.train.steps import normalize_images

    qv = VocabDict(os.path.join(data_dir, "vocab_questions.txt"))
    av = VocabDict(os.path.join(data_dir, "vocab_answers.txt"))
    model = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=qv.vocab_size,
        ans_vocab_size=av.vocab_size, img_size=32, darts_init_ch=4,
        # 3 cells so BOTH normal (cell 0) and reduce (cells 1,2) alphas
        # are live: with darts_layers=1 the lone cell is a reduction cell
        # (reduction at layers//3==0) and alphas_normal is structurally
        # unused — its gradient is exactly zero by construction, which is
        # what the first probe of this A/B unknowingly measured.
        darts_layers=3, darts_steps=2, darts_multiplier=2,
        compute_dtype="float32", vgg_width_mult=1 / 16, vgg_fc_dim=32)
    cfg = Config(
        model=model,
        train=TrainConfig(batch_size=16, num_epochs=1,
                          skip_stage2=False, skip_stage3=True,
                          report_freq=1000, seed=seed),
        data=DataConfig(input_dir=data_dir),
        mesh=MeshConfig(num_devices=1),
        exp_name="ab_gradprobe",
        root_stats_dir=tempfile.mkdtemp(prefix="ab_gradprobe_"))
    exp = Experiment(cfg)
    modes = ("exact", "exact-indirect", "fd")
    grad_fns = {m: jax.jit(make_lct_arch_grad(cfg.model, cfg.train, m))
                for m in modes}

    def with_img(b):
        b = _dev_batch(b)
        return dict(b, image=normalize_images(
            b["image_u8"], cfg.data.mean, cfg.data.std))

    tb = with_img(next(iter(exp._batches("train", shuffle=False))))
    vb = with_img(next(iter(exp._batches("valid", shuffle=False))))
    pool_cols = np.array([PRIMITIVES.index(p) for p in POOLS])
    tensors = ("alphas_normal", "alphas_reduce")
    push = {(m, t): [] for m in modes for t in tensors}
    norms = {(m, t): [] for m in modes for t in tensors}
    coss = {}
    lr = jnp.float32(1e-3)
    for e in range(epochs):
        exp.train_epoch()
        rng = jax.random.PRNGKey(1000 + e)
        gs = {}
        for m in modes:
            g, _vl = grad_fns[m](exp.arch, exp.ef_params, exp.w_params,
                                 tb, vb, lr, lr, rng)
            flat = []
            for t in tensors:
                gn = np.asarray(g[t], np.float64)
                flat.append(gn.ravel())
                centered = gn - gn.mean(axis=1, keepdims=True)
                # descent moves pool logits by -g; softmax mass follows
                # the centered logit movement to first order
                push[(m, t)].append(float(-centered[:, pool_cols].mean()))
                norms[(m, t)].append(float(np.linalg.norm(gn)))
            gs[m] = np.concatenate(flat)
        for i, a in enumerate(modes):
            for b in modes[i + 1:]:
                c = float(np.dot(gs[a], gs[b]) /
                          (np.linalg.norm(gs[a]) * np.linalg.norm(gs[b])
                           + 1e-30))
                coss.setdefault((a, b), []).append(c)
    out = {"probe_epochs": epochs}
    print("\nmode/tensor                     pool_push(mean+-std)   "
          "sign-  |g|")
    for m in modes:
        for t in tensors:
            p_, n_ = np.array(push[(m, t)]), np.array(norms[(m, t)])
            frac = float((p_ < 0).mean())
            out[f"{m}/{t}"] = {"pool_push_mean": float(p_.mean()),
                               "pool_push_std": float(p_.std()),
                               "frac_negative": frac,
                               "grad_norm_mean": float(n_.mean())}
            print(f"{m:16s}{t:16s} {p_.mean():+.2e}+-{p_.std():.2e}   "
                  f"{frac:.2f}   {n_.mean():.2e}")
    print("pairwise cosine(alpha grads, normal+reduce concat):")
    for (a, b), cs in coss.items():
        out[f"cos({a},{b})"] = float(np.mean(cs))
        print(f"  {a} vs {b}: {np.mean(cs):+.3f}")
    print(json.dumps(out))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=240)
    p.add_argument("--modes", type=str,
                   default="exact,exact-indirect,fd")
    p.add_argument("--arch_lr", type=float, default=6e-3)
    p.add_argument("--arch_wd", type=float, default=1e-3)
    p.add_argument("--seeds", type=str, default="10",
                   help="comma list; each (mode, seed) runs its own "
                        "trajectory (r3 verdict #3: >=3 seeds)")
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--out_json", type=str, default="",
                   help="append one JSON line per run to this file")
    p.add_argument("--grad_probe", action="store_true",
                   help="paired raw-gradient A/B on a common trajectory "
                        "instead of the outcome probe")
    p.add_argument("--probe_epochs", type=int, default=10)
    args = p.parse_args()
    from lctvqa import compile_cache
    compile_cache.enable()
    data_dir = args.data_dir or make_planted_dataset(
        tempfile.mkdtemp(prefix="ab_planted_"))
    if args.grad_probe:
        run_grad_probe(data_dir, epochs=args.probe_epochs)
        return
    rows = []
    for seed in (int(s) for s in args.seeds.split(",")):
        for mode in args.modes.split(","):
            r = run_mode(mode, data_dir, args.steps, seed=seed,
                         arch_lr=args.arch_lr, arch_wd=args.arch_wd)
            rows.append(r)
            print(json.dumps(r), flush=True)
            if args.out_json:
                with open(args.out_json, "a") as f:
                    f.write(json.dumps(r) + "\n")
    print("\nmode             seed  d(conv+skip)  d(pool)  pools-in-geno"
          "  ef_acc  wall_s")
    for r in rows:
        print(f"{r['mode']:16s} {r['seed']:<5d} "
              f"{r['conv_mass_delta']:+.4f}      "
              f"{r['pool_mass_delta']:+.4f}  {r['pool_ops_in_genotype']}"
              f"              {r['final_train_ef_acc']:.3f}  "
              f"{r['wall_s']}")


if __name__ == "__main__":
    main()
