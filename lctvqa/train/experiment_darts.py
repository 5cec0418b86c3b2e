"""2-stage DARTS experiment + unified variant (reference
`darts_vqa/experiment.py`, `darts_vqa/exp_unified.py`).

Loop: every `arch_update_freq` steps a standard second-order DARTS
architect step on a cycled validation batch, then a weight update with
loss = answer CE + question CE (or question-only, or unified next-token
CE). Validation: loss, multi-choice accuracy with <unk> masked to -9999
(darts_vqa/experiment.py:259), BLEU4 of generated questions; the unified
variant scores exact answer-string match and BLEU over the qa stream.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
from itertools import cycle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lctvqa.config import Config
from lctvqa.data import pipeline_npy
from lctvqa.data.pipeline import normalize_images
from lctvqa.models import search, unified as unified_model, vqa_ef
from lctvqa.optim.architect import make_darts_arch_grad
from lctvqa.optim.optimizers import (arch_optimizer, model_optimizer,
                                     set_learning_rate, step_lr)
from lctvqa.parallel import mesh as mesh_lib
from lctvqa.train import checkpoint
from lctvqa.train.metrics import (VqaStruct, calc_bleu_scores,
                                  calc_bleu_scores_unified, mask_unk,
                                  num_correct, unified_ans_acc)


def make_darts_steps(cfg: Config, unk_idx: int, qst_only: bool = False):
    """Jitted steps for the (non-unified) 2-stage loop."""
    mcfg, tcfg = cfg.model, cfg.train
    tx = model_optimizer(tcfg)
    arch_tx = arch_optimizer(tcfg)
    mean, std = cfg.data.mean, cfg.data.std

    # Second-order AD closure: both Pallas kernels swap to their
    # parity-pinned jnp/XLA forms — the compiled pallas_call cannot sit in
    # the unknown region of the outer linearization (see
    # optim/architect_lct.make_lct_arch_grad for the full story).
    arch_mcfg = dataclasses.replace(mcfg, use_pallas_lstm=False,
                                    pallas_mixed_op=False,
                                    pallas_generate=False,
                                    pallas_seq_lstm=False)

    def loss_fn(p, a, batch, rng):
        return vqa_ef.ef_loss(p, a, arch_mcfg, batch["image"],
                              batch["question"], batch["answer_label"],
                              rng=rng, deterministic=False,
                              qst_only=qst_only)

    arch_grad = make_darts_arch_grad(loss_fn, mode=tcfg.architect_mode)

    def _img(batch):
        return normalize_images(batch["image_u8"], mean, std)

    @jax.jit
    def arch_step(arch, arch_opt_state, params, train_batch, val_batch,
                  eta, rng):
        tb = dict(train_batch, image=_img(train_batch))
        vb = dict(val_batch, image=_img(val_batch))
        g_a, val_loss = arch_grad(params, arch, tb, vb, eta, rng)
        updates, arch_opt_state = arch_tx.update(g_a, arch_opt_state, arch)
        arch = optax.apply_updates(arch, updates)
        return arch, arch_opt_state, val_loss

    @jax.jit
    def train_step(params, opt_state, arch, batch, rng):
        img = _img(batch)

        def loss_with_aux(p):
            ans_logits, qst_logits = vqa_ef.ef_forward(
                p, arch, mcfg, img, batch["question"], rng=rng,
                deterministic=False)
            v = qst_logits.shape[-1]
            from lctvqa.ops.losses import cross_entropy
            qst_ce = cross_entropy(qst_logits[:, :-1].reshape(-1, v),
                                   batch["question"][:, 1:].reshape(-1))
            if qst_only:
                return qst_ce, ans_logits
            return (cross_entropy(ans_logits, batch["answer_label"])
                    + qst_ce), ans_logits

        (loss, ans_logits), grads = jax.value_and_grad(
            loss_with_aux, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, arch, batch, rng):
        img = _img(batch)
        from lctvqa.ops.losses import cross_entropy
        ans_logits, qst_logits = vqa_ef.ef_forward(
            params, arch, mcfg, img, batch["question"], deterministic=True)
        v = qst_logits.shape[-1]
        loss = (cross_entropy(ans_logits, batch["answer_label"])
                + cross_entropy(qst_logits[:, :-1].reshape(-1, v),
                                batch["question"][:, 1:].reshape(-1)))
        pred = jnp.argmax(ans_logits, axis=1)
        corr = num_correct(mask_unk(pred, unk_idx),
                           batch["answer_multi_choice"])
        gen_qst, _ = vqa_ef.ef_generate(params, arch, mcfg, img, rng=rng,
                                        deterministic=True)
        return loss, corr, gen_qst

    return {"arch": arch_step, "train": train_step, "eval": eval_step,
            "tx": tx, "arch_tx": arch_tx}


def make_unified_steps(cfg: Config):
    mcfg, tcfg = cfg.model, cfg.train
    tx = model_optimizer(tcfg)
    arch_tx = arch_optimizer(tcfg)
    mean, std = cfg.data.mean, cfg.data.std

    # see make_darts_steps: kernels swapped for second-order AD
    arch_mcfg = dataclasses.replace(mcfg, use_pallas_lstm=False,
                                    pallas_mixed_op=False,
                                    pallas_generate=False,
                                    pallas_seq_lstm=False)

    def loss_fn(p, a, batch, rng):
        return unified_model.unified_loss(p, a, arch_mcfg, batch["image"],
                                          batch["qa_str"], rng=rng,
                                          deterministic=False)

    arch_grad = make_darts_arch_grad(loss_fn, mode=tcfg.architect_mode)

    def _img(batch):
        return normalize_images(batch["image_u8"], mean, std)

    @jax.jit
    def arch_step(arch, arch_opt_state, params, train_batch, val_batch,
                  eta, rng):
        tb = dict(train_batch, image=_img(train_batch))
        vb = dict(val_batch, image=_img(val_batch))
        g_a, val_loss = arch_grad(params, arch, tb, vb, eta, rng)
        updates, arch_opt_state = arch_tx.update(g_a, arch_opt_state, arch)
        arch = optax.apply_updates(arch, updates)
        return arch, arch_opt_state, val_loss

    @jax.jit
    def train_step(params, opt_state, arch, batch, rng):
        img = _img(batch)

        def loss_with_aux(p):
            logits = unified_model.unified_forward(
                p, arch, mcfg, img, batch["qa_str"], rng=rng,
                deterministic=False)
            from lctvqa.ops.losses import sequence_teacher_forcing_ce
            return sequence_teacher_forcing_ce(logits, batch["qa_str"]), \
                logits

        (loss, logits), grads = jax.value_and_grad(
            loss_with_aux, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        qa_pred = jnp.argmax(logits, axis=2)
        return params, opt_state, loss, qa_pred

    @jax.jit
    def eval_step(params, arch, batch, rng):
        img = _img(batch)
        logits = unified_model.unified_forward(
            params, arch, mcfg, img, batch["qa_str"], deterministic=True)
        from lctvqa.ops.losses import sequence_teacher_forcing_ce
        loss = sequence_teacher_forcing_ce(logits, batch["qa_str"])
        qa_pred = jnp.argmax(logits, axis=2)
        qa_gen = unified_model.unified_generate(params, arch, mcfg, img,
                                                rng=rng)
        return loss, qa_pred, qa_gen

    return {"arch": arch_step, "train": train_step, "eval": eval_step,
            "tx": tx, "arch_tx": arch_tx}


_DEVICE_KEYS = ("image_u8", "question", "answer_label",
                "answer_multi_choice", "qa_str")


def _dev_batch(batch: dict) -> dict:
    """Drop host-only fields (image_name, ...) before crossing into jit."""
    return {k: v for k, v in batch.items() if k in _DEVICE_KEYS}


class DartsExperiment:
    """2-stage loop over the npy (v1) dataset."""

    unified = False

    def __init__(self, cfg: Config, qst_only: bool = False,
                 use_mesh: bool = True):
        self.cfg = cfg
        from lctvqa import compile_cache
        compile_cache.enable()
        self.qst_only = qst_only
        self.exp_dir = os.path.join(cfg.root_stats_dir, cfg.exp_name)
        # non-empty-dir guard unless resuming (darts_vqa/experiment.py:91-99;
        # we raise instead of dropping into pdb)
        if os.path.exists(self.exp_dir) and not cfg.resume:
            if len(os.listdir(self.exp_dir)) > 1:
                raise RuntimeError(
                    f"exp dir {self.exp_dir} not empty; delete it or "
                    f"pass resume=True")
        os.makedirs(self.exp_dir, exist_ok=True)
        self._setup_logger()
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.np_rng = np.random.default_rng(cfg.train.seed)

        self.data = pipeline_npy.get_npy_loader(
            cfg.data.input_dir, max_qst_length=cfg.model.max_qst_len,
            img_size=cfg.model.img_size, unified=self.unified)
        self.qst_vocab = self.data["train"].qst_vocab
        self.ans_vocab = self.data["train"].ans_vocab
        self.vqa_struct = VqaStruct(cfg.data.input_dir, "valid.npy")

        # DP mesh (new capability vs the single-device reference, same
        # layer the LCT family uses): batch sharded over `data`, params +
        # arch replicated — the jitted steps' global-mean losses make XLA
        # all-reduce weight AND alpha gradients (round-2 verdict #7)
        self.mesh = (mesh_lib.make_mesh(cfg.mesh.num_devices)
                     if use_mesh else None)
        self.batch_sharding = (mesh_lib.batch_sharding(self.mesh)
                               if self.mesh else None)
        if self.mesh is not None and self.mesh.devices.size > 1:
            # Pallas kernels are single-chip-only (pjit cannot
            # auto-partition Mosaic calls; see Experiment.__init__)
            cfg = dataclasses.replace(cfg, model=dataclasses.replace(
                cfg.model, pallas_mixed_op=False, use_pallas_lstm=False,
                pallas_generate=False, pallas_seq_lstm=False))
            self.cfg = cfg

        key = self._next_rng()
        self._init_model(key)
        self.current_epoch = 0
        self.epochs = cfg.train.num_epochs
        self.arch_update_freq = cfg.train.arch_update_freq
        self.train_loss, self.train_acc = [], []
        self.val_loss, self.val_acc, self.val_b4 = [], [], []
        if cfg.resume:
            # continue from the saved epoch (darts_vqa/experiment.py:100-103)
            self.load_model()
            self.load_stats()
        self._replicate()

    def _replicate(self):
        """Pin replicated shardings so the first jitted call's output
        shardings match the inputs (avoids one recompile per step fn)."""
        if self.mesh is None:
            return
        rep = mesh_lib.replicated(self.mesh)
        put = lambda t: jax.device_put(t, rep)  # noqa: E731
        self.params, self.opt = put(self.params), put(self.opt)
        if self.arch is not None:
            self.arch = put(self.arch)
            self.arch_opt = put(self.arch_opt)

    def _batches(self, split: str, shuffle: bool = True):
        """Prefetched, device-put (mesh-sharded) batches off a background
        thread — the same fast input path the LCT family uses."""
        from lctvqa.data import pipeline
        it = self.data[split].batches(self.cfg.train.batch_size,
                                      self.np_rng, shuffle=shuffle)
        return pipeline.Prefetcher(it, sharding=self.batch_sharding,
                                   depth=self.cfg.data.prefetch,
                                   device_keys=_DEVICE_KEYS)

    def _shard(self, batch: dict) -> dict:
        return mesh_lib.shard_batch(batch, self.mesh)

    def _init_model(self, key):
        self.params, self.arch = vqa_ef.init_ef_model(key, self.cfg.model)
        self.steps = make_darts_steps(self.cfg, self.ans_vocab.unk2idx,
                                      self.qst_only)
        self.opt = self.steps["tx"].init(self.params)
        self.arch_opt = (self.steps["arch_tx"].init(self.arch)
                         if self.arch is not None else None)

    def _setup_logger(self):
        fmt = "%(asctime)s %(message)s"
        logging.basicConfig(stream=sys.stdout, level=logging.INFO,
                            format=fmt, force=True)
        fh = logging.FileHandler(os.path.join(self.exp_dir, "log.txt"))
        fh.setFormatter(logging.Formatter(fmt))
        logging.getLogger().addHandler(fh)

    def log(self, msg):
        logging.info(msg)

    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def _epoch_lr(self):
        t = self.cfg.train
        return step_lr(t.learning_rate, self.current_epoch, t.step_size,
                       t.lr_decay)

    def run(self):
        for epoch in range(self.current_epoch, self.epochs):
            self.current_epoch = epoch
            if self.arch is not None:
                self.log(f"genotype: "
                         f"{search.genotype(self.arch, self.cfg.model.darts_steps, self.cfg.model.darts_multiplier)}")
            self.train_epoch()
            self.val()
            self.save_model()
            self.save_stats()  # per epoch, like darts_vqa/experiment.py:126

    def train_epoch(self):
        t = self.cfg.train
        lr = self._epoch_lr()
        set_learning_rate(self.opt, lr)
        total_loss, nb = 0.0, 0
        valid_iter = cycle(self.data["valid"].batches(t.batch_size,
                                                      self.np_rng))
        for batch_idx, batch in enumerate(self._batches("train")):
            if self.arch is not None and \
                    batch_idx % self.arch_update_freq == 0:
                val_batch = self._shard(_dev_batch(next(valid_iter)))
                self.arch, self.arch_opt, v = self.steps["arch"](
                    self.arch, self.arch_opt, self.params,
                    _dev_batch(batch), val_batch,
                    jnp.float32(lr), self._next_rng())
                self.log(f"| ARCH STEP | val-loss {float(v):.4f}")
            self.params, self.opt, loss = self.steps["train"](
                self.params, self.opt, self.arch, _dev_batch(batch),
                self._next_rng())
            total_loss += float(loss)
            nb += 1
            if batch_idx % t.report_freq == 0:
                self.log(f"| TRAIN | epoch {self.current_epoch + 1} "
                         f"step {batch_idx} loss {float(loss):.4f}")
        self.train_loss.append(total_loss / max(nb, 1))

    def val(self):
        from concurrent.futures import ThreadPoolExecutor

        t = self.cfg.train
        total_loss = total_corr = 0.0
        nb, n = 0, 0
        # host-side nltk BLEU runs off the device dispatch path, like the
        # LCT val (SURVEY.md §7 hard-part 7)
        bleu_pool = ThreadPoolExecutor(max_workers=1)
        bleu_futures = []
        for batch in self._batches("valid", shuffle=False):
            loss, corr, gen_qst = self.steps["eval"](
                self.params, self.arch, _dev_batch(batch),
                self._next_rng())
            total_loss += float(loss)
            total_corr += int(corr)
            bleu_futures.append(bleu_pool.submit(
                lambda nm, gq: calc_bleu_scores(
                    nm, np.asarray(gq), self.qst_vocab, self.vqa_struct),
                batch["image_name"], gen_qst))
            nb += 1
            n += len(batch["image_u8"])
        total_b4 = sum(f.result() for f in bleu_futures)
        bleu_pool.shutdown()
        self.val_loss.append(total_loss / max(nb, 1))
        self.val_acc.append(total_corr / max(n, 1))
        self.val_b4.append(total_b4 / max(nb, 1))
        self.log(f"| VAL | loss {self.val_loss[-1]:.4f} "
                 f"acc {self.val_acc[-1]:.4f} b4 {self.val_b4[-1]:.4f}")

    def save_model(self):
        checkpoint.save_state(
            os.path.join(self.exp_dir, "vqa_model.ckpt"),
            {"params": self.params, "opt": self.opt,
             "epoch": self.current_epoch + 1},
            config=self.cfg)
        if self.arch is not None:
            # arch params saved separately (darts_vqa/experiment.py:300-301)
            checkpoint.save_state(
                os.path.join(self.exp_dir, "arch_par.ckpt"),
                {"arch": self.arch, "arch_opt": self.arch_opt},
                config=self.cfg)

    def load_model(self):
        st = checkpoint.load_state(
            os.path.join(self.exp_dir, "vqa_model.ckpt"))
        self.params, self.opt = st["params"], st["opt"]
        self.current_epoch = st["epoch"]
        ap = os.path.join(self.exp_dir, "arch_par.ckpt")
        if checkpoint.exists(ap):
            st = checkpoint.load_state(ap)
            self.arch, self.arch_opt = st["arch"], st["arch_opt"]

    def save_stats(self):
        # one consolidated stats artifact (darts_vqa stats.pt equivalent)
        checkpoint.save_state(
            os.path.join(self.exp_dir, "stats.ckpt"),
            {"train_loss": self.train_loss, "train_acc": self.train_acc,
             "val_loss": self.val_loss, "val_acc": self.val_acc,
             "val_b4": self.val_b4},
            config=self.cfg)

    def load_stats(self):
        path = os.path.join(self.exp_dir, "stats.ckpt")
        if not checkpoint.exists(path):
            return
        st = checkpoint.load_state(path)
        self.train_loss = st["train_loss"]
        self.train_acc = st["train_acc"]
        self.val_loss = st["val_loss"]
        self.val_acc = st["val_acc"]
        self.val_b4 = st["val_b4"]


class DartsExperimentUnified(DartsExperiment):
    """Unified token-stream variant (darts_vqa/exp_unified.py)."""

    unified = True

    def _init_model(self, key):
        # model vocab = unified vocab
        import dataclasses
        uv = self.data["train"].unified_vocab
        self.cfg = self.cfg.replace(model=dataclasses.replace(
            self.cfg.model, qst_vocab_size=uv.vocab_size))
        self.unified_vocab = uv
        self.params, self.arch = unified_model.init_unified_model(
            key, self.cfg.model)
        self.steps = make_unified_steps(self.cfg)
        self.opt = self.steps["tx"].init(self.params)
        self.arch_opt = (self.steps["arch_tx"].init(self.arch)
                         if self.arch is not None else None)

    def train_epoch(self):
        t = self.cfg.train
        lr = self._epoch_lr()
        set_learning_rate(self.opt, lr)
        total_loss = total_acc = 0.0
        nb = 0
        valid_iter = cycle(self.data["valid"].batches(t.batch_size,
                                                      self.np_rng))
        for batch_idx, batch in enumerate(self._batches("train")):
            if self.arch is not None and \
                    batch_idx % self.arch_update_freq == 0:
                val_batch = self._shard(_dev_batch(next(valid_iter)))
                self.arch, self.arch_opt, v = self.steps["arch"](
                    self.arch, self.arch_opt, self.params,
                    _dev_batch(batch), val_batch,
                    jnp.float32(lr), self._next_rng())
                self.log(f"| ARCH STEP | val-loss {float(v):.4f}")
            self.params, self.opt, loss, qa_pred = self.steps["train"](
                self.params, self.opt, self.arch, _dev_batch(batch),
                self._next_rng())
            total_loss += float(loss)
            total_acc += unified_ans_acc(np.asarray(batch["qa_str"]),
                                         np.asarray(qa_pred),
                                         self.unified_vocab)
            nb += 1
            if batch_idx % t.report_freq == 0:
                self.log(f"| TRAIN | epoch {self.current_epoch + 1} "
                         f"step {batch_idx} loss {float(loss):.4f}")
        self.train_loss.append(total_loss / max(nb, 1))
        self.train_acc.append(total_acc / max(nb, 1))

    def val(self):
        from concurrent.futures import ThreadPoolExecutor

        t = self.cfg.train
        total_loss = total_acc = 0.0
        nb = 0
        bleu_pool = ThreadPoolExecutor(max_workers=1)
        bleu_futures = []
        for batch in self._batches("valid", shuffle=False):
            loss, qa_pred, qa_gen = self.steps["eval"](
                self.params, self.arch, _dev_batch(batch),
                self._next_rng())
            total_loss += float(loss)
            total_acc += unified_ans_acc(np.asarray(batch["qa_str"]),
                                         np.asarray(qa_pred),
                                         self.unified_vocab)
            bleu_futures.append(bleu_pool.submit(
                lambda nm, gq: calc_bleu_scores_unified(
                    nm, np.asarray(gq), self.unified_vocab,
                    self.vqa_struct),
                batch["image_name"], qa_gen))
            nb += 1
        total_b4 = sum(f.result() for f in bleu_futures)
        bleu_pool.shutdown()
        self.val_loss.append(total_loss / max(nb, 1))
        self.val_acc.append(total_acc / max(nb, 1))
        self.val_b4.append(total_b4 / max(nb, 1))
        self.log(f"| VAL | loss {self.val_loss[-1]:.4f} "
                 f"ans-acc {self.val_acc[-1]:.4f} "
                 f"b4 {self.val_b4[-1]:.4f}")
