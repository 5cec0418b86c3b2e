"""LCT Experiment: the 3-stage training driver
(reference `basic_vqa/experiment.py`).

Epoch loop: [STAGE 3 every arch_update_freq steps: architecture update via
the tri-level architect] -> STAGE 1: EF weight update -> STAGE 2: W update
on real + EF-generated pseudo QA; then validation (loss, multi-choice
accuracy with/without <unk>, BLEU4 of generated questions), StepLR decay,
checkpoints, stats JSONs and plots.

Differences from the reference, by design:
- all three stages are jitted XLA programs over a DP-sharded batch;
- `arch_update_freq` decays per epoch exactly as the reference
  (2000 * 0.5^epoch, min 100, experiment.py:125-131);
- resume reloads BOTH models (the reference's W reload is commented out,
  experiment.py:425-429 — we consider that a bug and fix it);
- the non-empty experiment dir guard errors out instead of dropping into
  pdb (experiment.py:101-111).
"""

from __future__ import annotations

import logging
import os
import sys
from itertools import cycle

import jax
import jax.numpy as jnp
import numpy as np

from lctvqa.config import Config
from lctvqa.data import pipeline
from lctvqa.models import search, vqa_ef, vqa_w
from lctvqa.optim.optimizers import set_learning_rate, step_lr
from lctvqa.parallel import mesh as mesh_lib
from lctvqa.train import checkpoint, stats
from lctvqa.train.metrics import VqaStruct, calc_bleu_scores
from lctvqa.train.steps import make_lct_steps, make_packed_lct_steps
from lctvqa.train.timing import StageTimer, trace

_DEVICE_KEYS = ("image_u8", "question", "answer_label",
                "answer_multi_choice")


def _dev_batch(batch: dict) -> dict:
    """Device-bound view of a batch: drop host-only fields (image_name
    strings from the npy loader, index, qst_len) before crossing into jit."""
    return {k: v for k, v in batch.items() if k in _DEVICE_KEYS}


class Experiment:
    def __init__(self, cfg: Config, use_mesh: bool = True,
                 vgg_params=None):
        self.cfg = cfg
        from lctvqa import compile_cache
        compile_cache.enable()
        self.name = cfg.exp_name
        self.exp_dir = os.path.join(cfg.root_stats_dir, self.name)

        seed = cfg.train.seed
        self.rng = jax.random.PRNGKey(seed)
        np.random.seed(seed)
        self.np_rng = np.random.default_rng(seed)

        # data: v2 (hdf5, default) or v1 (npy records) — the reference's
        # --use_old_dataloader switch (basic_vqa/data_factory.py:5-23)
        if cfg.data.use_old_dataloader:
            from lctvqa.data import pipeline_npy
            self.data = pipeline_npy.get_npy_loader(
                cfg.data.input_dir, max_qst_length=cfg.model.max_qst_len,
                max_num_ans=cfg.data.max_num_ans,
                img_size=cfg.model.img_size,
                train_portion=cfg.train.train_portion)
        else:
            self.data = pipeline.get_loader(cfg.data.input_dir,
                                            cfg.train.batch_size,
                                            cfg.train.train_portion,
                                            preload=cfg.data.preload_images)
        self.qst_vocab = self.data["train"].qst_vocab
        self.ans_vocab = self.data["train"].ans_vocab
        self.vqa_struct = VqaStruct(cfg.data.input_dir,
                                    data_file="valid.npy")

        # mesh (DP): local-device mesh, or a global mesh over every
        # process's devices in multi-host mode
        if cfg.mesh.multihost:
            from lctvqa.parallel import distributed
            self.mesh = distributed.global_mesh(cfg.mesh.data_axis)
        else:
            self.mesh = (mesh_lib.make_mesh(cfg.mesh.num_devices)
                         if use_mesh else None)
        self.batch_sharding = (mesh_lib.batch_sharding(self.mesh)
                               if self.mesh else None)
        if self.mesh is not None and self.mesh.devices.size > 1:
            # Pallas kernels are single-chip accelerations here: the
            # mixed-op kernel computes per-shard BN statistics (breaks the
            # global-batch sync-BN semantics tests/test_mesh.py pins), and
            # pjit cannot auto-partition Mosaic custom calls over a
            # sharded batch (per-shard shard_map wiring is the future
            # path). Off-TPU the LSTM kernels silently fall back to jnp,
            # which would HIDE the partitioning hazard in the CPU mesh
            # tests — force them off explicitly instead.
            import dataclasses as _dc
            cfg = _dc.replace(cfg, model=_dc.replace(
                cfg.model, pallas_mixed_op=False, use_pallas_lstm=False,
                pallas_generate=False, pallas_seq_lstm=False))
            self.cfg = cfg
        if (cfg.train.architect_mode == "exact-indirect"
                and not cfg.train.stage3_remat
                and not cfg.train.skip_stage3):
            # at reference dims the non-remat exact-indirect tri-level
            # program exceeds v5e HBM (16.04G/15.75G, 30% layout
            # utilization — scripts/bench_stage3.py); remat is its only
            # runnable configuration and costs nothing the OOM wouldn't
            import dataclasses as _dc
            cfg = _dc.replace(cfg, train=_dc.replace(
                cfg.train, stage3_remat=True))
            self.cfg = cfg

        # models + optimizers
        k_ef, k_w, self.rng = jax.random.split(self.rng, 3)
        self.ef_params, self.arch = vqa_ef.init_ef_model(
            k_ef, cfg.model, vgg_params=vgg_params)
        self.w_params = vqa_w.init_w_model(k_w, cfg.model,
                                           vgg_params=vgg_params)
        self.steps = make_lct_steps(cfg, self.ans_vocab.unk2idx)
        self.ef_opt = self.steps["ef_tx"].init(self.ef_params)
        self.w_opt = self.steps["w_tx"].init(self.w_params)
        self.arch_opt = (self.steps["arch_tx"].init(self.arch)
                         if self.arch is not None else None)
        self.packed = (make_packed_lct_steps(
            self.steps, self.ef_params, self.ef_opt, self.w_params,
            self.w_opt, cfg.model.bn_eval_stats)
            if cfg.train.packed_dispatch else None)
        if self.mesh is not None:
            # pin replicated shardings NOW: jit outputs carry mesh shardings,
            # so unsharded inputs on the first call would force one
            # recompile per step function on the second call
            rep = mesh_lib.replicated(self.mesh)
            put = lambda t: jax.device_put(t, rep)
            self.ef_params = put(self.ef_params)
            self.w_params = put(self.w_params)
            self.ef_opt = put(self.ef_opt)
            self.w_opt = put(self.w_opt)
            if self.arch is not None:
                self.arch = put(self.arch)
                self.arch_opt = put(self.arch_opt)

        self.epochs = cfg.train.num_epochs
        self.current_epoch = 0
        self.arch_update_freq = cfg.train.arch_update_freq
        self.train_ef_loss, self.train_ef_acc = [], []
        self.val_ef_loss, self.val_ef_acc = [], []
        self.train_w_loss, self.train_w_acc = [], []

        self.timer = StageTimer()
        self.profile_dir = None  # set to a path to capture a jax profile
        # BN running stats for eval-mode validation (model.bn_eval_stats)
        self.bn_running = None

        self._load_experiment()
        self.log(f"seed: {seed}")
        self.log(f"config: {cfg}")
        if self.mesh:
            self.log(f"mesh: {self.mesh.shape}")

    # ------------------------------------------------------------------
    def log(self, msg: str):
        logging.info(msg)

    def _setup_logger(self):
        fmt = "%(asctime)s %(message)s"
        logging.basicConfig(stream=sys.stdout, level=logging.INFO,
                            format=fmt, datefmt="%m/%d %I:%M:%S %p",
                            force=True)
        fh = logging.FileHandler(os.path.join(self.exp_dir, "log.txt"))
        fh.setFormatter(logging.Formatter(fmt))
        logging.getLogger().addHandler(fh)
        self.log(f"Exp Name: {self.name}")

    def _load_experiment(self):
        os.makedirs(self.cfg.root_stats_dir, exist_ok=True)
        if os.path.exists(self.exp_dir):
            if not self.cfg.resume:
                files = os.listdir(self.exp_dir)
                if len(files) > 1:
                    raise RuntimeError(
                        f"exp dir {self.exp_dir} not empty; delete it or "
                        f"pass resume=True")
            else:
                self.load_model()
                self._read_stats()
        else:
            os.makedirs(self.exp_dir)
        self._setup_logger()

    # ------------------------------------------------------------------
    def set_arch_update_freq(self):
        t = self.cfg.train
        freq = int(t.arch_update_freq *
                   (t.arch_freq_decay ** self.current_epoch))
        self.arch_update_freq = max(freq, t.arch_update_freq_min)
        self.log(f"architecture update freq: {self.arch_update_freq}")

    def _epoch_lr(self) -> float:
        t = self.cfg.train
        return step_lr(t.learning_rate, self.current_epoch, t.step_size,
                       t.lr_decay)

    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def _epoch_iter(self, split: str, shuffle=True):
        if self.cfg.data.use_old_dataloader:
            return self.data[split].batches(self.cfg.train.batch_size,
                                            self.np_rng, shuffle=shuffle)
        pi, pc = 0, 1
        if self.cfg.mesh.multihost:
            pi, pc = jax.process_index(), jax.process_count()
        return pipeline.epoch_batches(self.data[split],
                                      self.cfg.train.batch_size,
                                      self.np_rng, shuffle=shuffle,
                                      max_num_ans=self.cfg.data.max_num_ans,
                                      num_workers=self.cfg.data.num_workers,
                                      process_index=pi, process_count=pc)

    def _batches(self, split: str, shuffle=True):
        return pipeline.Prefetcher(
            self._epoch_iter(split, shuffle),
            sharding=self.batch_sharding,
            depth=self.cfg.data.prefetch,
            device_keys=("image_u8", "question", "answer_label",
                         "answer_multi_choice"),
            global_mesh=self.mesh if self.cfg.mesh.multihost else None)

    def _put_batch(self, batch: dict) -> dict:
        """Device placement for a batch fed outside the Prefetcher."""
        if self.cfg.mesh.multihost:
            from lctvqa.parallel import distributed
            return distributed.make_global_batch(batch, self.mesh)
        return mesh_lib.shard_batch(batch, self.mesh)

    def _host_rows(self, arr) -> np.ndarray:
        """Rows of a (possibly global) batch-axis array owned by THIS host,
        in batch order — the rows this process fed, for host-side metrics
        (BLEU, logging). Single-host: the whole array."""
        if not self.cfg.mesh.multihost:
            return np.asarray(arr)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards])

    # ------------------------------------------------------------------
    def run(self):
        for epoch in range(self.current_epoch, self.epochs):
            self.log(f"Starting Epoch: {epoch + 1}")
            if self.arch is not None:
                self.log(f"genotype: {self.genotype()}")
            self.current_epoch = epoch
            self.set_arch_update_freq()
            with trace(self.profile_dir):
                self.train_epoch()
            self.val()
            self.save_model()
            self._record_stats()
        self.val()

    def genotype(self):
        return search.genotype(self.arch, self.cfg.model.darts_steps,
                               self.cfg.model.darts_multiplier)

    # ------------------------------------------------------------------
    def train_epoch(self):
        t = self.cfg.train
        dataset = self.data["train"]
        n = (len(dataset) // t.batch_size) * t.batch_size
        batch_step_size = max(len(dataset) // t.batch_size, 1)
        lr = self._epoch_lr()
        set_learning_rate(self.ef_opt, lr)
        set_learning_rate(self.w_opt, lr)
        # quirk parity: the reference reads w_lr from the EF scheduler
        # (experiment.py:189) — same value either way here.
        ef_lr = w_lr = lr

        # loss/metric scalars stay ON DEVICE during the epoch; host readback
        # happens only at report steps and once at epoch end (each readback
        # is a full RPC roundtrip on tunneled TPU setups)
        ef_losses, w_losses = [], []
        ef_c1s, ef_c2s, w_corrs = [], [], []
        valid_iter = cycle(self._epoch_iter("valid"))
        do_stage3 = (self.arch is not None and not t.skip_stage3)
        last_batch = None

        # packed-dispatch fast path: params/opt state travel as a few 1D
        # buffers for the whole epoch (one jitted pack/unpack at the
        # boundaries; see ops/packing.py)
        pk = self.packed
        if pk is not None:
            ef_st, efo_st, w_st, wo_st = pk["pack_state"](
                self.ef_params, self.ef_opt, self.w_params, self.w_opt)

        for batch_idx, batch in enumerate(self._batches("train")):
            last_batch = batch
            if do_stage3 and batch_idx % self.arch_update_freq == 0:
                with self.timer.stage("stage3"):
                    val_batch = self._put_batch(
                        _dev_batch(next(valid_iter)))
                    s3_args = (self.arch, self.arch_opt)
                    if pk is not None:
                        self.arch, self.arch_opt, s3_loss = pk["stage3"](
                            *s3_args, ef_st, w_st, _dev_batch(batch),
                            val_batch, jnp.float32(ef_lr),
                            jnp.float32(w_lr), self._next_rng())
                    else:
                        self.arch, self.arch_opt, s3_loss = self.steps[
                            "stage3"](*s3_args, self.ef_params,
                                      self.w_params, _dev_batch(batch),
                                      val_batch, jnp.float32(ef_lr),
                                      jnp.float32(w_lr), self._next_rng())
                    s3_loss = float(s3_loss)
                self.log(f"| TRAIN SET | STAGE3 | W'-Val-Loss: "
                         f"{s3_loss:.4f}")

            with self.timer.stage("stage1"):
                if pk is not None:
                    out = pk["stage1"](ef_st, self.arch, efo_st,
                                       _dev_batch(batch), self._next_rng())
                    if self.cfg.model.bn_eval_stats:
                        ef_st, efo_st, loss, c1, c2, bn_stats = out
                    else:
                        ef_st, efo_st, loss, c1, c2 = out
                else:
                    out = self.steps["stage1"](
                        self.ef_params, self.arch, self.ef_opt,
                        _dev_batch(batch), self._next_rng())
                    if self.cfg.model.bn_eval_stats:
                        (self.ef_params, self.ef_opt, loss, c1, c2,
                         bn_stats) = out
                    else:
                        self.ef_params, self.ef_opt, loss, c1, c2 = out
                if self.cfg.model.bn_eval_stats:
                    self.bn_running = self.steps["bn_update"](
                        self.bn_running, bn_stats)
            ef_losses.append(loss)
            ef_c1s.append(c1)
            ef_c2s.append(c2)
            if batch_idx % t.report_freq == 0:
                self.log(
                    f"| TRAIN SET | STAGE1 | Epoch "
                    f"[{self.current_epoch + 1:02d}/{self.epochs:02d}], "
                    f"Step [{batch_idx:04d}/{batch_step_size:04d}], "
                    f"EF-Loss: {float(loss):.4f}")

            if not t.skip_stage2:
                with self.timer.stage("stage2"):
                    if pk is not None:
                        w_st, wo_st, loss2, wc = pk["stage2"](
                            w_st, wo_st, ef_st, self.arch,
                            _dev_batch(batch), self._next_rng())
                    else:
                        self.w_params, self.w_opt, loss2, wc = self.steps[
                            "stage2"](self.w_params, self.w_opt,
                                      self.ef_params, self.arch,
                                      _dev_batch(batch), self._next_rng())
                w_losses.append(loss2)
                w_corrs.append(wc)
                if batch_idx % t.report_freq == 0:
                    self.log(
                        f"| TRAIN SET | STAGE2 | Epoch "
                        f"[{self.current_epoch + 1:02d}/{self.epochs:02d}],"
                        f" Step [{batch_idx:04d}/{batch_step_size:04d}], "
                        f"W-Loss: {float(loss2):.4f}")

        if pk is not None:
            (self.ef_params, self.ef_opt, self.w_params,
             self.w_opt) = pk["unpack_state"](ef_st, efo_st, w_st, wo_st)

        ef_loss = float(jnp.sum(jnp.stack(ef_losses)))
        ef_corr1 = int(jnp.sum(jnp.stack(ef_c1s)))
        ef_corr2 = int(jnp.sum(jnp.stack(ef_c2s)))
        w_loss = (float(jnp.sum(jnp.stack(w_losses))) if w_losses else 0.0)
        w_corr = (int(jnp.sum(jnp.stack(w_corrs))) if w_corrs else 0)
        self.train_ef_loss.append(ef_loss / batch_step_size)
        self.train_ef_acc.append(ef_corr2 / n)
        self.train_w_loss.append(w_loss / batch_step_size)
        # denominator 2N: W is scored on real AND pseudo QA
        # (experiment.py:276)
        self.train_w_acc.append(w_corr / (2 * n))
        self.log(
            f"| TRAIN SET | Epoch [{self.current_epoch + 1:02d}/"
            f"{self.epochs:02d}], EF-Loss: {self.train_ef_loss[-1]:.4f} "
            f"EF-Acc(Exp1): {ef_corr1 / n:.4f}, "
            f"EF-Acc(Exp2): {self.train_ef_acc[-1]:.4f}, "
            f"W-Loss: {self.train_w_loss[-1]:.4f}, "
            f"W-Acc: {self.train_w_acc[-1]:.4f}")
        self.log(f"| TIMING | {self.timer.summary()}")
        self.timer.reset()
        if last_batch is not None:
            self.evaluate_gen_qst(last_batch)

    def _eval_step(self, batch):
        if self.cfg.model.bn_eval_stats:
            return self.steps["eval"](self.ef_params, self.arch,
                                      _dev_batch(batch), self._next_rng(),
                                      self.bn_running)
        return self.steps["eval"](self.ef_params, self.arch,
                                  _dev_batch(batch), self._next_rng())

    def evaluate_gen_qst(self, batch):
        """Log ground-truth vs generated QA pairs (experiment.py:149-172)."""
        _, _, _, gen_qst, gen_ans = self._eval_step(batch)
        gen_qst = self._host_rows(gen_qst)
        gen_pred = self._host_rows(jnp.argmax(gen_ans, 1))
        qsts = self._host_rows(batch["question"])
        labels = self._host_rows(batch["answer_label"])
        n = min(4, len(gen_qst))
        self.log("Evaluating question answer pairs")
        for i in range(n):
            self.log(f"ground truth qst: {self.qst_vocab.arr2qst(qsts[i])} "
                     f"ans: {self.ans_vocab.idx2word(int(labels[i]))}")
            self.log(f"generated qst: {self.qst_vocab.arr2qst(gen_qst[i])} "
                     f"ans: {self.ans_vocab.idx2word(int(gen_pred[i]))}")

    # ------------------------------------------------------------------
    def val(self):
        from concurrent.futures import ThreadPoolExecutor

        t = self.cfg.train
        dataset = self.data["valid"]
        n = (len(dataset) // t.batch_size) * t.batch_size
        batch_step_size = max(len(dataset) // t.batch_size, 1)
        running_loss = 0.0
        corr1 = corr2 = 0
        # BLEU (nltk, host-side) runs on a worker thread so it stays off
        # the device dispatch path (SURVEY.md §7 hard-part 7)
        bleu_pool = ThreadPoolExecutor(max_workers=1)
        bleu_futures = []
        for batch_idx, batch in enumerate(self._batches("valid",
                                                        shuffle=False)):
            loss, c1, c2, gen_qst, _ = self._eval_step(batch)
            running_loss += float(loss)
            corr1 += int(c1)
            corr2 += int(c2)
            # index stays host-local; gen_qst may be a global array — take
            # this host's rows (all rows when single-host)
            names = dataset.image_names(np.asarray(batch["index"]))
            bleu_futures.append(bleu_pool.submit(
                lambda nm, gq: calc_bleu_scores(
                    nm, gq, self.qst_vocab, self.vqa_struct),
                names, self._host_rows(gen_qst)))
            if batch_idx % 100 == 0:
                self.log(
                    f"| VALID SET | Epoch [{self.current_epoch + 1:02d}/"
                    f"{self.epochs:02d}], Step [{batch_idx:04d}/"
                    f"{batch_step_size:04d}], Loss: {float(loss):.4f}")
        total_b4 = sum(f.result() for f in bleu_futures)
        bleu_pool.shutdown()
        self.val_ef_loss.append(running_loss / batch_step_size)
        self.val_ef_acc.append(corr2 / max(n, 1))
        self.log(
            f"| VALID SET | Epoch [{self.current_epoch + 1:02d}/"
            f"{self.epochs:02d}], Loss: {self.val_ef_loss[-1]:.4f} "
            f"Acc(Exp1): {corr1 / max(n, 1):.4f}, "
            f"Acc(Exp2): {self.val_ef_acc[-1]:.4f} "
            f"BLEU4: {total_b4 / batch_step_size:.4f}")

    # ------------------------------------------------------------------
    def save_model(self):
        checkpoint.save_state(
            os.path.join(self.exp_dir, "ef_model.ckpt"),
            {"ef_params": self.ef_params, "ef_opt": self.ef_opt,
             "arch": self.arch, "arch_opt": self.arch_opt,
             "epoch": self.current_epoch + 1},
            config=self.cfg)
        checkpoint.save_state(
            os.path.join(self.exp_dir, "w_model.ckpt"),
            {"w_params": self.w_params, "w_opt": self.w_opt,
             "epoch": self.current_epoch + 1},
            config=self.cfg)

    def load_model(self):
        state = checkpoint.load_state(
            os.path.join(self.exp_dir, "ef_model.ckpt"))
        self.ef_params = state["ef_params"]
        self.ef_opt = state["ef_opt"]
        self.arch = state["arch"]
        self.arch_opt = state["arch_opt"]
        self.current_epoch = state["epoch"]
        w_path = os.path.join(self.exp_dir, "w_model.ckpt")
        if checkpoint.exists(w_path):
            w_state = checkpoint.load_state(w_path)
            self.w_params = w_state["w_params"]
            self.w_opt = w_state["w_opt"]

    def _read_stats(self):
        self.train_ef_loss = stats.read_file_in_dir(self.exp_dir,
                                                    "train_ef_loss.txt")
        self.train_ef_acc = stats.read_file_in_dir(self.exp_dir,
                                                   "train_ef_acc.txt")
        self.val_ef_loss = stats.read_file_in_dir(self.exp_dir,
                                                  "val_ef_loss.txt")
        self.val_ef_acc = stats.read_file_in_dir(self.exp_dir,
                                                 "val_ef_acc.txt")
        self.train_w_loss = stats.read_file_in_dir(self.exp_dir,
                                                   "train_w_loss.txt")
        self.train_w_acc = stats.read_file_in_dir(self.exp_dir,
                                                  "train_w_acc.txt")

    def _record_stats(self):
        stats.write_to_file_in_dir(self.exp_dir, "train_ef_loss.txt",
                                   self.train_ef_loss)
        stats.write_to_file_in_dir(self.exp_dir, "train_ef_acc.txt",
                                   self.train_ef_acc)
        stats.write_to_file_in_dir(self.exp_dir, "val_ef_loss.txt",
                                   self.val_ef_loss)
        stats.write_to_file_in_dir(self.exp_dir, "val_ef_acc.txt",
                                   self.val_ef_acc)
        stats.write_to_file_in_dir(self.exp_dir, "train_w_loss.txt",
                                   self.train_w_loss)
        stats.write_to_file_in_dir(self.exp_dir, "train_w_acc.txt",
                                   self.train_w_acc)
        self._plot_stats()

    def _plot_stats(self):
        stats.plot_loss_acc(self.train_ef_loss, self.train_ef_acc,
                            "EF Training",
                            os.path.join(self.exp_dir,
                                         "ef_train_loss_acc.png"))
        stats.plot_loss_acc(self.val_ef_loss, self.val_ef_acc,
                            "EF Validation",
                            os.path.join(self.exp_dir,
                                         "ef_val_loss_acc.png"))
        stats.plot_loss_acc(self.train_w_loss, self.train_w_acc,
                            "W Training",
                            os.path.join(self.exp_dir,
                                         "w_train_loss_acc.png"))
