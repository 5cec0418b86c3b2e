"""Jitted train/eval steps for the 3-stage LCT loop
(reference `basic_vqa/experiment.py:175-353`).

Each stage is ONE compiled XLA program over a (possibly mesh-sharded)
batch: normalization of the uint8 images fuses into the first conv, losses
are global-batch means (=> DP gradient all-reduce inserted by XLA), and the
metric counters stay on device — only scalar counters and generated token
ids cross back to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from lctvqa.config import Config
from lctvqa.data.pipeline import normalize_images
from lctvqa.models import vqa_ef, vqa_w
from lctvqa.ops.losses import cross_entropy, soft_xent
from lctvqa.optim.architect_lct import make_lct_arch_grad
from lctvqa.optim.optimizers import arch_optimizer, model_optimizer
from lctvqa.train.metrics import mask_unk, num_correct


def make_lct_steps(cfg: Config, unk_idx: int):
    """Build the jitted stage1/stage2/stage3/eval step functions plus the
    optimizers. Returns a dict of callables."""
    mcfg, tcfg = cfg.model, cfg.train
    mean, std = cfg.data.mean, cfg.data.std
    ef_tx = model_optimizer(tcfg)
    w_tx = model_optimizer(tcfg)
    arch_tx = arch_optimizer(tcfg)
    lct_arch_grad = make_lct_arch_grad(mcfg, tcfg)

    def _img(batch):
        return normalize_images(batch["image_u8"], mean, std)

    # ---------------- STAGE 1: EF weight update (experiment.py:214-227)
    @jax.jit
    def stage1(ef_params, arch, ef_opt_state, batch, rng):
        from lctvqa.ops import conv as C
        img = _img(batch)
        qst = batch["question"]
        labels = batch["answer_label"]

        def loss_fn(p):
            if mcfg.bn_eval_stats:
                # capture the EF net's BN batch stats so the experiment can
                # maintain running stats for eval-mode validation
                with C.bn_capture() as cap:
                    ans_logits, qst_logits = vqa_ef.ef_forward(
                        p, arch, mcfg, img, qst, rng=rng,
                        deterministic=False)
                bn_stats = cap.stats
            else:
                ans_logits, qst_logits = vqa_ef.ef_forward(
                    p, arch, mcfg, img, qst, rng=rng, deterministic=False)
                bn_stats = []
            loss = (cross_entropy(ans_logits, labels)
                    + _qst_ce(qst_logits, qst))
            return loss, (ans_logits, bn_stats)

        (loss, (ans_logits, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ef_params)
        updates, ef_opt_state = ef_tx.update(grads, ef_opt_state, ef_params)
        ef_params = optax.apply_updates(ef_params, updates)
        pred = jnp.argmax(ans_logits, axis=1)
        corr1 = num_correct(pred, batch["answer_multi_choice"])
        corr2 = num_correct(mask_unk(pred, unk_idx),
                            batch["answer_multi_choice"])
        if mcfg.bn_eval_stats:
            return ef_params, ef_opt_state, loss, corr1, corr2, bn_stats
        return ef_params, ef_opt_state, loss, corr1, corr2

    @jax.jit
    def bn_update(running, captured):
        from lctvqa.ops import conv as C
        if running is None:
            running = C.init_running_stats(captured)
        return C.update_running_stats(running, captured)

    def _qst_ce(qst_logits, qst):
        v = qst_logits.shape[-1]
        return cross_entropy(qst_logits[:, :-1].reshape(-1, v),
                             qst[:, 1:].reshape(-1))

    # ---------------- STAGE 2: W update on real + pseudo QA (:242-268)
    @jax.jit
    def stage2(w_params, w_opt_state, ef_params, arch, batch, rng):
        r_gen, r_w = jax.random.split(rng)
        img = _img(batch)
        qst = batch["question"]
        labels = batch["answer_label"]
        pseudo_qst, pseudo_logits = vqa_ef.ef_generate(
            ef_params, arch, mcfg, img, rng=r_gen, deterministic=False)
        # stage 2 softens WITHOUT temperature (experiment.py:245), unlike
        # stage 3 which divides by TEMPERATURE (architect_lct.py:55)
        pseudo_ans = jax.nn.softmax(pseudo_logits, axis=-1)
        pseudo_qst = jax.lax.stop_gradient(pseudo_qst)
        pseudo_ans = jax.lax.stop_gradient(pseudo_ans)

        def loss_fn(p):
            r1, r2 = jax.random.split(r_w)
            out1 = vqa_w.w_forward(p, mcfg, img, qst, r1,
                                   deterministic=False)
            out2 = vqa_w.w_forward(p, mcfg, img, pseudo_qst, r2,
                                   deterministic=False)
            loss = (cross_entropy(out1, labels)
                    + tcfg.w_lambda * soft_xent(out2, pseudo_ans))
            return loss, (out1, out2)

        (loss, (out1, out2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(w_params)
        updates, w_opt_state = w_tx.update(grads, w_opt_state, w_params)
        w_params = optax.apply_updates(w_params, updates)
        # W is scored on BOTH real and pseudo QA (experiment.py:258-262)
        corr = (jnp.sum(jnp.argmax(out1, 1) == labels)
                + jnp.sum(jnp.argmax(out2, 1)
                          == jnp.argmax(pseudo_ans, 1)))
        return w_params, w_opt_state, loss, corr

    # ---------------- STAGE 3: architecture step (architect_lct.py:32-44)
    @jax.jit
    def stage3(arch, arch_opt_state, ef_params, w_params, train_batch,
               val_batch, ef_lr, w_lr, rng):
        tb = dict(train_batch, image=_img(train_batch))
        vb = dict(val_batch, image=_img(val_batch))
        g_a, val_loss = lct_arch_grad(arch, ef_params, w_params, tb, vb,
                                      ef_lr, w_lr, rng)
        updates, arch_opt_state = arch_tx.update(g_a, arch_opt_state, arch)
        arch = optax.apply_updates(arch, updates)
        return arch, arch_opt_state, val_loss

    # ---------------- validation (experiment.py:291-353)
    def _eval_body(ef_params, arch, batch, rng, bn_running):
        from lctvqa.ops import conv as C
        import contextlib
        img = _img(batch)
        qst = batch["question"]
        labels = batch["answer_label"]
        # with running stats, each model invocation consumes the full stat
        # list once (reference model.eval() numerics); else batch stats
        ctx = (lambda: C.bn_eval(bn_running)) if bn_running is not None \
            else contextlib.nullcontext
        with ctx():
            ans_logits, _ = vqa_ef.ef_forward(ef_params, arch, mcfg, img,
                                              qst, deterministic=True)
        loss = cross_entropy(ans_logits, labels)
        pred = jnp.argmax(ans_logits, axis=1)
        corr1 = num_correct(pred, batch["answer_multi_choice"])
        corr2 = num_correct(mask_unk(pred, unk_idx),
                            batch["answer_multi_choice"])
        with ctx():
            gen_qst, gen_ans = vqa_ef.ef_generate(ef_params, arch, mcfg,
                                                  img, rng=rng,
                                                  deterministic=True)
        return loss, corr1, corr2, gen_qst, gen_ans

    if mcfg.bn_eval_stats:
        @jax.jit
        def eval_step(ef_params, arch, batch, rng, bn_running):
            return _eval_body(ef_params, arch, batch, rng, bn_running)
    else:
        @jax.jit
        def eval_step(ef_params, arch, batch, rng):
            return _eval_body(ef_params, arch, batch, rng, None)

    return {
        "stage1": stage1,
        "stage2": stage2,
        "stage3": stage3,
        "eval": eval_step,
        "bn_update": bn_update,
        "ef_tx": ef_tx,
        "w_tx": w_tx,
        "arch_tx": arch_tx,
    }


def make_packed_lct_steps(steps: dict, ef_params, ef_opt, w_params, w_opt,
                          bn_eval_stats: bool = False) -> dict:
    """Packed-buffer variants of the three train stages (ops/packing.py).

    The darts-family pytrees are O(1000) leaves; per-call dispatch cost
    grows with the argument-buffer count (NOTES.md: ~20 ms/call through
    the TPU tunnel). These wrappers carry ef/w params+opt state as a few
    packed 1D buffers (donated in place), with unpack/re-pack inside jit
    where they are free layout ops. Same math — the wrapped fns ARE the
    stage fns.
    """
    from lctvqa.ops.packing import Packer, pack_step

    p_ef, p_efo = Packer(ef_params), Packer(ef_opt)
    p_w, p_wo = Packer(w_params), Packer(w_opt)

    def s1(ef_p, arch, ef_o, batch, rng):
        return steps["stage1"](ef_p, arch, ef_o, batch, rng)

    s1_outs = (p_ef, p_efo, None, None, None)
    if bn_eval_stats:
        s1_outs = s1_outs + (None,)
    stage1 = pack_step(s1, (p_ef, None, p_efo, None, None), s1_outs)

    def s2(w_p, w_o, ef_p, arch, batch, rng):
        return steps["stage2"](w_p, w_o, ef_p, arch, batch, rng)

    stage2 = pack_step(s2, (p_w, p_wo, p_ef, None, None, None),
                       (p_w, p_wo, None, None))

    def s3(arch, arch_opt, ef_p, w_p, tb, vb, ef_lr, w_lr, rng):
        return steps["stage3"](arch, arch_opt, ef_p, w_p, tb, vb,
                               ef_lr, w_lr, rng)

    stage3 = pack_step(
        s3, (None, None, p_ef, p_w, None, None, None, None, None),
        (None, None, None))

    # state conversion as ONE jitted dispatch each (eager pack/unpack would
    # be ~1600 individual slice/concat dispatches)
    pack_state = jax.jit(lambda ef, efo, w, wo: (
        p_ef.pack(ef), p_efo.pack(efo), p_w.pack(w), p_wo.pack(wo)))
    unpack_state = jax.jit(lambda a, b, c, d: (
        p_ef.unpack(a), p_efo.unpack(b), p_w.unpack(c), p_wo.unpack(d)))

    return {"stage1": stage1, "stage2": stage2, "stage3": stage3,
            "pack_state": pack_state, "unpack_state": unpack_state,
            "p_ef": p_ef, "p_efo": p_efo, "p_w": p_w, "p_wo": p_wo}
