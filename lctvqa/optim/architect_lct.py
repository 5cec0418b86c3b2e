"""LCT tri-level architect — Stage 3 (reference
`basic_vqa/pcdarts/architect_lct.py:32-235`).

The reference's Stage-3 pipeline:
  1. EF' = EF - ef_lr * grad_EF [CE_ans + CE_qst](train)
  2. (pseudo_qst, pseudo_ans) = EF'.generate(img_train);
     pseudo_ans = softmax(ans / TEMPERATURE)
  3. W'  = W - w_lr * grad_W soft_loss(real + pseudo)
  4. grad_w' = grad_{W'} CE(W'(val))
  5. kappa = finite-diff HVP of W's soft loss wrt EF' params along grad_w'
  6. gamma = finite-diff HVP of EF's train loss wrt arch params along kappa
  7. alpha.grad = gamma * ef_lr * w_lr

In 'exact' mode all of that is ONE `jax.grad` through the composed
two-level unroll:

    d/d_alpha  L_val( W - w_lr * grad_W L_soft(W, pseudo(EF'(alpha))) )

whose chain rule expands to exactly gamma * ef_lr * w_lr (the two minus
signs of the inner SGD steps cancel) — the kept reference quirks are:
pseudo answers are softened with TEMPERATURE; generated token ids are
integers (stop-gradient by construction, so the question head's fc2 gets
zero gradient — `exp_zero_grad=2`); W's VGG trunk is frozen
(`exp_zero_grad=36` — its 36 leaves get exact-zero gradients here).

'fd' mode replays steps 1-7 literally with the reference's R = r/||v||
probes, sharing dropout rngs between +/- probes (common random numbers).

NOTE an intentional semantic difference: the reference's kappa/gamma chain
perturbs only EF *weights* (alphas are not in `model.parameters()`,
model_search.py:187-200), so it DROPS the direct first-order path
alpha -> EF'(alpha).generate -> pseudo answers -> W' -> L_val. 'exact'
mode includes that term (it is part of the true gradient of the stated
objective); 'fd' reproduces the reference's truncation. The parity test
compares 'fd' against an indirect-only exact variant
(`stop_gradient` on alpha inside the pseudo-QA generation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig, TrainConfig
from lctvqa.models import vqa_ef, vqa_w
from lctvqa.optim.optimizers import sgd_step


def _global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(g))
                        for g in jax.tree_util.tree_leaves(tree)))


def make_lct_arch_grad(mcfg: ModelConfig, tcfg: TrainConfig,
                       mode: str | None = None):
    """Returns arch_grad(arch, ef_params, w_params, train_batch, val_batch,
    ef_lr, w_lr, rng) -> (grads_like_arch, unrolled_val_loss)."""
    import dataclasses
    mode = mode or tcfg.architect_mode
    # The architect differentiates THROUGH inner jax.grad calls
    # (grad-of-grad). The Pallas LSTM cell is now a custom_JVP whose jnp
    # tangent rule supports arbitrary-order AD (validated:
    # tests/test_pallas.py::test_fused_cell_second_order_ad), BUT the
    # COMPILED pallas_call primitive cannot be staged into the unknown
    # region of the outer linearization — here the LSTM's inputs depend on
    # alpha through the darts trunk, so on TPU the primal call lands
    # exactly there ("Linearization failed ...", reproduced by
    # scripts/bench_stage3.py). Both kernels are therefore swapped for
    # their parity-pinned jnp/XLA forms inside the architect closures:
    # LSTM kernel == jnp cell (tests/test_pallas.py), mixed-op node kernel
    # == XLA fold (tests/test_pallas_mixedop.py) — the swap is provably
    # benign to float tolerance.
    mcfg = dataclasses.replace(mcfg, use_pallas_lstm=False,
                               pallas_mixed_op=False,
                               pallas_generate=False,
                               pallas_seq_lstm=False)
    temp = tcfg.temperature
    w_lambda = tcfg.w_lambda

    def ef_train_loss(ef_p, a, batch, rng):
        return vqa_ef.ef_loss(ef_p, a, mcfg, batch["image"],
                              batch["question"], batch["answer_label"],
                              rng=rng, deterministic=False)

    def pseudo_qa(ef_p, a, img, rng):
        """EF generate + temperature softening (architect_lct.py:53-55)."""
        pq, pa_logits = vqa_ef.ef_generate(ef_p, a, mcfg, img, rng=rng,
                                           deterministic=False,
                                           sample_deterministic=True)
        return pq, jax.nn.softmax(pa_logits / temp, axis=-1)

    def w_soft(w_p, batch, pq, pa, rng):
        return vqa_w.w_soft_loss(w_p, mcfg, batch["image"],
                                 batch["question"], batch["answer_label"],
                                 pq, pa, w_lambda, rng=rng,
                                 deterministic=False)

    def w_val_loss(w_p, batch, rng):
        return vqa_w.w_loss(w_p, mcfg, batch["image"], batch["question"],
                            batch["answer_label"], rng=rng,
                            deterministic=False)

    indirect_only = mode == "exact-indirect"
    # Optional remat of the inner-unroll losses: the outer grad's
    # double-backward then recomputes the EF/W forwards instead of holding
    # their activations across the whole tri-level program (TrainConfig
    # stage3_remat; measured by scripts/bench_stage3.py).
    ef_inner = (jax.checkpoint(ef_train_loss) if tcfg.stage3_remat
                else ef_train_loss)
    w_inner = jax.checkpoint(w_soft) if tcfg.stage3_remat else w_soft

    def exact(arch, ef_params, w_params, train_batch, val_batch,
              ef_lr, w_lr, rng):
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        def val_after_unrolls(a):
            g_ef = jax.grad(ef_inner)(ef_params, a, train_batch, r1)
            ef2 = sgd_step(ef_params, g_ef, ef_lr)
            # 'exact-indirect' truncates the direct alpha->generate path the
            # way the reference's FD scheme implicitly does (see module doc)
            a_gen = jax.lax.stop_gradient(a) if indirect_only else a
            pq, pa = pseudo_qa(ef2, a_gen, train_batch["image"], r2)
            g_w = jax.grad(w_inner)(w_params, train_batch, pq, pa, r3)
            w2 = sgd_step(w_params, g_w, w_lr)
            return w_val_loss(w2, val_batch, r4)

        val_loss, g_a = jax.value_and_grad(val_after_unrolls)(arch)
        return g_a, val_loss

    def fd(arch, ef_params, w_params, train_batch, val_batch,
           ef_lr, w_lr, rng):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        # (1) unroll EF
        g_ef = jax.grad(ef_train_loss)(ef_params, arch, train_batch, r1)
        ef2 = sgd_step(ef_params, g_ef, ef_lr)
        # (2) pseudo QA from EF'
        pq, pa = pseudo_qa(ef2, arch, train_batch["image"], r2)
        # (3) unroll W on the soft loss
        g_w = jax.grad(w_soft)(w_params, train_batch, pq, pa, r3)
        w2 = sgd_step(w_params, g_w, w_lr)
        # (4) grad_w' of the validation loss
        val_loss, grad_wprime = jax.value_and_grad(w_val_loss)(
            w2, val_batch, r4)
        # (5) kappa: HVP of W's soft loss wrt EF' params along grad_w'.
        # Pseudo-QA is regenerated inside each probe from the SAME ef2 + rng
        # (the reference regenerates per probe to avoid retain_graph,
        # architect_lct.py:67-71).
        R1 = 1e-2 / _global_norm(grad_wprime)

        def soft_wrt_ef(ef_p, w_p):
            pq_i, pa_i = pseudo_qa(ef_p, arch, train_batch["image"], r2)
            return w_soft(w_p, train_batch, pq_i, pa_i, r3)

        w_plus = jax.tree_util.tree_map(lambda p, v: p + R1 * v,
                                        w_params, grad_wprime)
        w_minus = jax.tree_util.tree_map(lambda p, v: p - R1 * v,
                                         w_params, grad_wprime)
        gp = jax.grad(soft_wrt_ef)(ef2, w_plus)
        gn = jax.grad(soft_wrt_ef)(ef2, w_minus)
        kappa = jax.tree_util.tree_map(lambda a_, b_: (a_ - b_) / (2 * R1),
                                       gp, gn)
        # (6) gamma: HVP of EF's train loss wrt arch params along kappa
        R2 = 1e-2 / _global_norm(kappa)
        ef_plus = jax.tree_util.tree_map(lambda p, v: p + R2 * v,
                                         ef_params, kappa)
        ef_minus = jax.tree_util.tree_map(lambda p, v: p - R2 * v,
                                          ef_params, kappa)
        ga_p = jax.grad(ef_train_loss, argnums=1)(ef_plus, arch,
                                                  train_batch, r1)
        ga_n = jax.grad(ef_train_loss, argnums=1)(ef_minus, arch,
                                                  train_batch, r1)
        gamma = jax.tree_util.tree_map(lambda a_, b_: (a_ - b_) / (2 * R2),
                                       ga_p, ga_n)
        # (7) alpha grad scaling (architect_lct.py:83-88)
        g_a = jax.tree_util.tree_map(lambda g: g * ef_lr * w_lr, gamma)
        return g_a, val_loss

    return fd if mode == "fd" else exact
