"""Plain DARTS second-order architect (reference `pcdarts/architect.py`,
`darts_vqa/pcdarts/architect_vqa.py`).

The reference implements the bilevel gradient with flat-theta model surgery
(`_construct_model_from_theta`) and a central finite-difference
Hessian-vector product. In JAX the unrolled inner SGD step is just function
composition, so the default 'exact' mode is

    d/d_alpha  L_val( w - eta * grad_w L_train(w, alpha),  alpha )

computed by `jax.grad` straight through the unroll — both the direct
alpha-term and the implicit -eta * (d^2 L_train / d_alpha d_w) @ grad_w'
L_val term fall out of reverse-mode AD, no model cloning, no probes.

'fd' mode replays the reference math step for step (unroll, val grad,
+/- R probes with R = r/||v||) for numeric parity experiments. Unlike the
reference, both probes share one dropout rng (common random numbers), which
strictly reduces FD noise.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from lctvqa.optim.optimizers import sgd_step

Batch = dict  # {'image', 'question', 'answer_label'}


def _global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(g))
                        for g in jax.tree_util.tree_leaves(tree)))


def make_darts_arch_grad(loss_fn: Callable, mode: str = "exact",
                         r: float = 1e-2):
    """loss_fn(params, arch, batch, rng) -> scalar.

    Returns arch_grad(params, arch, train_batch, val_batch, eta, rng)
    -> (grads_like_arch, val_loss). Jittable; wrap in jax.jit at the call
    site with static config closed over.
    """

    def exact(params, arch, train_batch, val_batch, eta, rng):
        r_train, r_val = jax.random.split(rng)

        def val_after_unroll(a):
            g_w = jax.grad(loss_fn)(params, a, train_batch, r_train)
            unrolled = sgd_step(params, g_w, eta)
            return loss_fn(unrolled, a, val_batch, r_val)

        val_loss, g_a = jax.value_and_grad(val_after_unroll)(arch)
        return g_a, val_loss

    def fd(params, arch, train_batch, val_batch, eta, rng):
        r_train, r_val, r_probe = jax.random.split(rng, 3)
        # unroll: w' = w - eta * grad_w L_train
        g_w = jax.grad(loss_fn)(params, arch, train_batch, r_train)
        unrolled = sgd_step(params, g_w, eta)
        # dalpha = grad_alpha L_val(w'), vector = grad_w' L_val(w')
        val_loss, (vector, dalpha) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(unrolled, arch, val_batch, r_val)
        # implicit term via central finite difference (architect.py:94-109)
        R = r / _global_norm(vector)
        plus = jax.tree_util.tree_map(lambda p, v: p + R * v, params, vector)
        minus = jax.tree_util.tree_map(lambda p, v: p - R * v, params, vector)
        ga_p = jax.grad(loss_fn, argnums=1)(plus, arch, train_batch, r_probe)
        ga_n = jax.grad(loss_fn, argnums=1)(minus, arch, train_batch, r_probe)
        implicit = jax.tree_util.tree_map(
            lambda p, n: (p - n) / (2.0 * R), ga_p, ga_n)
        g_a = jax.tree_util.tree_map(lambda d, i: d - eta * i,
                                     dalpha, implicit)
        return g_a, val_loss

    return exact if mode == "exact" else fd
