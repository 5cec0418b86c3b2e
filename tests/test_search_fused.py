"""Fused (edge-batched) cell execution must match the reference-shaped
path numerically — forward AND gradients."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.config import small_test_config
from lctvqa.models import search, search_fused


def _cfg(**kw):
    base = small_test_config().model
    fields = dict(darts_init_ch=8, darts_layers=3, darts_steps=4,
                  darts_multiplier=4, img_size=16)
    fields.update(kw)
    return dataclasses.replace(base, **fields)


def test_fused_network_matches_reference_path():
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    params = search.network_init(key, cfg)
    arch = search.arch_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    ref = jax.jit(lambda p, a: search.network_apply(p, a, cfg, x))(
        params, arch)
    fused = jax.jit(lambda p, a: search_fused.network_apply_fused(
        p, a, cfg, x))(params, arch)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_fold_matches_explicit_per_op_bn():
    """The fully folded fused path (BN + beta folded into the mixture,
    one shuffle per node) must reproduce the explicit unfused per-op-BN
    path — pins the whole chain of algebraic reorderings at once."""
    cfg_fold = _cfg(fold_bn_mixture=True)
    cfg_plain = _cfg(fold_bn_mixture=False)
    key = jax.random.PRNGKey(6)
    params = search.network_init(key, cfg_fold)
    arch = search.arch_init(jax.random.PRNGKey(7), cfg_fold)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 3))
    ref = jax.jit(lambda p, a: search.network_apply(p, a, cfg_plain, x))(
        params, arch)
    fused = jax.jit(lambda p, a: search_fused.network_apply_fused(
        p, a, cfg_fold, x))(params, arch)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_fold_gradients_match():
    cfg_fold = _cfg(darts_layers=2, darts_steps=2, darts_multiplier=2,
                    fold_bn_mixture=True)
    cfg_plain = dataclasses.replace(cfg_fold, fold_bn_mixture=False)
    key = jax.random.PRNGKey(9)
    params = search.network_init(key, cfg_fold)
    arch = search.arch_init(jax.random.PRNGKey(10), cfg_fold)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 16, 16, 3))

    def loss_ref(p, a):
        return jnp.sum(jnp.tanh(search.network_apply(p, a, cfg_plain, x)))

    def loss_fused(p, a):
        return jnp.sum(jnp.tanh(search_fused.network_apply_fused(
            p, a, cfg_fold, x)))

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, arch)
    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, arch)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        assert err <= 1e-4 + 2e-3 * np.abs(a).max(), \
            (err, np.abs(a).max())


def test_fused_gradients_match():
    cfg = _cfg(darts_layers=2, darts_steps=2, darts_multiplier=2)
    key = jax.random.PRNGKey(3)
    params = search.network_init(key, cfg)
    arch = search.arch_init(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))

    def loss_ref(p, a):
        return jnp.sum(jnp.tanh(search.network_apply(p, a, cfg, x)))

    def loss_fused(p, a):
        return jnp.sum(jnp.tanh(search_fused.network_apply_fused(
            p, a, cfg, x)))

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, arch)
    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, arch)
    # leaf-level tolerance: reassociated reductions differ in the last few
    # ulps on near-zero entries
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        assert err <= 3e-5 + 3e-4 * np.abs(a).max(), \
            (err, np.abs(a).max())
