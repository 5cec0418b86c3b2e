"""PC-DARTS search network tests (reference inline test
`pcdarts/model_search.py:252-264` plus structural invariants)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.config import small_test_config
from lctvqa.models import search
from lctvqa.models.genotypes import PRIMITIVES


def _cfg(**kw):
    return dataclasses.replace(small_test_config().model, **kw)


def test_network_output_shape_matches_reference_dims():
    """Reference: init_ch=16, layers=4 -> 256ch x 7 x 7 features
    (model_search.py:131-132, 262-263)."""
    cfg = _cfg(darts_init_ch=16, darts_layers=4, img_size=32)
    assert search.network_out_features(cfg) == 256 * 7 * 7
    key = jax.random.PRNGKey(0)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jax.random.normal(key, (2, 32, 32, 3))
    out = jax.jit(lambda p, a: search.network_apply(p, a, cfg, x))(
        params, arch)
    assert out.shape == (2, 256 * 7 * 7)


def test_channel_shuffle_mapping():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
    y = search.channel_shuffle(x, 4)
    # torch mapping: c = g*(C/g)+k -> k*g + g_idx
    expected = [0, 2, 4, 6, 1, 3, 5, 7]
    np.testing.assert_array_equal(np.asarray(y)[0, 0, 0], expected)


def test_beta_softmax_groups():
    betas = jnp.arange(14, dtype=jnp.float32)
    out = search.beta_softmax(betas, 4)
    assert out.shape == (14,)
    # each group sums to 1: sizes 2,3,4,5
    start = 0
    for n in (2, 3, 4, 5):
        np.testing.assert_allclose(float(jnp.sum(out[start:start + n])),
                                   1.0, rtol=1e-6)
        start += n


def test_mixed_op_weighted_sum_linearity():
    """alpha one-hot on 'skip_connect' stride 1 must reproduce the input
    slice in the shuffled layout."""
    cfg = _cfg()
    key = jax.random.PRNGKey(1)
    ch, k = 8, 4
    p = search.mixed_op_init(key, ch, 1, k)
    x = jax.random.normal(key, (2, 4, 4, ch))
    w = jnp.zeros(len(PRIMITIVES)).at[
        PRIMITIVES.index("skip_connect")].set(1.0)
    y = search.mixed_op_apply(p, x, w, 1, k, None)
    assert y.shape == x.shape
    # invert the channel shuffle and check the op slice equals x[..., :2]
    inv = search.channel_shuffle(y, ch // k)
    np.testing.assert_allclose(np.asarray(inv[..., : ch // k]),
                               np.asarray(x[..., : ch // k]), rtol=1e-6)


def test_fold_bn_mixture_matches_unfolded():
    """_mixed_fold is the same math reordered: folded network output must
    equal the explicit per-op-BN path to fp32 tolerance, and so must the
    gradients w.r.t. weights AND arch params."""
    cfg = _cfg(darts_init_ch=4, darts_layers=2, img_size=16)
    folded = dataclasses.replace(cfg, fold_bn_mixture=True)
    unfolded = dataclasses.replace(cfg, fold_bn_mixture=False)
    key = jax.random.PRNGKey(4)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jax.random.normal(key, (4, 16, 16, 3))

    f1 = jax.jit(lambda p, a: search.network_apply(p, a, folded, x))
    f2 = jax.jit(lambda p, a: search.network_apply(p, a, unfolded, x))
    y1, y2 = f1(params, arch), f2(params, arch)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda p, a: jnp.sum(fn(p, a) ** 2)

    g1p, g1a = jax.jit(jax.grad(loss(
        lambda p, a: search.network_apply(p, a, folded, x)),
        argnums=(0, 1)))(params, arch)
    g2p, g2a = jax.jit(jax.grad(loss(
        lambda p, a: search.network_apply(p, a, unfolded, x)),
        argnums=(0, 1)))(params, arch)
    # fp32 reduction reordering (mean/var computed once vs inside each
    # BN) shifts a few small-magnitude grad elements by ~1e-3
    for a, b in zip(jax.tree_util.tree_leaves(g1p),
                    jax.tree_util.tree_leaves(g2p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
    for k in arch:
        np.testing.assert_allclose(np.asarray(g1a[k]), np.asarray(g2a[k]),
                                   rtol=2e-3, atol=2e-3)


def test_pack_conv_branches_matches_unpacked():
    """_mixed_fold_packed embeds the four depthwise-separable branches in
    shared grouped convs (zero-padded kernels / block-diagonal pointwise
    matrices) — exact zero contributions, so outputs and gradients must
    match the unpacked folded path to fp32-reassociation tolerance."""
    cfg = _cfg(darts_init_ch=4, darts_layers=2, img_size=16)
    packed = dataclasses.replace(cfg, fold_bn_mixture=True,
                                 pack_conv_branches=True)
    fold = dataclasses.replace(cfg, fold_bn_mixture=True,
                               pack_conv_branches=False)
    key = jax.random.PRNGKey(6)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jax.random.normal(key, (4, 16, 16, 3))

    y1 = jax.jit(lambda p, a: search.network_apply(p, a, packed, x))(
        params, arch)
    y2 = jax.jit(lambda p, a: search.network_apply(p, a, fold, x))(
        params, arch)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)

    def loss(c):
        return lambda p, a: jnp.sum(search.network_apply(p, a, c, x) ** 2)

    g1p, g1a = jax.jit(jax.grad(loss(packed), argnums=(0, 1)))(params,
                                                               arch)
    g2p, g2a = jax.jit(jax.grad(loss(fold), argnums=(0, 1)))(params, arch)
    for a, b in zip(jax.tree_util.tree_leaves(g1p),
                    jax.tree_util.tree_leaves(g2p)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-3,
                                   atol=2e-3 * max(1.0, np.abs(a).max()))
    for k in arch:
        np.testing.assert_allclose(np.asarray(g1a[k]), np.asarray(g2a[k]),
                                   rtol=2e-3, atol=2e-3)


def test_remat_cells_matches_no_remat():
    """jax.checkpoint re-runs the identical cell computation in the bwd
    pass, so outputs and gradients must match the non-remat path to fp32
    tolerance (the remat is a pure scheduling change)."""
    cfg = _cfg(darts_init_ch=4, darts_layers=2, img_size=16)
    remat = dataclasses.replace(cfg, remat_cells=True)
    plain = dataclasses.replace(cfg, remat_cells=False)
    key = jax.random.PRNGKey(5)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jax.random.normal(key, (4, 16, 16, 3))

    y1 = jax.jit(lambda p, a: search.network_apply(p, a, remat, x))(
        params, arch)
    y2 = jax.jit(lambda p, a: search.network_apply(p, a, plain, x))(
        params, arch)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)

    def loss(c):
        return lambda p, a: jnp.sum(search.network_apply(p, a, c, x) ** 2)

    g1p, g1a = jax.jit(jax.grad(loss(remat), argnums=(0, 1)))(params, arch)
    g2p, g2a = jax.jit(jax.grad(loss(plain), argnums=(0, 1)))(params, arch)
    # remat re-runs the same math but XLA may reassociate reductions in the
    # recomputation — per-element agreement to ~1e-4 relative
    for a, b in zip(jax.tree_util.tree_leaves(g1p),
                    jax.tree_util.tree_leaves(g2p)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-4,
                                   atol=1e-4 * max(1.0, np.abs(a).max()))
    for k in arch:
        np.testing.assert_allclose(np.asarray(g1a[k]), np.asarray(g2a[k]),
                                   rtol=1e-4, atol=1e-4)


def test_genotype_decode_prefers_heavy_alpha():
    cfg = _cfg(darts_steps=4)
    key = jax.random.PRNGKey(2)
    arch = search.arch_init(key, cfg)
    # force edge 0 to strongly prefer sep_conv_3x3, edge 1 max_pool_3x3
    a = np.asarray(arch["alphas_normal"]).copy()
    a[:] = 0.0
    a[0, PRIMITIVES.index("sep_conv_3x3")] = 5.0
    a[1, PRIMITIVES.index("max_pool_3x3")] = 5.0
    # 'none' must never be selected even if heaviest
    a[0, PRIMITIVES.index("none")] = 10.0
    arch = dict(arch, alphas_normal=jnp.asarray(a),
                betas_normal=jnp.zeros(14))
    g = search.genotype(arch, 4, 4)
    ops_node0 = g.normal[:2]
    assert ("sep_conv_3x3", 0) in ops_node0
    assert ("max_pool_3x3", 1) in ops_node0
    assert all(op != "none" for op, _ in g.normal + g.reduce)
    assert list(g.normal_concat) == [2, 3, 4, 5]


def test_reduction_cell_halves_spatial():
    cfg = _cfg(darts_init_ch=4, darts_layers=3, img_size=16)
    # layers=3 -> reductions at 1 and 2
    key = jax.random.PRNGKey(3)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jax.random.normal(key, (2, 16, 16, 3))
    out = jax.jit(lambda: search.network_apply(params, arch, cfg, x))()
    assert out.shape == (2, search.network_out_features(cfg))
