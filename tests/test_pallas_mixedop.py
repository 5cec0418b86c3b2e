"""Parity tests for the Pallas mixed-op kernel (ops/pallas_mixedop.py).

The kernel runs in interpret mode off-TPU; numerics must match the XLA
`_mixed_fold` path (models/search.py), which is itself parity-pinned
against the reference-exact unfolded path in tests/test_search.py.

Measured on v5e (bf16, 100-iter steady incl. dispatch):
  C=16 H=16: xla 0.613 ms  pallas 0.479 ms
  C=8  H=32: xla 0.793 ms  pallas 0.514 ms
  C=4  H=64: xla 1.116 ms  pallas 0.588 ms   (cell-0 shape, ~2x)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lctvqa.models import search
from lctvqa.ops.pallas_mixedop import mixed_op_pallas


def _setup(C=4, N=8, H=8, W=8, seed=0):
    key = jax.random.PRNGKey(seed)
    p = search.mixed_op_init(key, C * 4, 1, 4)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, H, W, C),
                          jnp.float32)
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(seed + 2), (8,)))
    return p, x, w


def test_mixed_op_pallas_matches_fold_f32():
    p, x, w = _setup()
    ref = search._mixed_fold(p, x, w, 1, None)
    out = mixed_op_pallas(p, x, w, dtype=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mixed_op_pallas_matches_fold_bf16():
    """bf16 compute: same materialization points as the XLA path (conv
    epilogues at bf16, fp32 accumulation/stats) — agreement to bf16
    resolution."""
    p, x, w = _setup(seed=3)
    ref = search._mixed_fold(p, x, w, 1, jnp.bfloat16)
    out = mixed_op_pallas(p, x, w, dtype=jnp.bfloat16, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.0, atol=0.05 * max(scale, 1.0))


def test_mixed_op_pallas_rect_and_channels():
    """Non-square spatial dims and a different channel count."""
    p, x, w = _setup(C=8, N=4, H=12, W=8, seed=5)
    ref = search._mixed_fold(p, x, w, 1, None)
    out = mixed_op_pallas(p, x, w, dtype=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mixed_op_pallas_gradients_match_fold():
    """custom_vjp backward kernel vs jax.grad through the XLA folded path:
    gradients w.r.t. params, x and alphas to fp32-reassociation
    tolerance."""
    p, x, w = _setup(seed=11)
    g = jax.random.normal(jax.random.PRNGKey(12), x.shape)

    def loss_ref(p_, x_, w_):
        return jnp.sum(g * search._mixed_fold(p_, x_, w_, 1, None))

    def loss_pal(p_, x_, w_):
        return jnp.sum(g * mixed_op_pallas(p_, x_, w_, dtype=None,
                                           interpret=True))

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(p, x, w)
    g2 = jax.grad(loss_pal, argnums=(0, 1, 2))(p, x, w)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-4,
                                   atol=2e-4 * max(1.0, np.abs(a).max()))


def test_network_with_pallas_mixed_op_matches_xla(monkeypatch):
    """Integrated path: network_apply with pallas_mixed_op forced on
    (interpret mode) must match the XLA folded path, outputs AND grads.
    Uses N*Cs % 128 == 0 dims so the eligibility gate admits the edges."""
    import dataclasses
    from lctvqa.config import ModelConfig
    monkeypatch.setattr(search, "PALLAS_MIX_INTERPRET", True)
    cfg = ModelConfig(img_size=16, qst_vocab_size=64, ans_vocab_size=16,
                      arch_type="darts", darts_init_ch=8, darts_layers=2,
                      compute_dtype="float32")
    on = dataclasses.replace(cfg, pallas_mixed_op=True)
    off = dataclasses.replace(cfg, pallas_mixed_op=False)
    key = jax.random.PRNGKey(0)
    params = search.network_init(key, cfg)
    arch = search.arch_init(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 16, 3))

    y1 = search.network_apply(params, arch, on, x)
    y2 = search.network_apply(params, arch, off, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)

    def loss(c):
        return lambda p_, a_: jnp.sum(
            search.network_apply(p_, a_, c, x) ** 2)

    g1p, g1a = jax.grad(loss(on), argnums=(0, 1))(params, arch)
    g2p, g2a = jax.grad(loss(off), argnums=(0, 1))(params, arch)
    # Per-element comparison is ill-posed here: grads through deep
    # batch-stat BN chains at toy dims amplify relu/argmax boundary flips
    # between any two float implementations (the known-correct fold-vs-
    # plain NHWC pair shows 0.02 max elementwise diffs at these dims with
    # cosine 1.0). Assert directional + norm agreement instead.
    fa = np.concatenate([np.asarray(l).ravel() for l in
                         jax.tree_util.tree_leaves((g1p, g1a))])
    fb = np.concatenate([np.asarray(l).ravel() for l in
                         jax.tree_util.tree_leaves((g2p, g2a))])
    assert np.isfinite(fa).all() and np.isfinite(fb).all()
    cos = float((fa * fb).sum()
                / (np.linalg.norm(fa) * np.linalg.norm(fb)))
    assert cos > 0.99999, cos
    ratio = np.linalg.norm(fa) / np.linalg.norm(fb)
    assert 0.999 < ratio < 1.001, ratio
    rel_err = np.linalg.norm(fa - fb) / np.linalg.norm(fb)
    assert rel_err < 0.01, rel_err
    # per-leaf direction/magnitude (round-2 advisor: a single wrong
    # parameter-group gradient must not hide in the global norm)
    for a, b in zip(jax.tree_util.tree_leaves((g1p, g1a)),
                    jax.tree_util.tree_leaves((g2p, g2a))):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if nb < 1e-12:
            assert na < 1e-12
            continue
        leaf_cos = float((a * b).sum() / max(na * nb, 1e-30))
        assert leaf_cos > 0.999, leaf_cos
        assert 0.97 < na / nb < 1.03, (na, nb)


def _node_setup(E=3, C=4, N=32, H=8, W=8, seed=0):
    """E edges with distinct params/inputs/weights on a node."""
    ps = [search.mixed_op_init(jax.random.PRNGKey(seed + 10 * e), C * 4,
                               1, 4) for e in range(E)]
    xs = [jax.random.normal(jax.random.PRNGKey(seed + 100 + e),
                            (N, H, W, C), jnp.float32) for e in range(E)]
    alphas = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(seed + 200), (E, 8)), axis=-1)
    betas = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(seed + 201), (E,)))
    return ps, xs, alphas, betas


def _node_ref(ps, xs, alphas, betas):
    """sum_e beta_e * _mixed_fold(p_e, x_e, alpha_e) — the XLA node sum."""
    out = None
    for p, x, a, b in zip(ps, xs, alphas, betas):
        y = b * search._mixed_fold(p, x, a, 1, None)
        out = y if out is None else out + y
    return out


def _node_call(ps, xs, alphas, betas):
    from lctvqa.ops.pallas_mixedop import mixed_node_pallas_hwcn
    n, h, w, c = xs[0].shape
    xts = [jnp.transpose(x, (1, 2, 3, 0)).reshape(h, w, c * n) for x in xs]
    wts = betas[:, None] * alphas
    out = mixed_node_pallas_hwcn(xts, ps, wts, c, n, interpret=True)
    return jnp.transpose(out.reshape(h, w, c, n), (3, 0, 1, 2))


def test_mixed_node_matches_beta_weighted_edge_sum():
    """The node kernel computes sum_e beta_e * mix_e in ONE invocation
    (model_search.py:80-91 node semantics, round-3 node batching)."""
    ps, xs, alphas, betas = _node_setup()
    ref = _node_ref(ps, xs, alphas, betas)
    out = _node_call(ps, xs, alphas, betas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mixed_node_gradients_per_leaf():
    """Node-kernel grads w.r.t. every edge's params, inputs, alphas AND
    betas vs jax.grad through the XLA node sum — asserted PER LEAF
    (round-2 advisor: global-norm checks can hide one wrong leaf)."""
    ps, xs, alphas, betas = _node_setup(seed=31)
    g = jax.random.normal(jax.random.PRNGKey(99), xs[0].shape)

    def loss_ref(ps_, xs_, a_, b_):
        return jnp.sum(g * _node_ref(ps_, xs_, a_, b_))

    def loss_pal(ps_, xs_, a_, b_):
        return jnp.sum(g * _node_call(ps_, xs_, a_, b_))

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(ps, xs, alphas, betas)
    g2 = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(ps, xs, alphas, betas)
    leaves1, tdef1 = jax.tree_util.tree_flatten(g1)
    leaves2, tdef2 = jax.tree_util.tree_flatten(g2)
    assert tdef1 == tdef2
    for a, b in zip(leaves1, leaves2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-4,
                                   atol=2e-4 * max(1.0, np.abs(a).max()))


def test_mixed_node_bwd_vmem_split_is_exact(monkeypatch):
    """When the backward VMEM cap forces sub-calls, the edge-split
    backward must equal the unsplit one (edges are independent given the
    output cotangent; tolerance covers float reassociation between the
    E-wide and per-edge kernel programs, measured ~1e-6)."""
    from lctvqa.ops import pallas_mixedop as PM
    ps, xs, alphas, betas = _node_setup(E=3, seed=57)
    g = jax.random.normal(jax.random.PRNGKey(7), xs[0].shape)

    def loss(ps_, xs_, a_, b_):
        return jnp.sum(g * _node_call(ps_, xs_, a_, b_))

    g_full = jax.grad(loss, argnums=(0, 1, 2, 3))(ps, xs, alphas, betas)
    h, w = xs[0].shape[1], xs[0].shape[2]
    c, n = xs[0].shape[3], xs[0].shape[0]
    # shrink the budget so bwd_cap drops to 1 (fwd unchanged in this call
    # path — the split happens inside the VJP)
    per_bwd = PM._footprints(h, w, c, n, 4)[2]
    monkeypatch.setattr(PM, "VMEM_BUDGET", int(per_bwd * 1.5))
    assert PM.node_caps(h, w, c, n, None)[1] == 1
    g_split = jax.grad(loss, argnums=(0, 1, 2, 3))(ps, xs, alphas, betas)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_split)):
        a = np.asarray(a)
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-5,
                                   atol=2e-5 * max(1.0, np.abs(a).max()))


def test_mixed_op_pallas_alpha_sensitivity():
    """The alphas are folded INSIDE the kernel — a one-hot alpha on
    max_pool must reproduce BN(maxpool(x)) alone."""
    p, x, w = _setup(seed=7)
    one_hot = jnp.zeros(8).at[1].set(1.0)   # max_pool_3x3
    out = mixed_op_pallas(p, x, one_hot, dtype=None, interpret=True)
    from lctvqa.ops import conv as C
    ref = C.batchnorm({}, C.max_pool(x, 3, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
