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
