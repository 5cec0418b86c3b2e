"""Architect correctness tests.

Strategy (SURVEY.md §7 hard-part 1): pin the exact grad-through-unroll
against (a) a hand-derivable analytic bilevel problem and (b) the
reference-style finite-difference mode, which must agree to FD tolerance.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.config import small_test_config
from lctvqa.models import vqa_ef, vqa_w
from lctvqa.optim.architect import make_darts_arch_grad
from lctvqa.optim.architect_lct import make_lct_arch_grad


def test_darts_exact_matches_analytic_quadratic():
    """Bilevel toy: L(w, a) = 0.5*(w - a)^2 on train, L_val = 0.5*(w - c)^2.
    w' = w - eta*(w - a);  dL_val/da = (w' - c) * eta."""
    eta, c = 0.3, 2.0

    def loss_fn(params, arch, batch, rng):
        target = batch["t"]  # train target is arch; val target is c
        w = params["w"]
        a = arch["a"]
        tgt = jnp.where(target > 0, c, a)
        return 0.5 * jnp.sum((w - tgt) ** 2)

    arch_grad = make_darts_arch_grad(loss_fn, mode="exact")
    params = {"w": jnp.asarray(1.5)}
    arch = {"a": jnp.asarray(0.7)}
    train_batch = {"t": jnp.asarray(0.0)}
    val_batch = {"t": jnp.asarray(1.0)}
    g, val_loss = arch_grad(params, arch, train_batch, val_batch, eta,
                            jax.random.PRNGKey(0))
    w_unrolled = 1.5 - eta * (1.5 - 0.7)
    expected = (w_unrolled - c) * eta
    np.testing.assert_allclose(float(g["a"]), expected, rtol=1e-6)
    np.testing.assert_allclose(float(val_loss),
                               0.5 * (w_unrolled - c) ** 2, rtol=1e-6)


def test_darts_exact_vs_fd_on_ef_model():
    """Exact and reference-style FD architect gradients must agree on the
    real EF model (same dropout rngs, FD tolerance)."""
    cfg = small_test_config().model
    key = jax.random.PRNGKey(0)
    b = 2
    img = jax.random.normal(key, (b, cfg.img_size, cfg.img_size, 3))
    qst = jax.random.randint(key, (b, cfg.max_qst_len), 0,
                             cfg.qst_vocab_size)
    labels = jax.random.randint(key, (b,), 0, cfg.ans_vocab_size)
    params, arch = vqa_ef.init_ef_model(key, cfg)

    def loss_fn(p, a, batch, rng):
        return vqa_ef.ef_loss(p, a, cfg, batch["image"], batch["question"],
                              batch["answer_label"], rng=None,
                              deterministic=True)

    batch = {"image": img, "question": qst, "answer_label": labels}
    vkey = jax.random.PRNGKey(1)
    val_batch = {
        "image": jax.random.normal(vkey, img.shape),
        "question": jax.random.randint(vkey, qst.shape, 0,
                                       cfg.qst_vocab_size),
        "answer_label": jax.random.randint(vkey, labels.shape, 0,
                                           cfg.ans_vocab_size),
    }
    eta = 0.01
    g_exact, _ = jax.jit(make_darts_arch_grad(loss_fn, mode="exact"))(
        params, arch, batch, val_batch, eta, key)
    g_fd, _ = jax.jit(make_darts_arch_grad(loss_fn, mode="fd"))(
        params, arch, batch, val_batch, eta, key)
    for k in arch:
        a, b_ = np.asarray(g_exact[k]).ravel(), np.asarray(g_fd[k]).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b_)
        if denom == 0:
            continue
        cos = float(np.dot(a, b_)) / denom
        assert cos > 0.95, f"{k}: exact/fd cosine {cos}"


def test_lct_exact_vs_fd_tri_level():
    """The tri-level Stage-3 gradient: exact grad-through-two-unrolls vs the
    reference's two finite-difference HVPs (architect_lct.py:46-88) must
    point the same way."""
    base = small_test_config()
    # W model needs 32px for VGG; keep everything else tiny
    mcfg = dataclasses.replace(base.model, img_size=32)
    tcfg = base.train
    key = jax.random.PRNGKey(0)
    b = 2
    img = jax.random.normal(key, (b, mcfg.img_size, mcfg.img_size, 3))
    qst = jax.random.randint(key, (b, mcfg.max_qst_len), 0,
                             mcfg.qst_vocab_size)
    labels = jax.random.randint(key, (b,), 0, mcfg.ans_vocab_size)
    batch = {"image": img, "question": qst, "answer_label": labels}
    vkey = jax.random.PRNGKey(1)
    val_batch = {
        "image": jax.random.normal(vkey, img.shape),
        "question": jax.random.randint(vkey, qst.shape, 0,
                                       mcfg.qst_vocab_size),
        "answer_label": jax.random.randint(vkey, labels.shape, 0,
                                           mcfg.ans_vocab_size),
    }
    kef, kw = jax.random.split(key)
    ef_params, arch = vqa_ef.init_ef_model(kef, mcfg)
    w_params = vqa_w.init_w_model(kw, mcfg)

    g_exact, v1 = jax.jit(make_lct_arch_grad(mcfg, tcfg, mode="exact"))(
        arch, ef_params, w_params, batch, val_batch, 0.01, 0.01, key)
    g_fd, v2 = jax.jit(make_lct_arch_grad(mcfg, tcfg, mode="fd"))(
        arch, ef_params, w_params, batch, val_batch, 0.01, 0.01, key)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-3)
    flat_e = np.concatenate([np.asarray(g_exact[k]).ravel() for k in arch])
    flat_f = np.concatenate([np.asarray(g_fd[k]).ravel() for k in arch])
    assert np.isfinite(flat_e).all() and np.isfinite(flat_f).all()
    denom = np.linalg.norm(flat_e) * np.linalg.norm(flat_f)
    assert denom > 0
    cos = float(np.dot(flat_e, flat_f)) / denom
    assert cos > 0.8, f"tri-level exact/fd cosine {cos}"
