"""Architect correctness tests.

Strategy (SURVEY.md §7 hard-part 1): pin the exact grad-through-unroll
against (a) a hand-derivable analytic bilevel problem and (b) the
reference-style finite-difference mode. For the tri-level LCT case the
reference's FD chain drops the direct alpha->generate path (see
optim/architect_lct.py docstring), so FD is compared against the
'exact-indirect' variant that truncates the same path.

Model dims are micro (single-core CPU host; XLA compile time dominates).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lctvqa.config import small_test_config
from lctvqa.models import vqa_ef, vqa_w
from lctvqa.optim.architect import make_darts_arch_grad
from lctvqa.optim.architect_lct import make_lct_arch_grad


def _micro_mcfg(**kw):
    base = small_test_config().model
    fields = dict(img_size=32, img_embed_size=16, word_embed_size=8,
                  lstm_hidden_size=16, max_qst_len=4, qst_vocab_size=16,
                  ans_vocab_size=8, darts_init_ch=4, darts_layers=1,
                  darts_steps=2, darts_multiplier=2, vgg_width_mult=1 / 16,
                  vgg_fc_dim=32)
    fields.update(kw)
    return dataclasses.replace(base, **fields)


def _batches(mcfg, b=2):
    key = jax.random.PRNGKey(0)
    vkey = jax.random.PRNGKey(1)

    def mk(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "image": jax.random.normal(
                k1, (b, mcfg.img_size, mcfg.img_size, 3)),
            "question": jax.random.randint(
                k2, (b, mcfg.max_qst_len), 0, mcfg.qst_vocab_size),
            "answer_label": jax.random.randint(
                k3, (b,), 0, mcfg.ans_vocab_size),
        }

    return mk(key), mk(vkey)


def _cos(tree_a, tree_b):
    fa = np.concatenate([np.asarray(tree_a[k]).ravel() for k in tree_a])
    fb = np.concatenate([np.asarray(tree_b[k]).ravel() for k in tree_b])
    assert np.isfinite(fa).all() and np.isfinite(fb).all()
    denom = np.linalg.norm(fa) * np.linalg.norm(fb)
    assert denom > 0
    return float(np.dot(fa, fb)) / denom


def test_darts_exact_matches_analytic_quadratic():
    """Bilevel toy: L(w, a) = 0.5*(w - a)^2 on train, L_val = 0.5*(w - c)^2.
    w' = w - eta*(w - a);  dL_val/da = (w' - c) * eta."""
    eta, c = 0.3, 2.0

    def loss_fn(params, arch, batch, rng):
        w, a = params["w"], arch["a"]
        tgt = jnp.where(batch["t"] > 0, c, a)
        return 0.5 * jnp.sum((w - tgt) ** 2)

    arch_grad = make_darts_arch_grad(loss_fn, mode="exact")
    g, val_loss = arch_grad({"w": jnp.asarray(1.5)}, {"a": jnp.asarray(0.7)},
                            {"t": jnp.asarray(0.0)}, {"t": jnp.asarray(1.0)},
                            eta, jax.random.PRNGKey(0))
    w_unrolled = 1.5 - eta * (1.5 - 0.7)
    np.testing.assert_allclose(float(g["a"]), (w_unrolled - c) * eta,
                               rtol=1e-6)
    np.testing.assert_allclose(float(val_loss),
                               0.5 * (w_unrolled - c) ** 2, rtol=1e-6)


def test_darts_exact_vs_fd_on_ef_model():
    """Exact and reference-style FD bilevel gradients agree on the real EF
    model (deterministic forward, FD tolerance)."""
    mcfg = _micro_mcfg(img_size=16)
    train_batch, val_batch = _batches(mcfg)
    params, arch = vqa_ef.init_ef_model(jax.random.PRNGKey(2), mcfg)

    def loss_fn(p, a, batch, rng):
        return vqa_ef.ef_loss(p, a, mcfg, batch["image"],
                              batch["question"], batch["answer_label"],
                              rng=None, deterministic=True)

    eta = 0.01
    key = jax.random.PRNGKey(3)
    g_exact, _ = jax.jit(make_darts_arch_grad(loss_fn, mode="exact"))(
        params, arch, train_batch, val_batch, eta, key)
    g_fd, _ = jax.jit(make_darts_arch_grad(loss_fn, mode="fd"))(
        params, arch, train_batch, val_batch, eta, key)
    assert _cos(g_exact, g_fd) > 0.95


def test_lct_fd_matches_indirect_exact():
    """Tri-level: the reference FD chain == grad-through-two-unrolls with
    the direct alpha->generate path truncated."""
    mcfg = _micro_mcfg()
    tcfg = small_test_config().train
    train_batch, val_batch = _batches(mcfg)
    key = jax.random.PRNGKey(4)
    kef, kw = jax.random.split(key)
    ef_params, arch = vqa_ef.init_ef_model(kef, mcfg)
    w_params = vqa_w.init_w_model(kw, mcfg)

    g_ind, v1 = jax.jit(make_lct_arch_grad(
        mcfg, tcfg, mode="exact-indirect"))(
        arch, ef_params, w_params, train_batch, val_batch, 0.01, 0.01, key)
    g_fd, v2 = jax.jit(make_lct_arch_grad(mcfg, tcfg, mode="fd"))(
        arch, ef_params, w_params, train_batch, val_batch, 0.01, 0.01, key)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-3)
    assert _cos(g_ind, g_fd) > 0.9


def test_lct_exact_full_gradient_finite_and_nonzero():
    """Full exact tri-level gradient (including the direct path the
    reference drops) is finite and nonzero."""
    mcfg = _micro_mcfg()
    tcfg = small_test_config().train
    train_batch, val_batch = _batches(mcfg)
    key = jax.random.PRNGKey(5)
    kef, kw = jax.random.split(key)
    ef_params, arch = vqa_ef.init_ef_model(kef, mcfg)
    w_params = vqa_w.init_w_model(kw, mcfg)
    g, v = jax.jit(make_lct_arch_grad(mcfg, tcfg, mode="exact"))(
        arch, ef_params, w_params, train_batch, val_batch, 0.01, 0.01, key)
    flat = np.concatenate([np.asarray(g[k]).ravel() for k in g])
    assert np.isfinite(flat).all()
    assert np.abs(flat).sum() > 0
    assert np.isfinite(float(v))


def test_architects_never_route_to_pallas_lstm(monkeypatch):
    """Regression (r2, re-confirmed r3): the architects are second-order
    AD and the COMPILED pallas_call cannot be staged into the unknown
    region of the outer linearization (the LSTM inputs depend on alpha
    through the darts trunk) — "Linearization failed ..." on TPU even
    with the round-3 custom_JVP cell (scripts/bench_stage3.py reproduced
    it). The architect factories must force the jnp cell in their
    closures even when the config enables Pallas (the CPU fallback in
    lstm_cell_pallas would otherwise hide this here); the swap is benign:
    kernel==jnp parity is pinned in tests/test_pallas.py."""
    import lctvqa.ops.pallas_lstm as pallas_lstm

    def boom(*a, **k):
        raise AssertionError("architect path routed to the Pallas LSTM")

    monkeypatch.setattr(pallas_lstm, "lstm_cell_pallas", boom)

    mcfg = _micro_mcfg(use_pallas_lstm=True)
    tcfg = small_test_config().train
    train_batch, val_batch = _batches(mcfg)
    key = jax.random.PRNGKey(6)
    kef, kw = jax.random.split(key)
    ef_params, arch = vqa_ef.init_ef_model(kef, mcfg)
    w_params = vqa_w.init_w_model(kw, mcfg)

    g, v = jax.jit(make_lct_arch_grad(mcfg, tcfg, mode="exact"))(
        arch, ef_params, w_params, train_batch, val_batch, 0.01, 0.01, key)
    assert np.isfinite(float(v))

    # darts-family architect through the real factory (experiment_darts)
    from lctvqa.config import Config
    from lctvqa.train.experiment_darts import make_darts_steps
    cfg = dataclasses.replace(small_test_config(), model=mcfg)
    steps = make_darts_steps(cfg, unk_idx=1)
    arch_opt = steps["arch_tx"].init(arch)

    def u8(b):
        img = np.clip((np.asarray(b["image"]) * 0.2 + 0.5) * 255, 0, 255)
        return dict(b, image_u8=jnp.asarray(img.astype(np.uint8)))

    arch2, _, v2 = steps["arch"](arch, arch_opt, ef_params, u8(train_batch),
                                 u8(val_batch), 0.01, key)
    assert np.isfinite(float(v2))
