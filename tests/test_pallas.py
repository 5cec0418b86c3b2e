"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.ops.lstm import lstm_cell, lstm_init
import functools

from lctvqa.ops.pallas_lstm import lstm_cell_pallas as _lcp

lstm_cell_pallas = functools.partial(_lcp, force_interpret=True)


def _setup(b=8, in_sz=16, hid=32, seed=0):
    params = lstm_init(jax.random.PRNGKey(seed), in_sz, hid, 1)
    lp = params["layers"][0]
    k = jax.random.PRNGKey(seed + 1)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (b, in_sz))
    h = jax.random.normal(k2, (b, hid))
    c = jax.random.normal(k3, (b, hid))
    return lp, x, h, c


def test_fused_cell_matches_reference_forward():
    lp, x, h, c = _setup()
    h_ref, c_ref = lstm_cell(lp, x, h, c)
    h_pal, c_pal = lstm_cell_pallas(lp, x, h, c)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_cell_custom_vjp_matches_autodiff():
    lp, x, h, c = _setup(seed=3)

    def loss_ref(lp, x, h, c):
        h2, c2 = lstm_cell(lp, x, h, c)
        return jnp.sum(h2 ** 2) + jnp.sum(jnp.tanh(c2))

    def loss_pal(lp, x, h, c):
        h2, c2 = lstm_cell_pallas(lp, x, h, c)
        return jnp.sum(h2 ** 2) + jnp.sum(jnp.tanh(c2))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(lp, x, h, c)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(lp, x, h, c)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_cell_second_order_ad():
    """grad-of-grad THROUGH the Pallas cell (now a custom_jvp whose
    tangent rule is differentiable jnp math — round-2 verdict #9): the
    HVP w.r.t. the cell parameters must match the plain jnp cell, so the
    architects can keep the kernel instead of silently swapping it."""
    lp, x, h, c = _setup(seed=9)

    def make_loss(cell):
        def f(lp_):
            h2, c2 = cell(lp_)
            return jnp.sum(h2 ** 2) + jnp.sum(jnp.tanh(c2))
        return f

    f_ref = make_loss(lambda lp_: lstm_cell(lp_, x, h, c))
    f_pal = make_loss(
        lambda lp_: lstm_cell_pallas(lp_, x, h, c, force_interpret=True))
    v = jax.tree_util.tree_map(jnp.ones_like, lp)
    hvp_ref = jax.jvp(jax.grad(f_ref), (lp,), (v,))[1]
    hvp_pal = jax.jvp(jax.grad(f_pal), (lp,), (v,))[1]
    for a, b in zip(jax.tree_util.tree_leaves(hvp_ref),
                    jax.tree_util.tree_leaves(hvp_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_cell_under_scan():
    """Must work inside lax.scan (the generate loop) and match."""
    from lctvqa.ops.lstm import lstm
    params = lstm_init(jax.random.PRNGKey(5), 8, 16, 1)
    xs = jax.random.normal(jax.random.PRNGKey(6), (4, 10, 8))
    out_ref, (h_ref, c_ref) = lstm(params, xs, use_pallas=False)
    out_pal, (h_pal, c_pal) = lstm(params, xs, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_cell_in_model_forward():
    """End-to-end: EF forward with use_pallas_lstm=True equals the jnp
    path (deterministic, fp32)."""
    import dataclasses

    from lctvqa.config import small_test_config
    from lctvqa.models import vqa_ef
    cfg = small_test_config().model
    cfg_p = dataclasses.replace(cfg, use_pallas_lstm=True)
    key = jax.random.PRNGKey(7)
    img = jax.random.normal(key, (2, cfg.img_size, cfg.img_size, 3))
    qst = jax.random.randint(key, (2, cfg.max_qst_len), 0,
                             cfg.qst_vocab_size)
    params, arch = vqa_ef.init_ef_model(key, cfg)
    ans_ref, qlog_ref = jax.jit(
        lambda: vqa_ef.ef_forward(params, arch, cfg, img, qst))()
    ans_pal, qlog_pal = jax.jit(
        lambda: vqa_ef.ef_forward(params, arch, cfg_p, img, qst))()
    np.testing.assert_allclose(np.asarray(ans_pal), np.asarray(ans_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qlog_pal), np.asarray(qlog_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bn_matches_reference():
    from lctvqa.ops.conv import batchnorm
    from lctvqa.ops.pallas_bn import batchnorm_pallas
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 6, 6, 5)) * 3 + 1
    ref = batchnorm({}, x)
    pal = batchnorm_pallas(x, force_interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bn_gradient_matches():
    from lctvqa.ops.conv import batchnorm
    from lctvqa.ops.pallas_bn import batchnorm_pallas
    x = jax.random.normal(jax.random.PRNGKey(12), (3, 4, 4, 6)) * 2

    def loss_ref(x):
        return jnp.sum(jnp.tanh(batchnorm({}, x)))

    def loss_pal(x):
        return jnp.sum(jnp.tanh(batchnorm_pallas(x, force_interpret=True)))

    g_ref = jax.grad(loss_ref)(x)
    g_pal = jax.grad(loss_pal)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_pallas_bn_bf16_out():
    from lctvqa.ops.pallas_bn import batchnorm_pallas
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 4, 4, 8))
    y = batchnorm_pallas(x, out_dtype=jnp.bfloat16, force_interpret=True)
    assert y.dtype == jnp.bfloat16


# --------------------------------------------------------------------------
# Whole-sequence LSTM kernel (final state only)
# --------------------------------------------------------------------------

def _seq_setup(b=4, t=7, in_sz=8, hid=16, seed=3):
    params = lstm_init(jax.random.PRNGKey(seed), in_sz, hid, 1)
    xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, in_sz))
    return params, xs


def _seq_ref(params, xs, h0=None, c0=None):
    from lctvqa.ops.lstm import lstm
    _, (h_n, c_n) = lstm(params, xs,
                         h0=None if h0 is None else h0[None],
                         c0=None if c0 is None else c0[None])
    return h_n[0], c_n[0]


def test_seq_kernel_matches_scan_forward():
    from lctvqa.ops.pallas_lstm import lstm_seq_final_pallas
    params, xs = _seq_setup()
    lp = params["layers"][0]
    h_ref, c_ref = _seq_ref(params, xs)
    h_pal, c_pal = lstm_seq_final_pallas(lp, xs, None, None,
                                         force_interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-6)
    # with explicit initial state
    b, hid = h_ref.shape
    h0 = jax.random.normal(jax.random.PRNGKey(9), (b, hid))
    h_ref2, c_ref2 = _seq_ref(params, xs, h0, h0)
    h_pal2, c_pal2 = lstm_seq_final_pallas(lp, xs, h0, h0,
                                           force_interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal2), np.asarray(h_ref2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal2), np.asarray(c_ref2),
                               rtol=1e-6, atol=1e-6)


def test_seq_kernel_gradients_match_scan():
    from lctvqa.ops.pallas_lstm import lstm_seq_final_pallas
    params, xs = _seq_setup()
    lp = params["layers"][0]

    def loss_pal(lp_, xs_):
        h, c = lstm_seq_final_pallas(lp_, xs_, None, None,
                                     force_interpret=True)
        return jnp.sum(jnp.tanh(h) ** 2) + jnp.sum(c ** 2)

    def loss_ref(lp_, xs_):
        h, c = _seq_ref({"layers": [lp_]}, xs_)
        return jnp.sum(jnp.tanh(h) ** 2) + jnp.sum(c ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1))(lp, xs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(lp, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_seq_kernel_second_order_ad():
    from lctvqa.ops.pallas_lstm import lstm_seq_final_pallas
    params, xs = _seq_setup(b=2, t=3, in_sz=4, hid=8)
    lp = params["layers"][0]

    def scalar(lp_):
        h, c = lstm_seq_final_pallas(lp_, xs, None, None,
                                     force_interpret=True)
        return jnp.sum(h ** 2)

    def scalar_ref(lp_):
        h, c = _seq_ref({"layers": [lp_]}, xs)
        return jnp.sum(h ** 2)

    g2 = jax.grad(lambda lp_: sum(
        jnp.sum(v ** 2) for v in jax.tree_util.tree_leaves(
            jax.grad(scalar)(lp_))))(lp)
    g2_ref = jax.grad(lambda lp_: sum(
        jnp.sum(v ** 2) for v in jax.tree_util.tree_leaves(
            jax.grad(scalar_ref)(lp_))))(lp)
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g2_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_w_encoder_pallas_seq_route(monkeypatch):
    """w_qst_encoder(use_pallas=True) routes through the sequence kernel
    and matches the scan path."""
    import lctvqa.ops.pallas_lstm as PL
    from lctvqa.models import qst_encoder

    params = qst_encoder.w_qst_encoder_init(
        jax.random.PRNGKey(5), qst_vocab_size=30, word_embed_size=8,
        embed_size=12, num_layers=1, hidden_size=16)
    q = jax.random.randint(jax.random.PRNGKey(6), (4, 7), 0, 30)

    orig = PL.lstm_seq_final_pallas
    called = []

    def forced(lp, xs, h0, c0, dtype=None, force_interpret=False,
               **kw):
        called.append(1)
        return orig(lp, xs, h0, c0, dtype=dtype, force_interpret=True)

    monkeypatch.setattr(PL, "lstm_seq_final_pallas", forced)
    out_pal = qst_encoder.w_qst_encoder(params, q,
                                        use_pallas_seq=True)
    assert called
    out_ref = qst_encoder.w_qst_encoder(params, q, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)


def test_seq_all_kernel_matches_scan():
    from lctvqa.ops.pallas_lstm import lstm_seq_pallas
    params, xs = _seq_setup()
    lp = params["layers"][0]
    b, hid = xs.shape[0], lp["w_hh"].shape[0]
    h0 = jax.random.normal(jax.random.PRNGKey(11), (b, hid))

    from lctvqa.ops.lstm import lstm
    outs_ref, (h_ref, c_ref) = lstm(params, xs, h0=h0[None], c0=h0[None])
    outs, (h_n, c_n) = lstm_seq_pallas(lp, xs, h0, h0,
                                       force_interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(h_ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_n), np.asarray(c_ref[0]),
                               rtol=1e-6, atol=1e-6)


def test_seq_all_kernel_gradients_match_scan():
    from lctvqa.ops.lstm import lstm
    from lctvqa.ops.pallas_lstm import lstm_seq_pallas
    params, xs = _seq_setup()
    lp = params["layers"][0]
    b, hid = xs.shape[0], lp["w_hh"].shape[0]
    h0 = jax.random.normal(jax.random.PRNGKey(12), (b, hid))

    def loss_pal(lp_, h0_):
        outs, (h, c) = lstm_seq_pallas(lp_, xs, h0_, h0_,
                                       force_interpret=True)
        return jnp.sum(jnp.tanh(outs) ** 2) + jnp.sum(h * c)

    def loss_ref(lp_, h0_):
        outs, (h, c) = lstm({"layers": [lp_]}, xs, h0=h0_[None],
                            c0=h0_[None])
        return jnp.sum(jnp.tanh(outs) ** 2) + jnp.sum(h[0] * c[0])

    g_pal = jax.grad(loss_pal, argnums=(0, 1))(lp, h0)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(lp, h0)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_pal),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_ef_encoder_pallas_seq_route(monkeypatch):
    """ef_qst_encoder(use_pallas_seq=True) routes through the per-step
    output kernel and matches the scan path (features AND logits)."""
    import lctvqa.ops.pallas_lstm as PL
    from lctvqa.models import qst_encoder

    params = qst_encoder.ef_qst_encoder_init(
        jax.random.PRNGKey(7), qst_vocab_size=30, word_embed_size=8,
        embed_size=16, num_layers=1, hidden_size=16)
    q = jax.random.randint(jax.random.PRNGKey(8), (4, 7), 0, 30)
    img = jax.random.normal(jax.random.PRNGKey(9), (4, 16))

    orig = PL.lstm_seq_pallas
    called = []

    def forced(lp, xs, h0, c0, dtype=None, force_interpret=False,
               **kw):
        called.append(1)
        return orig(lp, xs, h0, c0, dtype=dtype, force_interpret=True)

    monkeypatch.setattr(PL, "lstm_seq_pallas", forced)
    f_pal, l_pal = qst_encoder.ef_qst_encoder(params, q, img,
                                              use_pallas_seq=True)
    assert called
    f_ref, l_ref = qst_encoder.ef_qst_encoder(params, q, img)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_pal), np.asarray(l_ref),
                               rtol=1e-6, atol=1e-6)


def test_unified_forward_pallas_seq_route(monkeypatch):
    """unified_forward with pallas_seq_lstm routes through the per-step
    kernel and matches the scan path."""
    import dataclasses

    import lctvqa.ops.pallas_lstm as PL
    from lctvqa.config import small_test_config
    from lctvqa.models import unified

    base = dataclasses.replace(small_test_config().model,
                               arch_type="fixed", img_size=32)
    key = jax.random.PRNGKey(13)
    params, arch = unified.init_unified_model(key, base)
    img = jax.random.normal(jax.random.PRNGKey(14), (2, 32, 32, 3))
    qa = jax.random.randint(jax.random.PRNGKey(15), (2, base.max_qst_len),
                            0, base.qst_vocab_size)

    orig = PL.lstm_seq_pallas
    called = []

    def forced(lp, xs, h0, c0, dtype=None, force_interpret=False,
               **kw):
        called.append(1)
        return orig(lp, xs, h0, c0, dtype=dtype, force_interpret=True)

    monkeypatch.setattr(PL, "lstm_seq_pallas", forced)
    cfg_on = dataclasses.replace(base, pallas_seq_lstm=True,
                                 compute_dtype="")
    cfg_off = dataclasses.replace(base, compute_dtype="")
    out_on = unified.unified_forward(params, arch, cfg_on, img, qa)
    assert called
    out_off = unified.unified_forward(params, arch, cfg_off, img, qa)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-5)
