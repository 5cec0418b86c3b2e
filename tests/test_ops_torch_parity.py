"""Golden-value parity of the compute primitives vs PyTorch CPU.

The reference's numerics live in torch ops; these tests pin our JAX ops to
the same math to fp32 tolerance (the BASELINE.json parity bar) without
needing torchvision: each test re-executes the op in pure torch.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lctvqa.ops import conv as C
from lctvqa.ops import nn as N
from lctvqa.ops.losses import cross_entropy, soft_xent
from lctvqa.ops.lstm import lstm, lstm_init

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return np.asarray(x)


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    ours = C.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                    jnp.asarray(x), stride=2, padding=1)
    theirs = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2),
                      torch.tensor(w).permute(3, 2, 0, 1),
                      torch.tensor(b), stride=2, padding=1)
    np.testing.assert_allclose(_np(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=RTOL, atol=ATOL)


def test_depthwise_dilated_conv_matches_torch():
    rng = np.random.RandomState(1)
    ch = 4
    x = rng.randn(2, 9, 9, ch).astype(np.float32)
    w = rng.randn(3, 3, 1, ch).astype(np.float32)
    ours = C.depthwise_conv2d({"w": jnp.asarray(w)}, jnp.asarray(x),
                              stride=1, padding=2, dilation=2)
    # torch depthwise: weight [C, 1, kh, kw], groups=C
    tw = torch.tensor(w).permute(3, 2, 0, 1)
    theirs = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), tw, None,
                      stride=1, padding=2, dilation=2, groups=ch)
    np.testing.assert_allclose(_np(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=RTOL, atol=ATOL)


def test_avg_pool_count_include_pad_false():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 7, 7, 3).astype(np.float32)
    ours = C.avg_pool(jnp.asarray(x), 3, 2, 1, count_include_pad=False)
    theirs = F.avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, stride=2,
                          padding=1, count_include_pad=False)
    np.testing.assert_allclose(_np(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=RTOL, atol=ATOL)


def test_max_pool():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ours = C.max_pool(jnp.asarray(x), 3, 2, 1)
    theirs = F.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, stride=2,
                          padding=1)
    np.testing.assert_allclose(_np(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("window,stride,padding",
                         [(3, 1, 1), (3, 2, 1), (2, 2, 0)])
def test_max_pool_grad_matches_torch(window, stride, padding):
    """max_pool_tap_jvp's tangent routes through the first-max window
    tap; its transpose must equal torch's argmax-routed MaxPool2d
    backward, INCLUDING on ties (relu-zero windows are common). The
    DEFAULT max_pool ships the select_and_scatter derivative (42% faster
    train step, NOTES.md round-3) which torch-matches only off ties —
    this tie-exact variant is the parity-work opt-in."""
    rng = np.random.RandomState(7)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    x[0, 0:4, 0:4, 0] = 1.5          # plateaus -> exact ties
    x[1, 2:6, 2:6, 1] = 0.0
    dy_seed = rng.randn(2, 3).astype(np.float32)

    def loss_j(t):
        y = C.max_pool_tap_jvp(t, window, stride, padding)
        return jnp.sum(y * jnp.asarray(dy_seed)[:, None, None, :])

    g = jax.grad(loss_j)(jnp.asarray(x))
    xt = torch.tensor(x).permute(0, 3, 1, 2).requires_grad_(True)
    yt = F.max_pool2d(xt, window, stride=stride, padding=padding)
    (yt * torch.tensor(dy_seed)[:, :, None, None]).sum().backward()
    np.testing.assert_allclose(_np(g),
                               xt.grad.permute(0, 2, 3, 1).numpy(),
                               rtol=RTOL, atol=ATOL)
    # arbitrary-order AD must stay open (the LCT architect JVPs this)
    v = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    hv = jax.jvp(jax.grad(lambda t: jnp.sum(
        C.max_pool_tap_jvp(t, window, stride, padding) ** 2)),
        (jnp.asarray(x),), (v,))[1]
    assert np.all(np.isfinite(_np(hv)))
    # default and tap-jvp max_pool agree on values and (off ties) grads
    xs = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    np.testing.assert_allclose(
        _np(C.max_pool(xs, window, stride, padding)),
        _np(C.max_pool_tap_jvp(xs, window, stride, padding)),
        rtol=RTOL, atol=ATOL)
    g_d = jax.grad(lambda t: jnp.sum(
        C.max_pool(t, window, stride, padding) ** 2))(xs)
    g_t = jax.grad(lambda t: jnp.sum(
        C.max_pool_tap_jvp(t, window, stride, padding) ** 2))(xs)
    np.testing.assert_allclose(_np(g_d), _np(g_t), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("in_size,out_size", [(2, 7), (16, 7), (7, 7),
                                              (10, 7)])
def test_adaptive_avg_pool_matches_torch(in_size, out_size):
    rng = np.random.RandomState(4)
    x = rng.randn(2, in_size, in_size, 3).astype(np.float32)
    ours = C.adaptive_avg_pool(jnp.asarray(x), out_size)
    theirs = F.adaptive_avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2),
                                   out_size)
    np.testing.assert_allclose(_np(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=RTOL, atol=ATOL)


def test_batchnorm_train_mode():
    rng = np.random.RandomState(5)
    x = rng.randn(4, 6, 6, 3).astype(np.float32)
    ours = C.batchnorm({}, jnp.asarray(x))
    bn = torch.nn.BatchNorm2d(3, affine=False)
    bn.train()
    theirs = bn(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(_np(ours),
                               theirs.detach().permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_7x1_1x7_matches_torch(stride):
    """ReLU -> 1x7 conv -> 7x1 conv -> BN (operations.py:14-19)."""
    import jax

    from lctvqa.models.search import (_conv_7x1_1x7_apply,
                                      _conv_7x1_1x7_init)
    rng = np.random.RandomState(10)
    ch = 4
    x = rng.randn(3, 8, 8, ch).astype(np.float32)
    p = _conv_7x1_1x7_init(jax.random.PRNGKey(0), ch)
    ours = _conv_7x1_1x7_apply(p, jnp.asarray(x), stride, None)

    w17 = torch.tensor(_np(p["conv_1x7"]["w"])).permute(3, 2, 0, 1)
    w71 = torch.tensor(_np(p["conv_7x1"]["w"])).permute(3, 2, 0, 1)
    t = torch.relu(torch.tensor(x).permute(0, 3, 1, 2))
    t = F.conv2d(t, w17, None, stride=(1, stride), padding=(0, 3))
    t = F.conv2d(t, w71, None, stride=(stride, 1), padding=(3, 0))
    bn = torch.nn.BatchNorm2d(ch, affine=False)
    bn.train()
    theirs = bn(t).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-4)


def test_lstm_matches_torch():
    rng = np.random.RandomState(6)
    b, t, in_sz, hid = 3, 5, 4, 6
    x = rng.randn(b, t, in_sz).astype(np.float32)
    params = lstm_init(jax.random.PRNGKey(0), in_sz, hid, 1)
    h0 = rng.randn(1, b, hid).astype(np.float32)
    c0 = rng.randn(1, b, hid).astype(np.float32)
    outs, (h_n, c_n) = lstm(params, jnp.asarray(x), jnp.asarray(h0),
                            jnp.asarray(c0))

    tl = torch.nn.LSTM(in_sz, hid, 1)
    lp = params["layers"][0]
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.tensor(_np(lp["w_ih"]).T))
        tl.weight_hh_l0.copy_(torch.tensor(_np(lp["w_hh"]).T))
        tl.bias_ih_l0.copy_(torch.tensor(_np(lp["b_ih"])))
        tl.bias_hh_l0.copy_(torch.tensor(_np(lp["b_hh"])))
        t_out, (t_h, t_c) = tl(torch.tensor(x).transpose(0, 1),
                               (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(_np(outs),
                               t_out.transpose(0, 1).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(h_n), t_h.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(c_n), t_c.numpy(), rtol=1e-4, atol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(7)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, 8)
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    theirs = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=RTOL)


def test_soft_xent_matches_reference_formula():
    rng = np.random.RandomState(8)
    logits = rng.randn(8, 10).astype(np.float32)
    target = rng.rand(8, 10).astype(np.float32)
    ours = soft_xent(jnp.asarray(logits), jnp.asarray(target))
    # reference softXEnt (basic_vqa/models.py:7-10)
    logprobs = F.log_softmax(torch.tensor(logits), dim=1)
    theirs = -(torch.tensor(target) * logprobs).sum() / logits.shape[0]
    np.testing.assert_allclose(float(ours), float(theirs), rtol=RTOL)


def test_linear_and_embed():
    rng = np.random.RandomState(9)
    p = N.torch_linear_init(jax.random.PRNGKey(1), 4, 3)
    x = rng.randn(5, 4).astype(np.float32)
    ours = N.linear(p, jnp.asarray(x))
    theirs = torch.tensor(x) @ torch.tensor(_np(p["w"])) + \
        torch.tensor(_np(p["b"]))
    np.testing.assert_allclose(_np(ours), theirs.numpy(), rtol=1e-5,
                               atol=1e-5)
    e = N.embedding_init(jax.random.PRNGKey(2), 7, 3)
    ids = np.array([0, 3, 6])
    np.testing.assert_allclose(_np(N.embed(e, jnp.asarray(ids))),
                               _np(e["table"])[ids])


def test_l2_normalize_detached_norm_gradient():
    # reference detaches the norm (models.py:39-40): d/dx (x / sg(||x||))
    # = 1/||x|| elementwise
    x = jnp.asarray([3.0, 4.0])
    g = jax.grad(lambda v: N.l2_normalize(v, axis=0)[0])(x)
    np.testing.assert_allclose(_np(g), [1 / 5.0, 0.0], rtol=1e-6)
