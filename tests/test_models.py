"""Model property tests (ports of the reference's inline `test()` suites:
`basic_vqa/models.py:127-158`, `models_lct.py:269-373`)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lctvqa.models import search, vqa_ef, vqa_w
from lctvqa.ops.losses import soft_xent


def _batch(cfg, key, b=4):
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.normal(k1, (b, cfg.img_size, cfg.img_size, 3))
    qst = jax.random.randint(k2, (b, cfg.max_qst_len), 0,
                             cfg.qst_vocab_size)
    labels = jax.random.randint(k3, (b,), 0, cfg.ans_vocab_size)
    return img, qst, labels


def test_w_model_forward_and_frozen_vgg(tiny_cfg):
    # W model needs >=32px for the 5 VGG maxpools
    cfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                              arch_type="fixed")
    key = jax.random.PRNGKey(0)
    img, qst, labels = _batch(cfg, key)
    params = vqa_w.init_w_model(key, cfg)
    out = jax.jit(lambda p: vqa_w.w_forward(p, cfg, img, qst))(params)
    assert out.shape == (4, cfg.ans_vocab_size)

    # frozen-VGG invariant: the reference asserts exp_zero_grad=36
    # (architect_lct.py:178) — vgg has 36 leaves, all with zero grads.
    grads = jax.jit(jax.grad(
        lambda p: vqa_w.w_loss(p, cfg, img, qst, labels)))(params)
    vgg_leaves = jax.tree_util.tree_leaves(grads["vgg"])
    assert len(vgg_leaves) == 36
    assert all(float(jnp.abs(g).sum()) == 0.0 for g in vgg_leaves)
    other = [g for k in ("img_fc", "qst", "fc1", "fc2")
             for g in jax.tree_util.tree_leaves(grads[k])]
    assert all(float(jnp.abs(g).sum()) > 0.0 for g in other)


def test_w_soft_loss_runs(tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                              arch_type="fixed")
    key = jax.random.PRNGKey(1)
    img, qst, labels = _batch(cfg, key)
    params = vqa_w.init_w_model(key, cfg)
    pseudo_ans = jax.nn.softmax(
        jax.random.normal(key, (4, cfg.ans_vocab_size)) / 0.1)
    loss = jax.jit(lambda p: vqa_w.w_soft_loss(
        p, cfg, img, qst, labels, qst, pseudo_ans, 1.0))(params)
    assert np.isfinite(float(loss))


def test_ef_darts_forward_generate_shapes(tiny_cfg):
    cfg = tiny_cfg.model
    key = jax.random.PRNGKey(2)
    img, qst, labels = _batch(cfg, key)
    params, arch = vqa_ef.init_ef_model(key, cfg)
    ans, qlog = jax.jit(lambda p, a: vqa_ef.ef_forward(
        p, a, cfg, img, qst))(params, arch)
    assert ans.shape == (4, cfg.ans_vocab_size)
    assert qlog.shape == (4, cfg.max_qst_len, cfg.qst_vocab_size)
    gen_q, gen_a = jax.jit(lambda p, a: vqa_ef.ef_generate(
        p, a, cfg, img, rng=key))(params, arch)
    assert gen_q.shape == (4, cfg.max_qst_len)
    assert gen_q.dtype == jnp.int32
    assert gen_a.shape == (4, cfg.ans_vocab_size)
    # stochastic sampling path (works, unlike darts_vqa's missing import)
    gen_q2, _ = jax.jit(lambda p, a: vqa_ef.ef_generate(
        p, a, cfg, img, rng=key, sample_deterministic=False,
        temperature=0.01))(params, arch)
    assert gen_q2.shape == (4, cfg.max_qst_len)


def test_ef_fixed_encoder(tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                              arch_type="fixed", pretrained_enc=False)
    key = jax.random.PRNGKey(3)
    img, qst, labels = _batch(cfg, key)
    params, arch = vqa_ef.init_ef_model(key, cfg)
    assert arch is None
    loss, grads = jax.jit(jax.value_and_grad(
        lambda p: vqa_ef.ef_loss(p, None, cfg, img, qst, labels)))(params)
    assert np.isfinite(float(loss))
    # un-pretrained fixed encoder is trainable: vgg grads nonzero
    vgg_abs = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["vgg"]))
    assert vgg_abs > 0.0


def test_generate_gradient_flow_property(tiny_cfg):
    """The reference's key property test (models_lct.py:317-331): generated
    tokens are sampled -> non-differentiable -> EF's question head fc2 gets
    NO gradient from W's loss on the pseudo QA, while the answer-head path
    does."""
    cfg = tiny_cfg.model
    key = jax.random.PRNGKey(4)
    img, _, _ = _batch(cfg, key)
    ef_params, arch = vqa_ef.init_ef_model(key, cfg)
    w_cfg = dataclasses.replace(cfg, img_size=cfg.img_size,
                                arch_type="fixed")
    # W model on the same tiny image size would need 32px; instead score
    # pseudo answers directly through soft_xent against a fixed target —
    # the gradient path of interest is EF-side only.
    target = jax.nn.softmax(
        jax.random.normal(key, (4, cfg.ans_vocab_size)))

    def loss_fn(p):
        _, pseudo_ans = vqa_ef.ef_generate(p, arch, cfg, img, rng=key)
        return soft_xent(pseudo_ans, target)

    grads = jax.jit(jax.grad(loss_fn))(ef_params)
    fc2_abs = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["qst"]["fc2"]))
    fc1_abs = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["qst"]["fc1"]))
    ans_abs = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["fc1"]))
    assert fc2_abs == 0.0          # token sampling blocks this path
    assert fc1_abs > 0.0           # question feature path is differentiable
    assert ans_abs > 0.0           # answer head path is differentiable


def test_ef_loss_teacher_forcing_shift(tiny_cfg):
    """ef_loss must use logits[:, :-1] vs question[:, 1:]
    (models_lct.py:250-257). A question equal to argmax-shifted logits
    would give near-zero qst CE; here we just check the loss is finite and
    grads flow to the lstm."""
    cfg = tiny_cfg.model
    key = jax.random.PRNGKey(5)
    img, qst, labels = _batch(cfg, key)
    params, arch = vqa_ef.init_ef_model(key, cfg)
    grads = jax.jit(jax.grad(lambda p: vqa_ef.ef_loss(
        p, arch, cfg, img, qst, labels)))(params)
    lstm_abs = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(grads["qst"]["lstm"]))
    assert lstm_abs > 0.0
