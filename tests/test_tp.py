"""Tensor-parallel (2-D data x model mesh) semantics on 8 virtual CPU
devices: megatron-split fc6/fc7 (parallel/tp.py) must reproduce the
single-device numbers exactly — forward logits, loss gradients, and the
int8 serving path — with XLA inserting the model-axis psum."""

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models import vqa_w
from lctvqa.parallel import tp


def _setup(fc_dim=32):
    # fc_dim divisible by mp=4; width 1/16 keeps the trunk tiny.
    cfg = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=32, ans_vocab_size=16, img_size=32,
        arch_type="fixed", compute_dtype="float32",
        vgg_width_mult=1 / 16, vgg_fc_dim=fc_dim)
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    img = rng.randn(8, 32, 32, 3).astype(np.float32)
    qst = rng.randint(0, 32, (8, 6)).astype(np.int32)
    labels = rng.randint(0, 16, (8,)).astype(np.int32)
    return cfg, params, img, qst, labels


def test_param_shardings_rules():
    cfg, params, *_ = _setup()
    mesh = tp.make_mesh_2d(2, 4)
    sh = tp.param_shardings(params, mesh)
    assert sh["vgg"]["fc6"]["w"].spec == jax.sharding.PartitionSpec(
        None, "model")
    assert sh["vgg"]["fc7"]["w"].spec == jax.sharding.PartitionSpec(
        "model", None)
    assert sh["vgg"]["fc7"]["b"].spec == jax.sharding.PartitionSpec()
    assert sh["fc1"]["w"].spec == jax.sharding.PartitionSpec()
    # structure mirrors params exactly (device_put contract)
    assert (jax.tree_util.tree_structure(sh)
            == jax.tree_util.tree_structure(params))


def test_tp_forward_matches_single_device():
    cfg, params, img, qst, labels = _setup()

    def fwd(p, i, q):
        return vqa_w.w_forward(p, cfg, i, q, deterministic=True)

    ref = jax.jit(fwd)(params, jnp.asarray(img), jnp.asarray(qst))

    mesh = tp.make_mesh_2d(2, 4)
    tparams = tp.shard_params(params, mesh)
    bs = tp.batch_sharding(mesh)
    out = jax.jit(fwd)(tparams, jax.device_put(img, bs),
                       jax.device_put(qst, bs))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_tp_pure_model_parallel_serving():
    """mp=8, dp=1: batch replicated, classifier sharded 8-way — the
    serving layout when one request batch spans the whole slice."""
    cfg, params, img, qst, labels = _setup()

    def fwd(p, i, q):
        return vqa_w.w_forward(p, cfg, i, q, deterministic=True)

    ref = jax.jit(fwd)(params, jnp.asarray(img), jnp.asarray(qst))
    mesh = tp.make_mesh_2d(1, 8)
    tparams = tp.shard_params(params, mesh)
    rep = tp.replicated(mesh)
    out = jax.jit(fwd)(tparams, jax.device_put(img, rep),
                       jax.device_put(qst, rep))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_tp_grads_match_single_device():
    """Loss gradients under dp x mp (with dropout rng active) equal the
    single-device gradients leaf-for-leaf."""
    cfg, params, img, qst, labels = _setup()
    key = jax.random.PRNGKey(7)

    def loss(p, i, q, y):
        return vqa_w.w_loss(p, cfg, i, q, y, rng=key, deterministic=False)

    g_ref = jax.jit(jax.grad(loss))(params, jnp.asarray(img),
                                    jnp.asarray(qst), jnp.asarray(labels))

    mesh = tp.make_mesh_2d(2, 4)
    tparams = tp.shard_params(params, mesh)
    bs = tp.batch_sharding(mesh)
    g_tp = jax.jit(jax.grad(loss))(tparams, jax.device_put(img, bs),
                                   jax.device_put(qst, bs),
                                   jax.device_put(labels, bs))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_stage3_tp_sharded_w_matches_single_device():
    """Tri-level stage-3 on the 2-D (data x model) mesh with W's fc6/fc7
    megatron-split (r3 verdict #7: the model axis applied to the program
    that actually exhausts HBM — stage-3's W-unroll). The arch update
    must equal single-device bit-for-tolerance; the capacity claim at
    224px is scripts/dryrun_224px_sharded.py's memory_analysis."""
    from lctvqa.config import Config, TrainConfig
    from lctvqa.models import vqa_ef
    from lctvqa.train.steps import make_lct_steps

    model = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=32, ans_vocab_size=16, img_size=32,
        darts_init_ch=4, darts_layers=1, darts_steps=2,
        darts_multiplier=2, compute_dtype="float32",
        vgg_width_mult=1 / 16, vgg_fc_dim=32)
    cfg = Config(model=model, train=TrainConfig(batch_size=8))
    rng = np.random.RandomState(3)
    batch = {
        "image_u8": rng.randint(0, 256, (8, 32, 32, 3), dtype=np.uint8),
        "question": rng.randint(0, 32, (8, 6)).astype(np.int32),
        "answer_label": rng.randint(0, 16, (8,)).astype(np.int32),
        "answer_multi_choice": rng.randint(-1, 16, (8, 10)).astype(
            np.int32),
    }
    ef_params, arch = vqa_ef.init_ef_model(jax.random.PRNGKey(5), model)
    w_params = vqa_w.init_w_model(jax.random.PRNGKey(6), model)
    steps = make_lct_steps(cfg, unk_idx=1)
    arch_opt = steps["arch_tx"].init(arch)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    lr = jnp.float32(1e-3)

    a1, _, v1 = steps["stage3"](arch, arch_opt, ef_params, w_params,
                                jb, jb, lr, lr, jax.random.PRNGKey(11))

    mesh = tp.make_mesh_2d(4, 2)
    rep = tp.replicated(mesh)
    bs = tp.batch_sharding(mesh)
    sb = {k: jax.device_put(v, bs) for k, v in batch.items()}
    a2, _, v2 = steps["stage3"](
        jax.device_put(arch, rep), jax.device_put(arch_opt, rep),
        jax.device_put(ef_params, rep), tp.shard_params(w_params, mesh),
        sb, sb, lr, lr, jax.random.PRNGKey(11))

    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for k in arch:
        np.testing.assert_allclose(np.asarray(a1[k]), np.asarray(a2[k]),
                                   rtol=2e-4, atol=1e-6)


def test_tp_int8_serving_matches_single_device():
    """The quantized tree (w_q/w_s leaves) shards under the same rules."""
    from lctvqa import quant
    cfg, params, img, qst, labels = _setup()
    qparams = quant.quantize_w_model(params)

    def fwd(p, i, q):
        return quant.w_forward_int8(p, cfg, i, q)

    ref = jax.jit(fwd)(qparams, jnp.asarray(img), jnp.asarray(qst))
    mesh = tp.make_mesh_2d(2, 4)
    tq = tp.shard_params(qparams, mesh)
    bs = tp.batch_sharding(mesh)
    out = jax.jit(fwd)(tq, jax.device_put(img, bs),
                       jax.device_put(qst, bs))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)
