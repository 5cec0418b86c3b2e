"""DP mesh semantics on 8 virtual CPU devices: sharded-batch training step
equals the single-device result (losses are global-batch means, so XLA's
inserted collectives must reproduce exact data parallelism)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.config import Config, ModelConfig, TrainConfig
from lctvqa.models import vqa_ef
from lctvqa.parallel import mesh as mesh_lib
from lctvqa.train.steps import make_lct_steps


def _setup():
    model = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=32, ans_vocab_size=16, img_size=16,
        darts_init_ch=4, darts_layers=1, darts_steps=2, darts_multiplier=2,
        compute_dtype="float32", vgg_width_mult=1 / 16, vgg_fc_dim=32)
    cfg = Config(model=model, train=TrainConfig(batch_size=8))
    rng = np.random.RandomState(0)
    batch = {
        "image_u8": rng.randint(0, 256, (8, 16, 16, 3), dtype=np.uint8),
        "question": rng.randint(0, 32, (8, 6)).astype(np.int32),
        "answer_label": rng.randint(0, 16, (8,)).astype(np.int32),
        "answer_multi_choice": rng.randint(-1, 16, (8, 10)).astype(
            np.int32),
    }
    return cfg, batch


def test_sharded_stage1_matches_single_device():
    cfg, batch = _setup()
    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, cfg.model)
    steps = make_lct_steps(cfg, unk_idx=1)
    ef_opt = steps["ef_tx"].init(ef_params)

    # single device
    p1, o1, loss1, c1a, c1b = steps["stage1"](
        ef_params, arch, ef_opt, {k: jnp.asarray(v)
                                  for k, v in batch.items()},
        jax.random.PRNGKey(7))

    # 8-device mesh: batch sharded, params replicated
    mesh = mesh_lib.make_mesh(8)
    rep = mesh_lib.replicated(mesh)
    sb = mesh_lib.shard_batch(batch, mesh)
    p2, o2, loss2, c2a, c2b = steps["stage1"](
        jax.device_put(ef_params, rep), jax.device_put(arch, rep),
        jax.device_put(ef_opt, rep), sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    assert int(c1a) == int(c2a) and int(c1b) == int(c2b)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_shard_batch_layout():
    mesh = mesh_lib.make_mesh(8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = mesh_lib.shard_batch({"x": x, "name": ["a"]}, mesh)
    assert sharded["x"].sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"]), x)
    assert sharded["name"] == ["a"]


def test_process_index_range_single_process():
    from lctvqa.parallel import distributed
    r = distributed.process_index_range(10)
    assert list(r) == list(range(10))
