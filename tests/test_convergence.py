"""Does it learn? Overfit a single batch with the jitted stage steps and
require a strictly lower loss — the cheapest end-to-end learning check."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lctvqa.config import Config, DataConfig, MeshConfig, ModelConfig, \
    TrainConfig


@pytest.fixture(scope="module")
def setup():
    model = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=32, ans_vocab_size=16, img_size=32,
        darts_init_ch=4, darts_layers=1, darts_steps=2, darts_multiplier=2,
        compute_dtype="float32", vgg_width_mult=1 / 16, vgg_fc_dim=32)
    cfg = Config(model=model,
                 train=TrainConfig(batch_size=8, learning_rate=3e-3))
    rng = np.random.RandomState(0)
    batch = {
        "image_u8": jnp.asarray(rng.randint(
            0, 256, (8, 32, 32, 3), dtype=np.uint8)),
        "question": jnp.asarray(rng.randint(
            0, 32, (8, 6)).astype(np.int32)),
        "answer_label": jnp.asarray(rng.randint(
            0, 16, (8,)).astype(np.int32)),
        "answer_multi_choice": jnp.asarray(rng.randint(
            -1, 16, (8, 10)).astype(np.int32)),
    }
    return cfg, batch


def test_stage1_overfits_one_batch(setup):
    from lctvqa.models import vqa_ef
    from lctvqa.train.steps import make_lct_steps
    cfg, batch = setup
    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, cfg.model)
    steps = make_lct_steps(cfg, unk_idx=1)
    ef_opt = steps["ef_tx"].init(ef_params)
    losses = []
    for i in range(120):
        ef_params, ef_opt, loss, _, _ = steps["stage1"](
            ef_params, arch, ef_opt, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


def test_stage2_w_model_improves(setup):
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.train.steps import make_lct_steps
    cfg, batch = setup
    key = jax.random.PRNGKey(1)
    ef_params, arch = vqa_ef.init_ef_model(key, cfg.model)
    w_params = vqa_w.init_w_model(jax.random.PRNGKey(2), cfg.model)
    steps = make_lct_steps(cfg, unk_idx=1)
    w_opt = steps["w_tx"].init(w_params)
    losses = []
    for i in range(120):
        w_params, w_opt, loss, _ = steps["stage2"](
            w_params, w_opt, ef_params, arch, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.8 * losses[0], (losses[0], losses[-1])
