"""Packed-buffer transport (ops/packing.py): round-trip exactness and a
packed train-step equivalence."""

import numpy as np

import jax
import jax.numpy as jnp

from lctvqa.ops.packing import Packer, pack_step


def _tree():
    return {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": [jnp.ones((4,), jnp.float32),
              jnp.array([1, 2, 3], jnp.int32)],
        "c": {"d": jnp.zeros((2, 2, 2), jnp.bfloat16)},
    }


def test_pack_unpack_roundtrip():
    t = _tree()
    p = Packer(t)
    packed = p.pack(t)
    # one buffer per dtype
    assert set(packed) == {"float32", "int32", "bfloat16"}
    assert packed["float32"].shape == (10,)
    out = p.unpack(packed)
    for a, b in zip(jax.tree_util.tree_leaves(t),
                    jax.tree_util.tree_leaves(out)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_step_matches_unpacked():
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 3),
                               jnp.float32),
              "b": jnp.zeros((3,), jnp.float32)}
    x = jnp.asarray(np.random.RandomState(1).randn(5, 3), jnp.float32)

    def step(params, x):
        g = jax.grad(lambda p: jnp.sum((x @ p["w"] + p["b"]) ** 2))(params)
        new = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params, g)
        loss = jnp.sum((x @ new["w"] + new["b"]) ** 2)
        return new, loss

    want, want_loss = step(params, x)
    pk = Packer(params)
    packed_step = pack_step(step, (pk, None), (pk, None), donate=False)
    got_packed, got_loss = packed_step(pk.pack(params), x)
    got = pk.unpack(got_packed)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_packed_lct_stages_match_unpacked():
    """make_packed_lct_steps wrappers produce bit-identical state to the
    plain stage calls (same jitted bodies, packed transport)."""
    from lctvqa.config import Config, ModelConfig, TrainConfig
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.train.steps import make_lct_steps, make_packed_lct_steps

    model = ModelConfig(
        img_embed_size=16, word_embed_size=8, lstm_hidden_size=16,
        max_qst_len=6, qst_vocab_size=32, ans_vocab_size=16, img_size=32,
        darts_init_ch=4, darts_layers=1, darts_steps=2,
        darts_multiplier=2, compute_dtype="float32", vgg_width_mult=1 / 16,
        vgg_fc_dim=32)
    cfg = Config(model=model, train=TrainConfig(batch_size=8))
    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, model)
    w_params = vqa_w.init_w_model(jax.random.PRNGKey(1), model)
    steps = make_lct_steps(cfg, unk_idx=1)
    ef_opt = steps["ef_tx"].init(ef_params)
    w_opt = steps["w_tx"].init(w_params)
    rng = np.random.RandomState(0)
    batch = {
        "image_u8": rng.randint(0, 256, (8, 32, 32, 3), dtype=np.uint8),
        "question": rng.randint(0, 32, (8, 6)).astype(np.int32),
        "answer_label": rng.randint(0, 16, (8,)).astype(np.int32),
        "answer_multi_choice": rng.randint(-1, 16, (8, 10)).astype(
            np.int32),
    }
    k = jax.random.PRNGKey(7)

    p1, o1, loss1, _, _ = steps["stage1"](ef_params, arch, ef_opt, batch, k)
    w1, wo1, loss2, _ = steps["stage2"](w_params, w_opt, p1, arch, batch, k)

    pk = make_packed_lct_steps(steps, ef_params, ef_opt, w_params, w_opt)
    ef_st, efo_st, w_st, wo_st = pk["pack_state"](ef_params, ef_opt,
                                                  w_params, w_opt)
    ef_st, efo_st, ploss1, _, _ = pk["stage1"](ef_st, arch, efo_st, batch,
                                               k)
    w_st, wo_st, ploss2, _ = pk["stage2"](w_st, wo_st, ef_st, arch, batch,
                                          k)
    up, uo, uw, uwo = pk["unpack_state"](ef_st, efo_st, w_st, wo_st)

    np.testing.assert_allclose(float(ploss1), float(loss1), rtol=1e-6)
    np.testing.assert_allclose(float(ploss2), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(up)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(w1),
                    jax.tree_util.tree_leaves(uw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_pack_step_donation_reuses_buffers():
    params = {"w": jnp.ones((64,), jnp.float32)}

    def step(params):
        return ({"w": params["w"] * 2.0},)

    pk = Packer(params)
    f = pack_step(step, (pk,), (pk,), donate=True)
    packed = pk.pack(params)
    (out,) = f(packed)
    np.testing.assert_allclose(np.asarray(out["float32"]),
                               2.0 * np.ones(64), rtol=0)
