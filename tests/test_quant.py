"""Int8 post-training quantization of the W-model serving path.

The int8 forward is NOT a bit-parity path (logits shift by quantization
error); the contract is (a) the quantization primitives are exact where
exactness is defined (round-trip of values on the int8 grid), and (b) the
end-to-end argmax answer agrees with the fp32 forward for the overwhelming
majority of random inputs at test scale. Reference: serving in the torch
reference is fp32 only (`basic_vqa/models.py`) — this path is TPU-native
capability beyond parity, gated off by default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lctvqa import quant
from lctvqa.models import vqa_w


def test_quantize_weight_roundtrip_on_grid():
    # Values already on the per-channel int8 grid must round-trip exactly.
    rng = np.random.RandomState(0)
    scale = np.array([0.01, 0.5, 2.0, 0.003], np.float32)
    ints = rng.randint(-127, 128, (3, 3, 5, 4)).astype(np.float32)
    ints[..., 0] = 0.0
    ints[0, 0, 0, 0] = 127.0  # ensure abs-max hits the grid edge per channel
    ints[..., 1:][0, 0, 0] = 127.0
    w = jnp.asarray(ints * scale)
    wq, ws = quant.quantize_weight(w, out_axis=3)
    assert wq.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(ws), scale, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(wq), ints.astype(np.int8))


def test_quantize_act_bounds_and_scale():
    x = jnp.asarray(np.random.RandomState(1).randn(16, 7).astype(np.float32))
    xq, s = quant.quantize_act(x)
    assert xq.dtype == jnp.int8
    # abs-max maps to +/-127 and dequantized error is bounded by s/2
    np.testing.assert_allclose(float(s), float(jnp.max(jnp.abs(x))) / 127.0,
                               rtol=1e-6)
    err = np.abs(np.asarray(xq, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) / 2 + 1e-7


def test_quantize_act_per_sample_outlier_isolation():
    # One 1000x outlier sample must not flatten the other samples' grid.
    rng = np.random.RandomState(5)
    x = rng.randn(8, 6, 6, 4).astype(np.float32)
    x[0] *= 1000.0
    xq, s = quant.quantize_act(jnp.asarray(x), per_sample=True)
    assert s.shape == (8, 1, 1, 1)
    deq = np.asarray(xq, np.float32) * np.asarray(s)
    for i in range(8):
        err = np.abs(deq[i] - x[i]).max()
        assert err <= float(s[i, 0, 0, 0]) / 2 + 1e-6
    # per-tensor on the same input: non-outlier rows lose the grid entirely
    _, s_t = quant.quantize_act(jnp.asarray(x))
    assert float(s_t) > 100 * float(s[1, 0, 0, 0])


def test_conv_linear_int8_close_to_fp32():
    rng = np.random.RandomState(2)
    p = {"w": jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.randn(2, 10, 10, 8).astype(np.float32))
    from lctvqa.ops import conv as C
    ref = C.conv2d(p, x, stride=1, padding=1)
    got = quant.conv2d_int8(quant._q_conv_params(p), x, stride=1, padding=1)
    # int8 grid: relative error a few percent, not fp tolerance
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel

    lp = {"w": jnp.asarray(rng.randn(24, 12).astype(np.float32) * 0.1),
          "b": jnp.asarray(rng.randn(12).astype(np.float32) * 0.1)}
    lx = jnp.asarray(rng.randn(4, 24).astype(np.float32))
    from lctvqa.ops import nn as N
    lref = N.linear(lp, lx)
    lgot = quant.linear_int8(quant._q_linear_params(lp), lx)
    lrel = float(jnp.linalg.norm(lgot - lref) / jnp.linalg.norm(lref))
    assert lrel < 0.03, lrel


@pytest.fixture(scope="module")
def w_setup(tiny_cfg):
    import dataclasses
    # VGG19's 5 maxpools need >=32px input
    cfg = dataclasses.replace(tiny_cfg.model, img_size=32)
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(16, cfg.img_size, cfg.img_size, 3)
                      .astype(np.float32))
    qst = jnp.asarray(rng.randint(0, cfg.qst_vocab_size, (16, cfg.max_qst_len))
                      .astype(np.int32))
    return cfg, params, img, qst


def test_w_forward_int8_answer_agreement(w_setup):
    cfg, params, img, qst = w_setup
    ref = vqa_w.w_forward(params, cfg, img, qst, deterministic=True)
    qparams = quant.quantize_w_model(params)
    got = quant.w_forward_int8(qparams, cfg, img, qst)
    assert got.shape == ref.shape and got.dtype == jnp.float32
    agree = float(jnp.mean(jnp.argmax(got, 1) == jnp.argmax(ref, 1)))
    # random-init tiny model = near-worst case (logit gaps are tiny);
    # demand majority agreement here, report the real number on chip.
    assert agree >= 0.75, agree
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.25, rel


def test_quantized_tree_is_int8(w_setup):
    cfg, params, _, _ = w_setup
    qparams = quant.quantize_w_model(params)
    for p in qparams["vgg"]["features"]:
        assert p["w_q"].dtype == jnp.int8 and p["w_s"].ndim == 1
    for k in ("img_fc", "fc1", "fc2"):
        assert qparams[k]["w_q"].dtype == jnp.int8
    # question encoder untouched
    assert jax.tree_util.tree_structure(
        qparams["qst"]) == jax.tree_util.tree_structure(params["qst"])


def test_w_forward_int8_jits(w_setup):
    cfg, params, img, qst = w_setup
    qparams = quant.quantize_w_model(params)
    f = jax.jit(lambda qp, i, q: quant.w_forward_int8(qp, cfg, i, q))
    out = f(qparams, img, qst)
    assert np.isfinite(np.asarray(out)).all()


def test_ef_derived_int8_agreement(tiny_cfg):
    """The derived (retrained-genotype) EF net serves int8 through the
    same dispatch — the search -> retrain -> serve loop's last leg."""
    import dataclasses

    from lctvqa.models import vqa_ef
    from lctvqa.models.genotypes import PC_DARTS_cifar

    cfg = dataclasses.replace(tiny_cfg.model, arch_type="derived",
                              genotype=PC_DARTS_cifar, darts_layers=3)
    params, arch = vqa_ef.init_ef_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(8, cfg.img_size, cfg.img_size, 3)
                      .astype(np.float32))
    qst = jnp.asarray(rng.randint(0, cfg.qst_vocab_size, (8, cfg.max_qst_len))
                      .astype(np.int32))
    ref_ans, ref_qst = vqa_ef.ef_forward(params, arch, cfg, img, qst,
                                         deterministic=True)
    qparams = quant.quantize_model(params)
    got_ans, got_qst = jax.jit(
        lambda qp, i, q: quant.ef_forward_int8(qp, arch, cfg, i, q)
    )(qparams, img, qst)
    rel = float(jnp.linalg.norm(got_ans - ref_ans)
                / jnp.linalg.norm(ref_ans))
    assert rel < 0.25, rel
    agree = float(jnp.mean(jnp.argmax(got_ans, 1) == jnp.argmax(ref_ans, 1)))
    assert agree >= 0.75, agree
    # depthwise convs of the derived cells stay fp ("w" key survives)
    cell0 = qparams["derived"]["cells"][0]
    dw = [op["dw1"] for op in cell0["ops"] if "dw1" in op]
    assert dw and all("w" in p and "w_q" not in p for p in dw)
    # pointwise convs are quantized
    pw = [op["pw1"] for op in cell0["ops"] if "pw1" in op]
    assert pw and all("w_q" in p for p in pw)
    # generate runs over the int8 trunk (tokens from the fp decode path)
    gen_q, gen_a = quant.ef_generate_int8(qparams, arch, cfg, img)
    assert gen_q.shape == (8, cfg.max_qst_len)
    assert np.isfinite(np.asarray(gen_a)).all()


def test_quantize_model_refuses_supernet(tiny_cfg):
    from lctvqa.models import vqa_ef
    params, _ = vqa_ef.init_ef_model(jax.random.PRNGKey(0), tiny_cfg.model)
    with pytest.raises(AssertionError):
        quant.quantize_model(params)


def test_unified_int8_agreement(tiny_cfg):
    """Unified model: the 'qa' recurrent subtree stays fp; VGG trunk +
    img_fc quantize; the next-token forward agrees with fp32."""
    import dataclasses

    from lctvqa.models import unified

    cfg = dataclasses.replace(tiny_cfg.model, arch_type="fixed",
                              img_size=32)
    params, _arch = unified.init_unified_model(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_model(params)
    assert jax.tree_util.tree_structure(
        qparams["qa"]) == jax.tree_util.tree_structure(params["qa"])
    assert "w_q" in qparams["img_fc"]
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    qa = jnp.asarray(rng.randint(0, cfg.qst_vocab_size, (4, 8))
                     .astype(np.int32))
    ref = unified.unified_forward(params, None, cfg, img, qa)
    got = unified.unified_forward(qparams, None, cfg, img, qa)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.25, rel
