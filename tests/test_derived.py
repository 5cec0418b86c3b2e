"""Derived (genotype-fixed) network: search -> derive -> retrain loop."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from lctvqa.config import small_test_config
from lctvqa.models import derived, search, vqa_ef
from lctvqa.models.genotypes import AmoebaNet, NASNet, PC_DARTS_cifar


def _cfg():
    base = small_test_config().model
    return dataclasses.replace(base, darts_init_ch=4, darts_layers=2,
                               darts_steps=4, darts_multiplier=4,
                               img_size=16)


def test_derived_network_from_preset_genotype():
    cfg = dataclasses.replace(_cfg(), arch_type="derived",
                              genotype=PC_DARTS_cifar)
    key = jax.random.PRNGKey(0)
    params = derived.derived_network_init(key, cfg, PC_DARTS_cifar)
    x = jax.random.normal(key, (2, 16, 16, 3))
    out = jax.jit(lambda p: derived.derived_network_apply(
        p, cfg, PC_DARTS_cifar, x))(params)
    assert out.shape == (2, derived.derived_out_features(cfg,
                                                         PC_DARTS_cifar))


@pytest.mark.parametrize("geno", [NASNet, AmoebaNet],
                         ids=["NASNet", "AmoebaNet"])
def test_derived_nonuniform_presets(geno):
    """NASNet/AmoebaNet: 5 nodes/cell, different normal vs reduce concat
    widths, AmoebaNet uses conv_7x1_1x7 — the genotype-aware channel
    schedule must build and run them (pcdarts/genotypes.py:16-72)."""
    cfg = dataclasses.replace(
        _cfg(), arch_type="derived", genotype=geno,
        darts_steps=len(geno.normal) // 2,
        darts_multiplier=len(geno.normal_concat))
    key = jax.random.PRNGKey(2)
    params = derived.derived_network_init(key, cfg, geno)
    x = jax.random.normal(key, (2, 16, 16, 3))
    out = jax.jit(lambda p: derived.derived_network_apply(
        p, cfg, geno, x))(params)
    assert out.shape == (2, derived.derived_out_features(cfg, geno))
    assert np.isfinite(np.asarray(out)).all()
    # gradient flows through every cell (incl. the conv_7x1_1x7 op)
    g = jax.jit(jax.grad(lambda p: jnp.sum(
        derived.derived_network_apply(p, cfg, geno, x) ** 2)))(params)
    for i, cell in enumerate(g["cells"]):
        s = sum(float(jnp.abs(leaf).sum())
                for leaf in jax.tree_util.tree_leaves(cell))
        assert s > 0.0, f"cell {i} got no gradient"


def test_derived_from_searched_genotype_trains():
    """Full loop: decode a genotype from search arch params, build the
    derived EF model, take a gradient step."""
    cfg = _cfg()
    key = jax.random.PRNGKey(1)
    arch = search.arch_init(key, cfg)
    geno = search.genotype(arch, cfg.darts_steps, cfg.darts_multiplier)
    dcfg = dataclasses.replace(cfg, arch_type="derived", genotype=geno)
    params, a = vqa_ef.init_ef_model(key, dcfg)
    assert a is None
    img = jax.random.normal(key, (2, 16, 16, 3))
    qst = jax.random.randint(key, (2, cfg.max_qst_len), 0,
                             cfg.qst_vocab_size)
    labels = jax.random.randint(key, (2,), 0, cfg.ans_vocab_size)
    loss, grads = jax.jit(jax.value_and_grad(lambda p: vqa_ef.ef_loss(
        p, None, dcfg, img, qst, labels)))(params)
    assert np.isfinite(float(loss))
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads["derived"]))
    assert total > 0.0
