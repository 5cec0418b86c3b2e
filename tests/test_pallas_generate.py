"""Whole-loop fused Pallas greedy decode vs the jnp scan.

The kernel mirrors ef_qst_generate's deterministic path op-for-op
(ops/pallas_generate.py); in f32 the token streams must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lctvqa.models import qst_encoder
from lctvqa.ops import pallas_generate as PG


def _params(key, vocab=32, emb=8, hid=16):
    return qst_encoder.ef_qst_encoder_init(
        key, qst_vocab_size=vocab, word_embed_size=emb, embed_size=hid,
        num_layers=1, hidden_size=hid), vocab, emb, hid


@pytest.mark.parametrize("vocab,emb,hid,b,t",
                         [(32, 8, 16, 4, 10), (130, 24, 48, 8, 6)],
                         ids=["tiny", "unaligned-vocab"])
def test_greedy_tokens_match_scan(vocab, emb, hid, b, t):
    params, *_ = _params(jax.random.PRNGKey(0), vocab, emb, hid)
    img = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (b, hid))
    want = qst_encoder.ef_qst_generate(params, img, t, deterministic=True)
    got = PG.greedy_generate_pallas(params, img, t, dtype=None,
                                    force_interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_route_and_fallbacks(monkeypatch):
    params, vocab, emb, hid = _params(jax.random.PRNGKey(2))
    img = jax.random.normal(jax.random.PRNGKey(3), (4, hid))
    want = qst_encoder.ef_qst_generate(params, img, 7, deterministic=True)

    monkeypatch.setattr(PG, "PALLAS_GEN_INTERPRET", True)
    calls = []
    orig = PG.greedy_generate_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(PG, "greedy_generate_pallas", spy)
    got = qst_encoder.ef_qst_generate(params, img, 7, deterministic=True,
                                      use_pallas_generate=True)
    assert calls, "kernel route not taken"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # stochastic sampling keeps the jnp scan
    calls.clear()
    qst_encoder.ef_qst_generate(params, img, 7, deterministic=False,
                                rng=jax.random.PRNGKey(4),
                                use_pallas_generate=True)
    assert not calls

    # over-budget vocab falls back
    calls.clear()
    monkeypatch.setattr(PG, "_VMEM_BUDGET", 16)
    qst_encoder.ef_qst_generate(params, img, 7, deterministic=True,
                                use_pallas_generate=True)
    assert not calls


def test_eligibility_gate():
    assert PG.generate_eligible(64, 512, 300, 8192, jnp.bfloat16)
    assert PG.generate_eligible(64, 512, 300, 16000, jnp.bfloat16)
    assert not PG.generate_eligible(64, 512, 300, 200_000, jnp.bfloat16)


def test_gradient_safe_and_equal(monkeypatch):
    """Tokens are stop-gradient ints; a loss consuming them through a
    differentiable re-encode must get the SAME gradient as the jnp-scan
    path (tokens equal in f32 => downstream grads identical)."""
    params, vocab, emb, hid = _params(jax.random.PRNGKey(5))
    img = jax.random.normal(jax.random.PRNGKey(6), (4, hid))

    monkeypatch.setattr(PG, "PALLAS_GEN_INTERPRET", True)

    def loss(p, use_kernel):
        toks = qst_encoder.ef_qst_generate(
            p, img, 6, deterministic=True,
            use_pallas_generate=use_kernel)
        feat, logits = qst_encoder.ef_qst_encoder(p, toks, img)
        return jnp.sum(feat ** 2) + jnp.sum(logits ** 2)

    g_kernel = jax.grad(lambda p: loss(p, True))(params)
    g_scan = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_kernel),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
