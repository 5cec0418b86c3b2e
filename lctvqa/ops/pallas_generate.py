"""Whole-loop fused greedy decode as ONE Pallas TPU kernel.

The reference's 30-step autoregressive question generator
(`basic_vqa/models_lct.py:146-155`) runs in Stage 2 of every LCT train
step and in every val/eval batch. As a `lax.scan` it executes ~6 small
XLA ops per step (cell matmuls, vocab head, argmax, embedding gather)
whose per-step scheduling/layout overhead dominates their arithmetic
(~330 us/step measured vs ~10 us of matmul work, NOTES.md). Sequential
decode is the one hot path where a hand-fused kernel beats XLA here: this
kernel keeps h/c/x and ALL weights (LSTM, vocab head, embedding table)
resident in VMEM and runs the whole T-step loop in one invocation — per
step two MXU cell matmuls, the vocab-head matmul, an in-register first-max
argmax, and the next-token embedding row-select as a one-hot MXU matmul
(exact: selecting rows of the fp32 table).

Numerics mirror the jnp path op-for-op (same dtypes, same f32
accumulation): embeddings stay fp32, matmul operands are cast to the
compute dtype, gates/cell state accumulate in fp32. Tokens are integers —
non-differentiable by construction — so the kernel takes stop_gradient
inputs and needs no JVP/VJP; gradients reach the caller only through
logits recomputed from the tokens (the reference's own grad-flow property,
`models_lct.py:317-331`).

Greedy (argmax) sampling only: temperature sampling keeps the jnp scan
(it needs jax.random parity). Off-TPU callers fall back to the scan; tests
force interpret mode to exercise the kernel on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 80 * 1024 * 1024  # of the 100 MB Mosaic vmem limit
_VMEM_LIMIT = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)

# Test hook: run the kernel in interpret mode off-TPU (pattern shared with
# models/search.py PALLAS_MIX_INTERPRET)
PALLAS_GEN_INTERPRET = False


def generate_eligible(b: int, hid: int, emb: int, vocab: int,
                      dtype) -> bool:
    """All weights + per-step working set must fit the VMEM budget."""
    s = jnp.dtype(dtype or jnp.float32).itemsize
    footprint = (
        emb * 4 * hid * s          # w_ih
        + hid * 4 * hid * s        # w_hh
        + hid * vocab * s          # fc2 weight
        + vocab * emb * 4          # embedding table (fp32, exact rows)
        + 2 * b * vocab * 4        # logits + one-hot
        + b * 4 * hid * 4          # gates
        + 4 * b * (hid + emb) * 4  # h/c/x scratch + cell temporaries
    )
    return footprint <= _VMEM_BUDGET


def _gen_kernel(h0_ref, x0_ref, wih_ref, whh_ref, b_ref, fc2w_ref,
                fc2b_ref, emb_ref, tok_ref, h_s, c_s, x_s):
    cdt = wih_ref.dtype
    vocab = fc2w_ref.shape[-1]
    hid = h_s.shape[-1]
    steps = tok_ref.shape[-1]
    h_s[:] = h0_ref[:]
    c_s[:] = h0_ref[:]
    x_s[:] = x0_ref[:]

    # tokens accumulate in a register/VMEM value with a masked update per
    # step and ONE full store at the end: a dynamic 1-wide store on the
    # minor (lane) dim at a runtime offset is the kind of access Mosaic
    # handles worst, and the [B, T] buffer is tiny
    step_cols = jax.lax.broadcasted_iota(jnp.int32, tok_ref.shape, 1)

    def body(t, acc):
        gates = (jnp.dot(x_s[:].astype(cdt), wih_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h_s[:].astype(cdt), whh_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:])
        i = jax.nn.sigmoid(gates[:, :hid])
        f = jax.nn.sigmoid(gates[:, hid:2 * hid])
        g = jnp.tanh(gates[:, 2 * hid:3 * hid])
        o = jax.nn.sigmoid(gates[:, 3 * hid:])
        c_new = f * c_s[:] + i * g
        h_new = o * jnp.tanh(c_new)
        h_s[:] = h_new
        c_s[:] = c_new
        logits = (jnp.dot(jnp.tanh(h_new).astype(cdt), fc2w_ref[:],
                          preferred_element_type=jnp.float32)
                  + fc2b_ref[:])
        # first-max argmax (jnp.argmax tie semantics)
        m = jnp.max(logits, axis=-1, keepdims=True)
        vio = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        tok = jnp.min(jnp.where(logits == m, vio, vocab), axis=-1,
                      keepdims=True)
        acc = jnp.where(step_cols == t, tok, acc)
        # next input = exact fp32 embedding row via one-hot matmul
        onehot = (vio == tok).astype(jnp.float32)
        x_s[:] = jnp.dot(onehot, emb_ref[:],
                         preferred_element_type=jnp.float32)
        return acc

    tok_ref[:] = jax.lax.fori_loop(
        0, steps, body, jnp.zeros(tok_ref.shape, jnp.int32))


def greedy_generate_pallas(qst_params, image_embedding, max_length: int,
                           dtype=None,
                           force_interpret: bool = False) -> jax.Array:
    """Fused greedy decode. Mirrors ops.lstm-based ef_qst_generate with
    deterministic=True: h0 = c0 = image embedding, x0 = tanh(embed[start]),
    per step tok = argmax(fc2(tanh(h))), next x = embed[tok] (no tanh — the
    reference quirk, models_lct.py:152-154). Returns tokens int32 [B, T].
    """
    from lctvqa.models.qst_encoder import START_TOKEN

    assert len(qst_params["lstm"]["layers"]) == 1, \
        "pallas generate needs num_layers=1"
    lp = qst_params["lstm"]["layers"][0]
    cdt = dtype or jnp.float32
    b = image_embedding.shape[0]
    table = qst_params["word2vec"]["table"]
    h0 = image_embedding.reshape(b, -1).astype(jnp.float32)
    x0 = jnp.tanh(table[START_TOKEN])[None, :].astype(jnp.float32)
    x0 = jnp.broadcast_to(x0, (b, table.shape[1]))
    args = (
        h0,
        x0,
        lp["w_ih"].astype(cdt),
        lp["w_hh"].astype(cdt),
        (lp["b_ih"] + lp["b_hh"]).astype(jnp.float32)[None, :],
        qst_params["fc2"]["w"].astype(cdt),
        qst_params["fc2"]["b"].astype(jnp.float32)[None, :],
        table.astype(jnp.float32),
    )
    hid = h0.shape[-1]
    emb = table.shape[1]
    interpret = force_interpret or jax.default_backend() != "tpu"
    tokens = pl.pallas_call(
        _gen_kernel,
        out_shape=jax.ShapeDtypeStruct((b, max_length), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b, hid), jnp.float32),   # h
            pltpu.VMEM((b, hid), jnp.float32),   # c
            pltpu.VMEM((b, emb), jnp.float32),   # x
        ],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(*jax.lax.stop_gradient(args))
    return tokens
