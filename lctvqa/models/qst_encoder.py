"""Question encoders.

Two variants, matching the reference:
- W-style encoder (`basic_vqa/models.py:45-68`): embed -> tanh -> LSTM from
  zero state -> cat(h_n, c_n) -> tanh -> fc -> question feature.
- EF-style encoder/decoder (`basic_vqa/models_lct.py:72-170`): the LSTM's
  initial (h, c) are BOTH the image embedding; teacher-forced forward also
  emits per-step vocab logits; `generate` decodes autoregressively.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lctvqa.ops import nn as N
from lctvqa.ops.lstm import lstm_init, lstm, lstm_cell

START_TOKEN = 2  # <start> id (vocab builder puts it at index 2)


def w_qst_encoder_init(key, qst_vocab_size, word_embed_size, embed_size,
                       num_layers, hidden_size):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "word2vec": N.embedding_init(k1, qst_vocab_size, word_embed_size),
        "lstm": lstm_init(k2, word_embed_size, hidden_size, num_layers),
        "fc": N.torch_linear_init(k3, 2 * num_layers * hidden_size,
                                  embed_size),
    }


def w_qst_encoder(params, question, dtype=None, use_pallas=False,
                  use_pallas_seq=False):
    """question int32 [B, T] -> [B, embed_size]."""
    x = jnp.tanh(N.embed(params["word2vec"], question))
    layers = params["lstm"]["layers"]
    if use_pallas_seq and len(layers) == 1:
        # only the FINAL (h, c) is consumed (models.py:56-62), so the whole
        # T-step scan collapses to one Pallas kernel (grid over time,
        # persistent h/c scratch); differentiable via its jnp-scan JVP rule
        from lctvqa.ops.pallas_lstm import lstm_seq_final_pallas
        h_n, c_n = lstm_seq_final_pallas(layers[0], x, None, None,
                                         dtype=dtype,
                                         use_pallas_fallback=use_pallas)
        feat = jnp.concatenate([h_n, c_n], axis=1)
    else:
        _, (h_n, c_n) = lstm(params["lstm"], x, dtype=dtype,
                             use_pallas=use_pallas)
        # cat(h, c) along feature, [L,B,2H] -> [B, L*2H] as in the reference
        feat = jnp.concatenate([h_n, c_n], axis=2)
        feat = jnp.swapaxes(feat, 0, 1).reshape(question.shape[0], -1)
    return N.linear(params["fc"], jnp.tanh(feat), dtype=dtype)


def ef_qst_encoder_init(key, qst_vocab_size, word_embed_size, embed_size,
                        num_layers, hidden_size):
    """fc1/fc2 use xavier_uniform + zero bias (models_lct.py:91-94)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "word2vec": N.embedding_init(k1, qst_vocab_size, word_embed_size),
        "lstm": lstm_init(k2, word_embed_size, hidden_size, num_layers),
        "fc1": N.xavier_linear_init(k3, 2 * num_layers * hidden_size,
                                    embed_size),
        "fc2": N.xavier_linear_init(k4, hidden_size, qst_vocab_size),
    }


def ef_qst_encoder(params, question, image_embedding, dtype=None,
                   use_pallas=False, use_pallas_seq=False):
    """Teacher-forced forward conditioned on the image.

    Returns (qst_feature [B, embed], qst_logits [B, T, V]).
    The image embedding seeds BOTH h0 and c0 (models_lct.py:99,107-108), so
    hidden_size must equal the image embed size.
    """
    b = question.shape[0]
    x = jnp.tanh(N.embed(params["word2vec"], question))
    layers = params["lstm"]["layers"]
    if use_pallas_seq and len(layers) == 1:
        # whole T-step recurrence as one kernel (per-step outputs variant)
        from lctvqa.ops.pallas_lstm import lstm_seq_pallas
        h0 = image_embedding.reshape(b, -1)
        outs, (h_n, c_n) = lstm_seq_pallas(layers[0], x, h0, h0,
                                           dtype=dtype,
                                           use_pallas_fallback=use_pallas)
        feat = jnp.concatenate([h_n, c_n], axis=1)
    else:
        h0 = image_embedding.reshape(1, b, -1)
        outs, (h_n, c_n) = lstm(params["lstm"], x, h0=h0, c0=h0,
                                dtype=dtype, use_pallas=use_pallas)
        feat = jnp.concatenate([h_n, c_n], axis=2)
        feat = jnp.swapaxes(feat, 0, 1).reshape(b, -1)
    qst_feature = N.linear(params["fc1"], jnp.tanh(feat), dtype=dtype)
    qst_logits = N.linear(params["fc2"], jnp.tanh(outs), dtype=dtype)
    return qst_feature, qst_logits


def ef_qst_generate(params, image_embedding, max_length: int,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True,
                    temperature: float = 0.1,
                    dtype=None, use_pallas=False,
                    use_pallas_generate: bool = False) -> jax.Array:
    """Autoregressive question generation as one `lax.scan`.

    Mirrors `models_lct.py:124-170`: the `<start>` embedding gets a tanh
    (`:137-138`) but embeddings of sampled tokens inside the loop do NOT
    (`:152-154`) — a reference quirk kept for parity. Sampled token ids are
    integers: non-differentiable by construction, so gradients to the
    caller flow only through logits recomputed from the tokens (the
    grad-flow property test of models_lct.py:317-331).

    Returns tokens int32 [B, max_length].
    """
    assert len(params["lstm"]["layers"]) == 1, "generate needs num_layers=1"
    if deterministic and use_pallas_generate:
        # whole-loop fused kernel (greedy path only; ops/pallas_generate.py)
        from lctvqa.ops import pallas_generate as PG
        table = params["word2vec"]["table"]
        hid = params["lstm"]["layers"][0]["w_hh"].shape[0]
        on_tpu = jax.default_backend() == "tpu" or PG.PALLAS_GEN_INTERPRET
        if on_tpu and PG.generate_eligible(
                image_embedding.shape[0], hid, table.shape[1],
                table.shape[0], dtype):
            return PG.greedy_generate_pallas(
                params, image_embedding, max_length, dtype=dtype,
                force_interpret=PG.PALLAS_GEN_INTERPRET)
    lp = params["lstm"]["layers"][0]
    b = image_embedding.shape[0]
    h0 = image_embedding.reshape(b, -1)
    start = jnp.full((b,), START_TOKEN, jnp.int32)
    x0 = jnp.tanh(N.embed(params["word2vec"], start))

    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_rngs = jax.random.split(rng, max_length)

    def step(carry, step_rng):
        h, c, x = carry
        h2, c2 = lstm_cell(lp, x, h, c, dtype=dtype, use_pallas=use_pallas)
        logits = N.linear(params["fc2"], jnp.tanh(h2), dtype=dtype)
        if deterministic:
            tok = jnp.argmax(logits, axis=-1)
        else:
            tok = jax.random.categorical(step_rng, logits / temperature,
                                         axis=-1)
        tok = tok.astype(jnp.int32)
        x_next = N.embed(params["word2vec"], tok)  # no tanh (quirk, see above)
        return (h2, c2, x_next), tok

    _, tokens = jax.lax.scan(step, (h0, h0, x0), step_rngs)
    return jnp.swapaxes(tokens, 0, 1)
