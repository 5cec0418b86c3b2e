"""LSTM: torch-compatible cell math, `lax.scan` over time.

The reference uses cuDNN `nn.LSTM` (`basic_vqa/models.py:52`,
`models_lct.py:86`). Here the sequence dimension is a `lax.scan` compiled
once by XLA; the cell is two MXU matmuls plus fused elementwise gates.
Gate order matches torch (i, f, g, o) so weights convert 1:1.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lctvqa.ops.nn import uniform


def lstm_init(key, input_size: int, hidden_size: int, num_layers: int = 1):
    """Params: list of per-layer dicts. Torch init U(-k,k), k=1/sqrt(H).

    Weight layout is transposed vs torch ([in, 4H] not [4H, in]) so the cell
    is a plain `x @ w`.
    """
    k = 1.0 / math.sqrt(hidden_size)
    layers = []
    for l in range(num_layers):
        in_sz = input_size if l == 0 else hidden_size
        k0, k1, k2, k3, key = jax.random.split(key, 5)
        layers.append({
            "w_ih": uniform(k0, (in_sz, 4 * hidden_size), k),
            "w_hh": uniform(k1, (hidden_size, 4 * hidden_size), k),
            "b_ih": uniform(k2, (4 * hidden_size,), k),
            "b_hh": uniform(k3, (4 * hidden_size,), k),
        })
    return {"layers": layers}


def lstm_cell(layer_params, x, h, c, dtype=None, use_pallas=False):
    """One step. x [B, in], h/c [B, H] -> (h', c'). Torch gate order i,f,g,o.

    use_pallas routes to the fused Pallas TPU kernel (ops/pallas_lstm.py).
    """
    if use_pallas:
        from lctvqa.ops.pallas_lstm import lstm_cell_pallas
        return lstm_cell_pallas(layer_params, x, h, c, dtype=dtype)
    w_ih, w_hh = layer_params["w_ih"], layer_params["w_hh"]
    if dtype is not None:
        x, h = x.astype(dtype), h.astype(dtype)
        w_ih, w_hh = w_ih.astype(dtype), w_hh.astype(dtype)
    gates = (jnp.dot(x, w_ih, preferred_element_type=jnp.float32)
             + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
             + layer_params["b_ih"] + layer_params["b_hh"])
    hid = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[..., 0 * hid:1 * hid])
    f = jax.nn.sigmoid(gates[..., 1 * hid:2 * hid])
    g = jnp.tanh(gates[..., 2 * hid:3 * hid])
    o = jax.nn.sigmoid(gates[..., 3 * hid:4 * hid])
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(params, xs, h0=None, c0=None, dtype=None, use_pallas=False):
    """Run a (possibly stacked) LSTM over a batch-major sequence.

    xs: [B, T, in]. h0/c0: [num_layers, B, H] or None (zeros).
    Returns (outputs [B, T, H], (h_n, c_n) each [num_layers, B, H]).
    """
    layers = params["layers"]
    num_layers = len(layers)
    b = xs.shape[0]
    hid = layers[0]["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((num_layers, b, hid), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((num_layers, b, hid), jnp.float32)

    seq = jnp.swapaxes(xs, 0, 1)  # time-major for scan
    h_ns, c_ns = [], []
    for l, lp in enumerate(layers):
        def step(carry, x_t, lp=lp):
            h, c = carry
            h2, c2 = lstm_cell(lp, x_t, h, c, dtype=dtype,
                               use_pallas=use_pallas)
            return (h2, c2), h2

        (h_n, c_n), seq = jax.lax.scan(step, (h0[l], c0[l]), seq)
        h_ns.append(h_n)
        c_ns.append(c_n)
    outputs = jnp.swapaxes(seq, 0, 1)
    return outputs, (jnp.stack(h_ns), jnp.stack(c_ns))


def lstm_generate(params, embed_fn, head_fn, start_ids, h0, c0, length: int,
                  rng: Optional[jax.Array] = None,
                  temperature: float = 0.1,
                  deterministic: bool = True,
                  dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Autoregressive decode, the reference's 30-step Python loop
    (`basic_vqa/models_lct.py:146-155`) as ONE `lax.scan`.

    embed_fn: ids [B] -> [B, E] (includes the reference's tanh).
    head_fn:  h [B, H] -> logits [B, V] (includes the tanh before fc2).
    Sampling is greedy argmax or temperature categorical; emitted token ids
    are integers, hence non-differentiable by construction — gradients reach
    the caller only through logits computed from them (the property tested in
    `basic_vqa/models_lct.py:317-331`).

    Returns (tokens [B, length] int32, last-step logits [B, V]).
    """
    assert len(params["layers"]) == 1, "generate supports num_layers=1"
    lp = params["layers"][0]

    def step(carry, step_rng):
        h, c, tok = carry
        x = embed_fn(tok)
        h2, c2 = lstm_cell(lp, x, h, c, dtype=dtype)
        logits = head_fn(h2)
        if deterministic:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            nxt = jax.random.categorical(step_rng, logits / temperature,
                                         axis=-1)
        nxt = nxt.astype(jnp.int32)
        return (h2, c2, nxt), nxt

    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_rngs = jax.random.split(rng, length)
    (_, _, _), tokens = jax.lax.scan(
        step, (h0, c0, start_ids.astype(jnp.int32)), step_rngs)
    return jnp.swapaxes(tokens, 0, 1), None
