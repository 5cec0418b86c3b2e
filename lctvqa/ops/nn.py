"""Parameter initializers and dense primitives.

Initializer distributions mirror PyTorch defaults so training dynamics track
the reference: Linear/Conv use U(-k, k) with k = 1/sqrt(fan_in) (torch's
kaiming_uniform(a=sqrt(5)) reduces to exactly this), Embedding uses N(0, 1),
LSTM uses U(-k, k) with k = 1/sqrt(hidden). The EF question heads use
xavier_uniform with zero bias (`basic_vqa/models_lct.py:91-94`).

Params are plain nested dicts of fp32 jnp arrays; compute casts to
`dtype` (bf16 on TPU) with fp32 accumulation on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def uniform(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_init(key, in_features: int, out_features: int):
    """weight [in, out] (transposed vs torch's [out, in]), bias [out]."""
    kw, kb = jax.random.split(key)
    k = 1.0 / math.sqrt(in_features)
    return {
        "w": uniform(kw, (in_features, out_features), k),
        "b": uniform(kb, (out_features,), k),
    }


def xavier_linear_init(key, in_features: int, out_features: int):
    bound = math.sqrt(6.0 / (in_features + out_features))
    return {
        "w": uniform(key, (in_features, out_features), bound),
        "b": jnp.zeros((out_features,), jnp.float32),
    }


def embedding_init(key, vocab_size: int, embed_dim: int):
    return {"table": jax.random.normal(key, (vocab_size, embed_dim),
                                       jnp.float32)}


def quantize_linear_params(p):
    """{"w", "b"} -> {"w_q", "w_s", "b"} ([in, out], out axis 1); `linear`
    dispatches on the "w_q" key (serving-only int8 path, no derivative)."""
    from lctvqa.ops import conv as C
    wq, ws = C.quantize_weight(p["w"], out_axis=1)
    return {"w_q": wq, "w_s": ws, "b": p["b"]}


def linear(params, x, dtype=None):
    if "w_q" in params:
        # int8 serving path: dynamic act scale, int32 MXU accumulation
        from lctvqa.ops import conv as C
        xq, sx = C.quantize_act(x, per_sample=True)
        y = jax.lax.dot_general(
            xq, params["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (sx * params["w_s"]) + params["b"]
    w, b = params["w"], params["b"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def embed(params, ids):
    """ids int32 [...] -> fp32 [..., embed_dim]. Gather rides the VPU."""
    return jnp.take(params["table"], ids, axis=0)


def dropout(x, rate: float, key: Optional[jax.Array], deterministic: bool):
    """Inverted dropout matching torch.nn.Dropout semantics."""
    if deterministic or rate == 0.0:
        return x
    assert key is not None, "dropout in train mode needs an rng key"
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def l2_normalize(x, axis=-1, eps: float = 0.0):
    """x / ||x||_2 with the norm treated as a constant (reference detaches
    the norm: `basic_vqa/models.py:39-40`)."""
    norm = jax.lax.stop_gradient(
        jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True)) + eps)
    return x / norm
