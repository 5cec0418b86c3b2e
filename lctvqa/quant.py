"""Post-training int8 quantization for the W-model serving path.

TPU v5e executes int8 x int8 -> int32 on the MXU at twice the bf16
rate (394 vs 197 TOPS), so the dense compute of the serving path — the
VGG19 trunk convs plus the classifier/fusion linears, >95% of forward
FLOPs — can run int8 where the bf16 path is MXU-bound. Scheme:

  - weights: symmetric per-output-channel int8, scales computed once at
    quantization time (static);
  - activations: symmetric per-tensor int8 with a dynamic abs-max scale
    computed on device per batch (no calibration set needed; the
    quantize/dequantize elementwise work fuses into neighboring HBM
    passes);
  - accumulation: int32 on the MXU; dequantize + bias + ReLU in fp32.

The LSTM question encoder and the embedding stay in bf16 — they carry a
negligible FLOP share and quantizing recurrent state compounds error.

This is an opt-in serving mode (``--int8`` on eval/bench paths), NOT a
parity path: logits shift by quantization error. Answer agreement vs
the fp32 forward is pinned in tests/test_quant.py and reported by
bench.py alongside the int8 throughput.

The torch reference serves fp32 only (`basic_vqa/models.py`); this
module is TPU-native capability beyond parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models import vgg
from lctvqa.models.qst_encoder import w_qst_encoder
from lctvqa.ops import conv as C
from lctvqa.ops import nn as N

_EPS = 1e-12


def quantize_weight(w, out_axis: int):
    """fp32 weight -> (int8 weight, fp32 per-output-channel scale)."""
    axes = tuple(i for i in range(w.ndim) if i != out_axis)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), _EPS) / 127.0
    shape = [1] * w.ndim
    shape[out_axis] = -1
    q = jnp.clip(jnp.round(w / s.reshape(shape)), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def quantize_act(x):
    """fp32 activation -> (int8 activation, scalar fp32 scale), dynamic."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), _EPS) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _q_conv_params(p):
    wq, ws = quantize_weight(p["w"], out_axis=3)  # HWIO
    out = {"w_q": wq, "w_s": ws}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _q_linear_params(p):
    wq, ws = quantize_weight(p["w"], out_axis=1)  # [in, out]
    return {"w_q": wq, "w_s": ws, "b": p["b"]}


def conv2d_int8(qp, x, stride: int = 1, padding: int = 0):
    """NHWC conv with int8 operands and int32 MXU accumulation."""
    xq, sx = quantize_act(x)
    y = jax.lax.conv_general_dilated(
        xq, qp["w_q"], window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=C.DIMNUMS, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * qp["w_s"])
    if "b" in qp:
        y = y + qp["b"]
    return y


def linear_int8(qp, x):
    xq, sx = quantize_act(x)
    y = jax.lax.dot_general(xq, qp["w_q"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * qp["w_s"]) + qp["b"]


def quantize_w_model(params) -> dict:
    """W-model fp32 pytree -> int8 serving pytree (weights quantized once).

    Quantizes every VGG conv, fc6/fc7, img_fc, fc1, fc2; the question
    encoder subtree is kept as-is (bf16 compute at serving time).
    """
    return {
        "vgg": {
            "features": [_q_conv_params(p) for p in params["vgg"]["features"]],
            "fc6": _q_linear_params(params["vgg"]["fc6"]),
            "fc7": _q_linear_params(params["vgg"]["fc7"]),
        },
        "img_fc": _q_linear_params(params["img_fc"]),
        "fc1": _q_linear_params(params["fc1"]),
        "fc2": _q_linear_params(params["fc2"]),
        "qst": params["qst"],
    }


def _vgg19_features_int8(qvgg, x):
    """Mirror of vgg.vgg19_features (deterministic) with int8 convs."""
    conv_i = 0
    for v in vgg.VGG19_CFG:
        if v == "M":
            x = C.max_pool(x, 2, 2)
        else:
            x = conv2d_int8(qvgg["features"][conv_i], x, stride=1, padding=1)
            x = jnp.maximum(x, 0.0)
            conv_i += 1
    x = C.adaptive_avg_pool(x, 7)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    x = jnp.maximum(linear_int8(qvgg["fc6"], x), 0.0)
    return jnp.maximum(linear_int8(qvgg["fc7"], x), 0.0)


def w_forward_int8(qparams, cfg: ModelConfig, img, qst):
    """Deterministic serving forward, logits [B, A]. Mirrors
    models/vqa_w.w_forward (dropout inactive) with int8 dense compute."""
    feat = _vgg19_features_int8(qparams["vgg"], img)
    img_feature = N.l2_normalize(linear_int8(qparams["img_fc"], feat))
    dt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    qst_feature = w_qst_encoder(qparams["qst"], qst, dtype=dt,
                                use_pallas=cfg.use_pallas_lstm,
                                use_pallas_seq=cfg.pallas_seq_lstm)
    x = jnp.tanh(img_feature * qst_feature.astype(jnp.float32))
    x = jnp.tanh(linear_int8(qparams["fc1"], x))
    return linear_int8(qparams["fc2"], x)
