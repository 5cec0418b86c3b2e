"""Post-training int8 quantization for the serving paths.

What int8 buys here, per chip measurement (scripts/bench_int8.py,
NOTES.md round-3): a 4x cut in weight memory/artifact size (575 MB
fp32 -> ~144 MB) at 100% answer agreement — NOT throughput. The v5e
MXU's nominal 2x int8 rate (394 vs 197 TOPS) did not materialize
through XLA at these shapes: the s8xs8 convs lower to a path measured
~12% SLOWER than bf16 (37.8k vs 43.1k pairs/s at batch 1024), the
dynamic-activation quantize/dequantize passes cost HBM bandwidth, and
the conv shapes (64px, <=512 ch) leave the MXU underfed either way.
int8 therefore stays an OPT-IN for memory-constrained serving (more
params per chip, smaller artifacts), never the default. Scheme:

  - weights: symmetric per-output-channel int8, scales computed once at
    quantization time (static; `ops/conv.quantize_weight`);
  - activations: symmetric per-tensor int8 with a dynamic abs-max scale
    computed on device per batch (no calibration set needed; the
    quantize/dequantize elementwise work fuses into neighboring HBM
    passes);
  - accumulation: int32 on the MXU; dequantize + bias in fp32.

Quantization is DISPATCH-based: `quantize_model` rewrites every eligible
conv/linear param dict {"w"[, "b"]} into {"w_q", "w_s"[, "b"]}, and the
shared primitives `ops/conv.conv2d` / `ops/nn.linear` route on the
"w_q" key — so the UNMODIFIED model forwards (vqa_w.w_forward,
vqa_ef.ef_forward / ef_generate over vgg, derived, or fixed encoders)
execute int8 when handed a quantized tree. Not quantized:

  - the LSTM question encoder/decoder and embeddings ("qst" subtree):
    negligible FLOP share, and quantizing recurrent state compounds
    error across steps;
  - depthwise convs (kernel [k, k, 1, C], sep/dil ops of derived cells):
    bandwidth-bound, no MXU win to buy back the quantize overhead;
  - BN layers: fp32 statistics exactly as the fp path.

This is an opt-in serving mode, NOT a parity path: logits shift by
quantization error. Answer agreement vs the fp32 forward is pinned in
tests/test_quant.py (100% at real dims, 0.36% relative logit error) and
reported by bench.py alongside the int8 throughput.

The torch reference serves fp32 only (`basic_vqa/models.py`); this
module is TPU-native capability beyond parity.
"""

from __future__ import annotations

from lctvqa.config import ModelConfig
from lctvqa.models import vqa_ef, vqa_w
from lctvqa.ops import conv as C
from lctvqa.ops import nn as N

# re-exported primitives (implementation lives beside the fp32 siblings)
quantize_weight = C.quantize_weight
quantize_act = C.quantize_act
_q_conv_params = C.quantize_conv_params
_q_linear_params = N.quantize_linear_params


def conv2d_int8(qp, x, stride: int = 1, padding: int = 0):
    """NHWC conv with int8 operands and int32 MXU accumulation."""
    return C.conv2d(qp, x, stride=stride, padding=padding)


def linear_int8(qp, x):
    return N.linear(qp, x)


def _quantize_tree(t):
    """Recursively rewrite eligible conv/linear param dicts to int8 form.

    Eligible: conv {"w" HWIO with >1 input channel per group} and linear
    {"w" [in, out], "b"}. Depthwise convs ([k, k, 1, C]) and every non-
    {w[,b]} dict (BN, LSTM, embedding) pass through untouched.
    """
    if isinstance(t, dict):
        w = t.get("w")
        if w is not None and hasattr(w, "ndim"):
            if w.ndim == 4 and w.shape[2] > 1:
                return C.quantize_conv_params(t)
            if w.ndim == 2 and "b" in t:
                return N.quantize_linear_params(t)
            return t  # depthwise conv: stays on the fp path
        return {k: _quantize_tree(v) for k, v in t.items()}
    if isinstance(t, list):
        return [_quantize_tree(v) for v in t]
    if isinstance(t, tuple):
        return tuple(_quantize_tree(v) for v in t)
    return t


def quantize_model(params) -> dict:
    """Model fp32 pytree -> int8 serving pytree (weights quantized once).

    Works for the W model, the EF model, and the unified model with a
    'fixed' (VGG19) or 'derived' (retrained genotype) image encoder. The
    recurrent subtrees ('qst' of W/EF, 'qa' of unified) are kept as-is
    (bf16/fp32 compute at serving time). The 'darts' SUPERNET is refused:
    its BN-folded mixture paths read raw "w" tensors (the supernet is a
    search artifact, not a serving model — decode the genotype and serve
    the derived net instead).
    """
    assert "darts" not in params, \
        "quantize the derived/fixed serving model, not the search supernet"
    return {k: (v if k in ("qst", "qa") else _quantize_tree(v))
            for k, v in params.items()}


# Back-compat name used by bench.py / tests for the W model specifically.
quantize_w_model = quantize_model


def w_forward_int8(qparams, cfg: ModelConfig, img, qst):
    """Deterministic serving forward, logits [B, A]. The ordinary
    vqa_w.w_forward over a quantized tree: conv2d/linear dispatch on the
    int8 params (dropout inactive; mirrors `basic_vqa/models.py:91-104`)."""
    return vqa_w.w_forward(qparams, cfg, img, qst, deterministic=True)


def ef_forward_int8(qparams, arch, cfg: ModelConfig, img, qst):
    """Deterministic EF serving forward -> (ans_logits, qst_logits)
    (models_lct.py:200-218) with the image encoder + heads in int8."""
    return vqa_ef.ef_forward(qparams, arch, cfg, img, qst,
                             deterministic=True)


def ef_generate_int8(qparams, arch, cfg: ModelConfig, img):
    """Greedy question generation + answering (models_lct.py:220-241)
    over the int8 trunk; the 30-step LSTM decode stays on the fp path."""
    return vqa_ef.ef_generate(qparams, arch, cfg, img,
                              deterministic=True, sample_deterministic=True)
