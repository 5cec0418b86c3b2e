"""Edge-batched ("fused") PC-DARTS cell execution — the north-star
"single batched weighted-op kernel" (BASELINE.json).

The naive cell runs 8 ops per edge x up to 14 edges = ~170 small convs on
C/k (= 4..16) channels; on TPU each pads its channel dim onto 128 lanes,
so MXU/VPU utilization is a few percent and runtime is per-op overhead.
Here all edges of a node group (same source-states set, same stride) are
CONCATENATED ALONG CHANNELS and each of the 8 primitives runs ONCE per
group:

- depthwise convs: kernels concatenated per edge; feature_group_count ==
  channel count is the depthwise fast path on TPU;
- pointwise 1x1 convs: batched matmuls over an explicit edge axis
  (einsum 'bhwec,ecd->bhwed') — plain MXU GEMMs, NOT grouped convs, which
  XLA lowers poorly (especially their gradients);
- pools / identity / zero: elementwise on the stacked tensor;
- BatchNorm (affine=False) computes per-channel statistics, so stats over
  the stacked layout are identical to per-edge BN.

The alpha-weighted op mixture and beta-weighted edge sum contract in one
einsum each. Numerical-equality tests vs the reference-shaped path live in
tests/test_search_fused.py.

Uses the SAME parameter pytree as models/search.py — the fused path is a
pure execution strategy (`ModelConfig.fuse_mixed_ops`), not a different
model.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models.genotypes import PRIMITIVES
from lctvqa.models.search import (OUTPUT_SIZE, beta_softmax, cell_schedule,
                                  factorized_reduce_apply,
                                  relu_conv_bn_apply)
from lctvqa.ops import conv as C

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _depthwise_stacked(x, w, stride=1, padding=0, dilation=1, dtype=None):
    """Depthwise conv on stacked channels; w [k,k,1,Ctot]."""
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation), dimension_numbers=DIMNUMS,
        feature_group_count=x.shape[-1])
    return y.astype(jnp.float32)


def _pointwise_edges(x, w_e, e, cs_in, dtype=None):
    """Per-edge 1x1 convs as ONE batched matmul.

    x [B,H,W,E*cs_in]; w_e [E, cs_in, cs_out] -> [B,H,W,E*cs_out]."""
    bsz, hh, ww, _ = x.shape
    x5 = x.reshape(bsz, hh, ww, e, cs_in)
    if dtype is not None:
        x5 = x5.astype(dtype)
        w_e = w_e.astype(dtype)
    y = jnp.einsum("bhwec,ecd->bhwed", x5, w_e,
                   preferred_element_type=jnp.float32)
    return y.reshape(bsz, hh, ww, -1).astype(jnp.float32)


def _stack_dw(op_params, key):
    return jnp.concatenate([p[key]["w"] for p in op_params], axis=-1)


def _stack_pw(op_params, key):
    """[E, cs_in, cs_out] from per-edge HWIO [1,1,cs_in,cs_out]."""
    return jnp.stack([p[key]["w"][0, 0] for p in op_params])


def _sep_conv_batch(op_params: Sequence[dict], xs, stride, k, e, cs, dtype):
    pad = k // 2
    y = jnp.maximum(xs, 0.0)
    y = _depthwise_stacked(y, _stack_dw(op_params, "dw1"), stride=stride,
                           padding=pad, dtype=dtype)
    y = _pointwise_edges(y, _stack_pw(op_params, "pw1"), e, cs, dtype)
    y = C.batchnorm({}, y)
    y = jnp.maximum(y, 0.0)
    y = _depthwise_stacked(y, _stack_dw(op_params, "dw2"), stride=1,
                           padding=pad, dtype=dtype)
    y = _pointwise_edges(y, _stack_pw(op_params, "pw2"), e, cs, dtype)
    return C.batchnorm({}, y)


def _dil_conv_batch(op_params, xs, stride, k, e, cs, dtype):
    pad = k - 1
    y = jnp.maximum(xs, 0.0)
    y = _depthwise_stacked(y, _stack_dw(op_params, "dw"), stride=stride,
                           padding=pad, dilation=2, dtype=dtype)
    y = _pointwise_edges(y, _stack_pw(op_params, "pw"), e, cs, dtype)
    return C.batchnorm({}, y)


def _fact_reduce_batch(op_params, xs, e, cs, dtype):
    """E FactorizedReduces: 1x1 stride-2 convs become strided slicing +
    batched matmul; per-edge output is [conv1_out || conv2_out]."""
    y = jnp.maximum(xs, 0.0)
    w1 = _stack_pw(op_params, "conv1")   # [E, Cs, Cs//2]
    w2 = _stack_pw(op_params, "conv2")
    a = _pointwise_edges(y[:, ::2, ::2, :], w1, e, cs, dtype)
    b = _pointwise_edges(y[:, 1::2, 1::2, :], w2, e, cs, dtype)
    bsz, hh, ww, _ = a.shape
    a = a.reshape(bsz, hh, ww, e, cs // 2)
    b = b.reshape(bsz, hh, ww, e, cs // 2)
    out = jnp.concatenate([a, b], axis=-1).reshape(bsz, hh, ww, e * cs)
    return C.batchnorm({}, out)


def _fact_reduce_batch_prebn(op_params, xs, e, cs, dtype):
    """_fact_reduce_batch without the final affine-free BN (folded by the
    caller). Per-edge output channel order is [conv1_out || conv2_out],
    matching operations.py:90-104."""
    y = jnp.maximum(xs, 0.0)
    w1 = _stack_pw(op_params, "conv1")
    w2 = _stack_pw(op_params, "conv2")
    a = _pointwise_edges(y[:, ::2, ::2, :], w1, e, cs, dtype)
    b = _pointwise_edges(y[:, 1::2, 1::2, :], w2, e, cs, dtype)
    bsz, hh, ww, _ = a.shape
    a = a.reshape(bsz, hh, ww, e, cs // 2)
    b = b.reshape(bsz, hh, ww, e, cs // 2)
    return jnp.concatenate([a, b], axis=-1).reshape(bsz, hh, ww, e * cs)


def _op_batch_prebn(prim, op_params, xs, stride, e, cs, dtype):
    """One primitive over all E edges stacked on channels, WITHOUT its
    final affine-free BN (the caller folds it into the mixture weights).
    Inner BNs (sep_conv's bn1) stay — they are not final."""
    if prim == "avg_pool_3x3":
        return C.avg_pool(xs, 3, stride, 1, count_include_pad=False)
    if prim == "max_pool_3x3":
        return C.max_pool(xs, 3, stride, 1)
    if prim == "skip_connect":  # stride != 1 here
        return _fact_reduce_batch_prebn(op_params, xs, e, cs, dtype)
    if prim in ("sep_conv_3x3", "sep_conv_5x5", "sep_conv_7x7"):
        kk = int(prim[-1])
        pad = kk // 2
        y = jnp.maximum(xs, 0.0)
        y = _depthwise_stacked(y, _stack_dw(op_params, "dw1"),
                               stride=stride, padding=pad, dtype=dtype)
        y = _pointwise_edges(y, _stack_pw(op_params, "pw1"), e, cs, dtype)
        y = C.batchnorm({}, y, out_dtype=dtype)  # inner bn1 (unfoldable)
        y = jnp.maximum(y, 0.0)
        y = _depthwise_stacked(y, _stack_dw(op_params, "dw2"), stride=1,
                               padding=pad, dtype=dtype)
        return _pointwise_edges(y, _stack_pw(op_params, "pw2"), e, cs,
                                dtype)
    if prim in ("dil_conv_3x3", "dil_conv_5x5"):
        kk = int(prim[-1])
        y = jnp.maximum(xs, 0.0)
        y = _depthwise_stacked(y, _stack_dw(op_params, "dw"), stride=stride,
                               padding=kk - 1, dilation=2, dtype=dtype)
        return _pointwise_edges(y, _stack_pw(op_params, "pw"), e, cs, dtype)
    raise ValueError(f"no pre-BN batched form for {prim}")


def _edge_group_fold(mixed_params: Sequence[dict],
                     states: Sequence[jax.Array], alphas, betas,
                     stride: int, k: int, dtype, eps: float = 1e-5):
    """Edge-batched mixture with BN folding AND the beta edge-sum folded in.

    Uses three linearities at once (all exact reorderings):
      - each op's final affine-free BN folds into its mixture coefficient
        (search._mixed_fold): sum_o a_o BN(y_o) = sum_o (a_o r_o) y_o - bias;
      - the per-edge beta weight folds into the same coefficient:
        sum_e b_e sum_o a_eo BN(y_eo) = sum_o sum_e (b_e a_eo r_eo) y_eo - ...;
      - channel_shuffle is a fixed permutation shared by all edges, so it
        commutes with the beta sum and runs ONCE per node:
        sum_e b_e shuffle(concat(mix_e, rest_e))
          = shuffle(concat(sum_e b_e mix_e, sum_e b_e rest_e)).

    Each of the 8 primitives therefore executes ONCE per node group on the
    E-edge stacked channels, none of the 8 normalized intermediates is
    materialized, and the node does one shuffle. This is the "single
    batched weighted-op kernel with the architecture-weight softmax fused
    in" (BASELINE.json north star) expressed so XLA keeps fusing.
    """
    e = len(states)
    c = states[0].shape[-1]
    cs = c // k
    xs = jnp.concatenate([s[..., :cs] for s in states], axis=-1)
    # combined per-(edge, op) weight: beta_e * alpha_eo
    w_eo = (alphas.astype(jnp.float32)
            * betas.astype(jnp.float32)[:, None])          # [E, 8]
    acc = None
    bias = None
    for i, prim in enumerate(PRIMITIVES):
        w_e = jnp.repeat(w_eo[:, i], cs)                   # [E*Cs]
        if prim == "none":
            continue
        if prim == "skip_connect" and stride == 1:
            term = xs.astype(jnp.float32) * w_e            # identity, no BN
            acc = term if acc is None else acc + term
            continue
        y = _op_batch_prebn(prim, [mp[prim] for mp in mixed_params], xs,
                            stride, e, cs, dtype)
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y32), axis=(0, 1, 2)) - jnp.square(mean)
        coef = w_e * jax.lax.rsqrt(var + eps)              # [E*Cs]
        acc = y32 * coef if acc is None else acc + y32 * coef
        b = coef * mean
        bias = b if bias is None else bias + b
    mix = acc - bias
    bsz, hh, ww, _ = mix.shape
    mix = mix.reshape(bsz, hh, ww, e, cs).sum(axis=3)      # beta edge-sum
    # untouched channels: beta-weighted sum over edges
    rest = jnp.stack([s[..., cs:] for s in states], axis=3)  # [B,H,W,E,C-Cs]
    if stride != 1:
        r = rest.shape
        rest = C.max_pool(rest.reshape(r[0], r[1], r[2], -1), 2, 2)
        rest = rest.reshape(rest.shape[0], rest.shape[1], rest.shape[2],
                            e, c - cs)
    restw = jnp.einsum("e,bhwec->bhwc", betas.astype(jnp.float32),
                       rest.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    ans = jnp.concatenate([mix, restw], axis=-1)           # [B,H',W',C]
    # one shuffle per node group (the permutation commutes with the sums)
    ans = ans.reshape(*ans.shape[:-1], k, c // k)
    return jnp.swapaxes(ans, -1, -2).reshape(*ans.shape[:-2], c)


def _op_batch(prim, op_params, xs, stride, e, cs, dtype):
    """One primitive over all E edges stacked on channels."""
    if prim == "none":
        if stride == 1:
            return 0.0 * xs.astype(jnp.float32)
        return 0.0 * xs[:, ::stride, ::stride, :].astype(jnp.float32)
    if prim == "avg_pool_3x3":
        return C.batchnorm({}, C.avg_pool(xs, 3, stride, 1,
                                          count_include_pad=False))
    if prim == "max_pool_3x3":
        return C.batchnorm({}, C.max_pool(xs, 3, stride, 1))
    if prim == "skip_connect":
        if stride == 1:
            return xs.astype(jnp.float32)
        return _fact_reduce_batch(op_params, xs, e, cs, dtype)
    if prim == "sep_conv_3x3":
        return _sep_conv_batch(op_params, xs, stride, 3, e, cs, dtype)
    if prim == "sep_conv_5x5":
        return _sep_conv_batch(op_params, xs, stride, 5, e, cs, dtype)
    if prim == "dil_conv_3x3":
        return _dil_conv_batch(op_params, xs, stride, 3, e, cs, dtype)
    if prim == "dil_conv_5x5":
        return _dil_conv_batch(op_params, xs, stride, 5, e, cs, dtype)
    raise ValueError(prim)


def _edge_group(mixed_params: Sequence[dict], states: Sequence[jax.Array],
                alphas, betas, stride: int, k: int, dtype):
    """Weighted sum over a group of edges sharing one stride.

    mixed_params[e]: the per-edge MixedOp param dict (keyed by primitive).
    states[e]: the source state of edge e, [B, H, W, C].
    alphas [E, 8] softmaxed op weights; betas [E] edge weights.
    Returns the group's contribution to the node state [B, H', W', C].
    """
    e = len(states)
    c = states[0].shape[-1]
    cs = c // k
    xs = jnp.concatenate([s[..., :cs] for s in states], axis=-1)
    outs = jnp.stack([
        _op_batch(prim, [mp[prim] for mp in mixed_params], xs, stride, e,
                  cs, dtype)
        for prim in PRIMITIVES])                       # [8, B, H', W', E*Cs]
    o, bsz, hh, ww, _ = outs.shape
    outs = outs.reshape(o, bsz, hh, ww, e, cs)
    # alpha mixture per edge: [B,H,W,E,Cs]
    temp1 = jnp.einsum("eo,obhwec->bhwec", alphas.astype(jnp.float32), outs,
                       preferred_element_type=jnp.float32)
    # untouched channels, per edge
    rest = jnp.stack([s[..., cs:] for s in states], axis=3)  # [B,H,W,E,C-Cs]
    if stride != 1:
        r = rest.shape
        rest = C.max_pool(rest.reshape(r[0], r[1], r[2], -1), 2, 2)
        rest = rest.reshape(rest.shape[0], rest.shape[1], rest.shape[2],
                            e, c - cs)
    ans = jnp.concatenate([temp1, rest], axis=-1)      # [B,H',W',E,C]
    # per-edge channel shuffle (groups=k): [.., k, C/k] -> [.., C/k, k]
    ans = ans.reshape(*ans.shape[:-1], k, c // k)
    ans = jnp.swapaxes(ans, -1, -2).reshape(*ans.shape[:-2], c)
    # beta-weighted edge sum
    return jnp.einsum("e,bhwec->bhwc", betas.astype(jnp.float32), ans,
                      preferred_element_type=jnp.float32)


def cell_apply_fused(p, s0, s1, alphas, betas, steps, multiplier, reduction,
                     reduction_prev, k, dtype, fold_bn: bool = False):
    """Drop-in replacement for search.cell_apply (same params/semantics).
    fold_bn=True routes through _edge_group_fold (BN + beta folded into the
    mixture coefficients — the fast path)."""
    if reduction_prev:
        s0 = factorized_reduce_apply(p["pre0"], s0, dtype)
    else:
        s0 = relu_conv_bn_apply(p["pre0"], s0, dtype)
    s1 = relu_conv_bn_apply(p["pre1"], s1, dtype)

    group_fn = _edge_group_fold if fold_bn else _edge_group
    states = [s0, s1]
    offset = 0
    for i in range(steps):
        contributions = []
        # group this node's incoming edges by stride
        groups = {}
        for j in range(len(states)):
            stride = 2 if reduction and j < 2 else 1
            groups.setdefault(stride, []).append(j)
        for stride, idxs in groups.items():
            contributions.append(group_fn(
                [p["ops"][offset + j] for j in idxs],
                [states[j] for j in idxs],
                alphas[jnp.asarray([offset + j for j in idxs])],
                betas[jnp.asarray([offset + j for j in idxs])],
                stride, k, dtype))
        offset += len(states)
        states.append(sum(contributions))
    return jnp.concatenate(states[-multiplier:], axis=-1)


def network_apply_fused(p, arch, cfg: ModelConfig, x, dtype=None):
    """search.network_apply with fused cells."""
    s = C.conv2d(p["stem_conv"], x, stride=1, padding=1, dtype=dtype)
    s0 = s1 = C.batchnorm(p["stem_bn"], s)

    w_norm = jax.nn.softmax(arch["alphas_normal"], axis=-1)
    w_red = jax.nn.softmax(arch["alphas_reduce"], axis=-1)
    b_norm = beta_softmax(arch["betas_normal"], cfg.darts_steps)
    b_red = beta_softmax(arch["betas_reduce"], cfg.darts_steps)

    fold_bn = cfg.fold_bn_mixture and not cfg.bn_eval_stats
    for cell_p, spec in zip(p["cells"], cell_schedule(cfg)):
        al, be = (w_red, b_red) if spec["reduction"] else (w_norm, b_norm)
        s0, s1 = s1, cell_apply_fused(
            cell_p, s0, s1, al, be, cfg.darts_steps, cfg.darts_multiplier,
            spec["reduction"], spec["reduction_prev"], cfg.darts_partial_k,
            dtype, fold_bn=fold_bn)
    out = C.adaptive_avg_pool(s1, OUTPUT_SIZE)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
    return out
