"""PC-DARTS search network (reference `pcdarts/model_search.py`,
`pcdarts/operations.py`) — functional JAX, NHWC.

Structure: stem conv3x3(3 -> 3C) + BN; `layers` cells with channel doubling
+ reduction at layers//3 and 2*layers//3; each cell has `steps` nodes whose
every incoming edge is a partial-channel MixedOp (ops applied to a 1/k
channel slice, untouched channels concatenated back, channel shuffle);
edge outputs are weighted by per-edge betas (softmaxed per node group) and
op outputs by alphas (softmaxed per edge). AdaptiveAvgPool(7) + flatten.

Arch parameters (alphas_normal/reduce [k_edges, 8], betas_normal/reduce
[k_edges]) live in a SEPARATE pytree from the weights — the reference also
keeps them outside `model.parameters()` (`model_search.py:187-200`).

Unlike the reference's hard-coded `output_ch=256` (`model_search.py:131`,
a quirk flagged in SURVEY.md §2.3), output dims are derived from the config.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from lctvqa.config import ModelConfig
from lctvqa.models.genotypes import Genotype, NONE_IDX, PRIMITIVES
from lctvqa.ops import conv as C

OUTPUT_SIZE = 7  # AdaptiveAvgPool2d(7) (model_search.py:130)


# --------------------------------------------------------------------------
# Primitive ops. Each op: init(key, ch, stride) -> params dict (possibly
# empty), apply(params, x, stride, dtype) -> y. BN layers inside ops are
# affine=False => parameter-free batch-stat normalization.
# --------------------------------------------------------------------------

def _sep_conv_init(key, ch, k, affine=False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "dw1": C.torch_conv_init(k1, k, k, ch, ch, groups=ch),
        "pw1": C.torch_conv_init(k2, 1, 1, ch, ch),
        "dw2": C.torch_conv_init(k3, k, k, ch, ch, groups=ch),
        "pw2": C.torch_conv_init(k4, 1, 1, ch, ch),
    }
    if affine:
        p["bn1"] = C.batchnorm_init(ch)
        p["bn2"] = C.batchnorm_init(ch)
    return p


def _sep_conv_apply(p, x, stride, k, dtype):
    pad = k // 2
    y = jnp.maximum(x, 0.0)
    y = C.depthwise_conv2d(p["dw1"], y, stride=stride, padding=pad,
                           dtype=dtype)
    y = C.conv2d(p["pw1"], y, dtype=dtype)
    y = C.batchnorm(p.get("bn1", {}), y, out_dtype=dtype)
    y = jnp.maximum(y, 0.0)
    y = C.depthwise_conv2d(p["dw2"], y, stride=1, padding=pad, dtype=dtype)
    y = C.conv2d(p["pw2"], y, dtype=dtype)
    return C.batchnorm(p.get("bn2", {}), y, out_dtype=dtype)


def _dil_conv_init(key, ch, k, affine=False):
    k1, k2 = jax.random.split(key)
    p = {
        "dw": C.torch_conv_init(k1, k, k, ch, ch, groups=ch),
        "pw": C.torch_conv_init(k2, 1, 1, ch, ch),
    }
    if affine:
        p["bn"] = C.batchnorm_init(ch)
    return p


def _dil_conv_apply(p, x, stride, k, dtype):
    pad = k - 1  # dilation 2: pad 2 for k=3, pad 4 for k=5
    y = jnp.maximum(x, 0.0)
    y = C.depthwise_conv2d(p["dw"], y, stride=stride, padding=pad,
                           dilation=2, dtype=dtype)
    y = C.conv2d(p["pw"], y, dtype=dtype)
    return C.batchnorm(p.get("bn", {}), y, out_dtype=dtype)


def _conv_7x1_1x7_init(key, ch, affine=False):
    """ReLU -> 1x7 conv -> 7x1 conv -> BN (operations.py:14-19; used by the
    AmoebaNet preset genotype)."""
    k1, k2 = jax.random.split(key)
    p = {
        "conv_1x7": C.torch_conv_init(k1, 1, 7, ch, ch),
        "conv_7x1": C.torch_conv_init(k2, 7, 1, ch, ch),
    }
    if affine:
        p["bn"] = C.batchnorm_init(ch)
    return p


def _conv_7x1_1x7_apply(p, x, stride, dtype):
    y = jnp.maximum(x, 0.0)
    y = C.conv2d(p["conv_1x7"], y, stride=(1, stride),
                 padding=((0, 0), (3, 3)), dtype=dtype)
    y = C.conv2d(p["conv_7x1"], y, stride=(stride, 1),
                 padding=((3, 3), (0, 0)), dtype=dtype)
    return C.batchnorm(p.get("bn", {}), y, out_dtype=dtype)


def factorized_reduce_init(key, c_in, c_out, affine=False):
    assert c_out % 2 == 0
    k1, k2 = jax.random.split(key)
    p = {
        "conv1": C.torch_conv_init(k1, 1, 1, c_in, c_out // 2),
        "conv2": C.torch_conv_init(k2, 1, 1, c_in, c_out // 2),
    }
    if affine:
        p["bn"] = C.batchnorm_init(c_out)
    return p


def factorized_reduce_apply(p, x, dtype):
    """Two stride-2 1x1 convs on pixel-offset views, concat, BN
    (operations.py:90-104)."""
    y = jnp.maximum(x, 0.0)
    a = C.conv2d(p["conv1"], y, stride=2, dtype=dtype)
    b = C.conv2d(p["conv2"], y[:, 1:, 1:, :], stride=2, dtype=dtype)
    return C.batchnorm(p.get("bn", {}), jnp.concatenate([a, b], axis=-1),
                       out_dtype=dtype)


def relu_conv_bn_init(key, c_in, c_out, affine=False):
    p = {"conv": C.torch_conv_init(key, 1, 1, c_in, c_out)}
    if affine:
        p["bn"] = C.batchnorm_init(c_out)
    return p


def relu_conv_bn_apply(p, x, dtype):
    y = jnp.maximum(x, 0.0)
    y = C.conv2d(p["conv"], y, dtype=dtype)
    return C.batchnorm(p.get("bn", {}), y, out_dtype=dtype)


def op_init(key, prim: str, ch: int, stride: int, affine: bool = False):
    if prim == "sep_conv_3x3":
        return _sep_conv_init(key, ch, 3, affine)
    if prim == "sep_conv_5x5":
        return _sep_conv_init(key, ch, 5, affine)
    if prim == "sep_conv_7x7":
        return _sep_conv_init(key, ch, 7, affine)
    if prim == "dil_conv_3x3":
        return _dil_conv_init(key, ch, 3, affine)
    if prim == "dil_conv_5x5":
        return _dil_conv_init(key, ch, 5, affine)
    if prim == "conv_7x1_1x7":
        return _conv_7x1_1x7_init(key, ch, affine)
    if prim == "skip_connect" and stride != 1:
        return factorized_reduce_init(key, ch, ch, affine)
    return {}  # none / pools / identity have no parameters


def op_apply(p, prim: str, x, stride: int, dtype):
    acc = jnp.float32 if dtype is None else dtype
    if prim == "none":
        if stride == 1:
            return 0.0 * x.astype(acc)
        return 0.0 * x[:, ::stride, ::stride, :].astype(acc)
    if prim == "avg_pool_3x3":
        return C.batchnorm({}, C.avg_pool(x, 3, stride, 1,
                                          count_include_pad=False),
                           out_dtype=dtype)
    if prim == "max_pool_3x3":
        return C.batchnorm({}, C.max_pool(x, 3, stride, 1), out_dtype=dtype)
    if prim == "skip_connect":
        if stride == 1:
            return x
        return factorized_reduce_apply(p, x, dtype)
    if prim == "sep_conv_3x3":
        return _sep_conv_apply(p, x, stride, 3, dtype)
    if prim == "sep_conv_5x5":
        return _sep_conv_apply(p, x, stride, 5, dtype)
    if prim == "sep_conv_7x7":
        return _sep_conv_apply(p, x, stride, 7, dtype)
    if prim == "dil_conv_3x3":
        return _dil_conv_apply(p, x, stride, 3, dtype)
    if prim == "dil_conv_5x5":
        return _dil_conv_apply(p, x, stride, 5, dtype)
    if prim == "conv_7x1_1x7":
        return _conv_7x1_1x7_apply(p, x, stride, dtype)
    raise ValueError(f"unknown primitive {prim}")


# --------------------------------------------------------------------------
# MixedOp: partial-channel weighted op mixture (model_search.py:27-55)
# --------------------------------------------------------------------------

def channel_shuffle(x, groups: int):
    """NHWC channel shuffle, same index mapping as model_search.py:11-25."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


def mixed_op_init(key, ch: int, stride: int, k: int):
    keys = jax.random.split(key, len(PRIMITIVES))
    return {prim: op_init(kk, prim, ch // k, stride)
            for prim, kk in zip(PRIMITIVES, keys)}


def _op_prebn(p, prim: str, x, stride: int, dtype):
    """The primitive WITHOUT its final affine-free BN (which _mixed_fold
    folds into the alpha mixture). Inner BNs (sep_conv's bn1) stay.

    All convs materialize at the compute dtype (out_dtype=dtype): the
    search net is HBM-bound, so fp32 round-trips between back-to-back
    convs are pure wasted bandwidth — BN statistics downstream accumulate
    in fp32 regardless."""
    od = dtype  # None -> fp32 (parity-test mode)
    if prim == "avg_pool_3x3":
        return C.avg_pool(x, 3, stride, 1, count_include_pad=False)
    if prim == "max_pool_3x3":
        return C.max_pool(x, 3, stride, 1)
    if prim == "skip_connect":  # stride != 1 here (factorized reduce)
        y = jnp.maximum(x, 0.0)
        a = C.conv2d(p["conv1"], y, stride=2, dtype=dtype, out_dtype=od)
        b = C.conv2d(p["conv2"], y[:, 1:, 1:, :], stride=2, dtype=dtype,
                     out_dtype=od)
        return jnp.concatenate([a, b], axis=-1)
    if prim in ("sep_conv_3x3", "sep_conv_5x5", "sep_conv_7x7"):
        k = int(prim[-1])
        pad = k // 2
        y = jnp.maximum(x, 0.0)
        y = C.depthwise_conv2d(p["dw1"], y, stride=stride, padding=pad,
                               dtype=dtype, out_dtype=od)
        y = C.conv2d(p["pw1"], y, dtype=dtype, out_dtype=od)
        y = C.batchnorm({}, y, out_dtype=dtype)   # inner bn1 (unfoldable)
        y = jnp.maximum(y, 0.0)
        y = C.depthwise_conv2d(p["dw2"], y, stride=1, padding=pad,
                               dtype=dtype, out_dtype=od)
        return C.conv2d(p["pw2"], y, dtype=dtype, out_dtype=od)
    if prim in ("dil_conv_3x3", "dil_conv_5x5"):
        k = int(prim[-1])
        y = jnp.maximum(x, 0.0)
        y = C.depthwise_conv2d(p["dw"], y, stride=stride, padding=k - 1,
                               dilation=2, dtype=dtype, out_dtype=od)
        return C.conv2d(p["pw"], y, dtype=dtype, out_dtype=od)
    raise ValueError(f"no pre-BN form for {prim}")


def _mixed_fold(p, x, weights, stride: int, dtype, eps: float = 1e-5):
    """alpha-mixture with every op's FINAL affine-free BN folded in:

        sum_o a_o * BN(y_o) = sum_o (a_o * r_o) * y_o - sum_o a_o r_o mu_o
        with r_o = rsqrt(var_o + eps)

    Numerically the same math reordered, but the 8 normalized intermediates
    are never materialized: each y_o is read twice (stats + scaled sum)
    instead of XLA's 3 reads + 1 full-size write per op — the BN traffic
    the profile shows the search net is bound on (NOTES.md). Pure XLA, so
    everything keeps fusing (no custom-call barriers).

    'none' contributes an exact 0 (skipped); stride-1 skip_connect is the
    raw identity (no BN in the reference either)."""
    terms = []
    bias = None
    for i, prim in enumerate(PRIMITIVES):
        a = weights[i].astype(jnp.float32)
        if prim == "none":
            continue
        if prim == "skip_connect" and stride == 1:
            terms.append(a * x.astype(jnp.float32))
            continue
        y = _op_prebn(p[prim], prim, x, stride, dtype)
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y32), axis=(0, 1, 2)) - jnp.square(mean)
        coef = a * jax.lax.rsqrt(var + eps)           # [Cs]
        terms.append(y32 * coef)
        b = coef * mean
        bias = b if bias is None else bias + b
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out - bias


# The four depthwise-separable primitives share the chain shape
# relu -> depthwise -> pointwise [-> BN -> relu -> depthwise -> pointwise];
# _mixed_fold_packed runs them as ONE packed chain (see its docstring).
_PACKED_BRANCHES = ("sep_conv_3x3", "sep_conv_5x5",
                    "dil_conv_3x3", "dil_conv_5x5")
_SEP_MASK_PATTERN = (1.0, 1.0, 0.0, 0.0)   # which branches have stage 2


def _packed_dw1_kernel(p, cs: int):
    """[9,9,1,Cs*NB] depthwise kernel embedding each branch's FIRST
    depthwise filter centered (dilated taps expanded). Output channel
    c*NB + b is branch b applied to input channel c — the (c-major,
    b-minor) order XLA's grouped conv produces."""
    nb = len(_PACKED_BRANCHES)
    kern = jnp.zeros((9, 9, 1, cs * nb), jnp.float32)
    specs = (("sep_conv_3x3", "dw1", 3, 1), ("sep_conv_5x5", "dw1", 5, 1),
             ("dil_conv_3x3", "dw", 3, 2), ("dil_conv_5x5", "dw", 5, 2))
    ctr = 4
    for b, (prim, name, kk, dil) in enumerate(specs):
        half = (kk - 1) // 2 * dil
        sl = slice(ctr - half, ctr + half + 1, dil)
        kern = kern.at[sl, sl, :, b::nb].set(p[prim][name]["w"])
    return kern


def _packed_dw2_kernel(p, cs: int):
    """[5,5,1,Cs*NB] second-stage depthwise kernel: sep branches get their
    dw2 filter (centered), dil branches a delta (identity)."""
    nb = len(_PACKED_BRANCHES)
    kern = jnp.zeros((5, 5, 1, cs * nb), jnp.float32)
    kern = kern.at[1:4, 1:4, :, 0::nb].set(p["sep_conv_3x3"]["dw2"]["w"])
    kern = kern.at[:, :, :, 1::nb].set(p["sep_conv_5x5"]["dw2"]["w"])
    kern = kern.at[2, 2, :, 2::nb].set(1.0)
    kern = kern.at[2, 2, :, 3::nb].set(1.0)
    return kern


def _packed_pw_matrix(blocks, cs: int):
    """Block-diagonal-by-branch [Cs*NB, Cs*NB] pointwise matrix in the
    interleaved (c-major, b-minor) channel order. `None` block = identity.
    Runs as ONE dense 1x1 conv — the zero blocks ride the MXU for free and
    no channel de-interleave copy is ever needed."""
    nb = len(blocks)
    m = jnp.zeros((cs * nb, cs * nb), jnp.float32)
    eye = None
    for b, w in enumerate(blocks):
        if w is None:
            eye = jnp.eye(cs, dtype=jnp.float32) if eye is None else eye
            blk = eye
        else:
            blk = w[0, 0]                     # [1,1,Cs,Cs] -> [ci,co]
        m = m.at[b::nb, b::nb].set(blk)
    return m


def _mixed_fold_packed(p, x, weights, stride: int, dtype,
                       eps: float = 1e-5):
    """_mixed_fold with the four depthwise-separable branches packed into
    one chain:

        relu(x)                                   (shared: all 4 branches)
        -> one grouped 9x9 depthwise conv         (kernels embedded centered,
           [N,H',W',4*Cs], stride s)               dilation expanded)
        -> one block-diagonal dense 1x1 conv      (pw1 of each branch)
        -> masked inner BN + ReLU                 (sep branches only; dil
                                                   channels pass through)
        -> one grouped 5x5 depthwise conv         (sep dw2; delta for dil)
        -> one block-diagonal dense 1x1 conv      (sep pw2; identity for dil)
        -> fold final BNs + alphas per channel, contract the branch axis

    Why: after BN folding the search net is layout-copy-bound (NOTES.md) —
    dozens of tiny-channel (Cs=4..16) conv ops per edge each pay layout
    rotations, worst in the backward. Packing turns ~14 ops into 6 on 4x
    wider channels; zero-padding the kernels and block matrices is exact
    (extra taps/entries multiply by 0), so this is the same math with the
    same parameter pytree, only scheduled TPU-shaped. The final per-branch
    BN + alpha fold works per packed channel because BN is per-channel.
    """
    nb = len(_PACKED_BRANCHES)
    cs = x.shape[-1]
    terms = []
    bias = None
    # pools / skip / none: exactly as _mixed_fold
    for i, prim in enumerate(PRIMITIVES):
        a = weights[i].astype(jnp.float32)
        if prim == "none" or prim in _PACKED_BRANCHES:
            continue
        if prim == "skip_connect" and stride == 1:
            terms.append(a * x.astype(jnp.float32))
            continue
        y = _op_prebn(p[prim], prim, x, stride, dtype)
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y32), axis=(0, 1, 2)) - jnp.square(mean)
        coef = a * jax.lax.rsqrt(var + eps)
        terms.append(y32 * coef)
        b = coef * mean
        bias = b if bias is None else bias + b

    od = dtype
    y = jnp.maximum(x, 0.0)
    z = C.conv2d({"w": _packed_dw1_kernel(p, cs)}, y, stride=stride,
                 padding=4, groups=cs, dtype=dtype, out_dtype=od)
    z = C.conv2d({"w": _packed_pw_matrix(
        [p[pr]["pw1" if pr.startswith("sep") else "pw"]["w"]
         for pr in _PACKED_BRANCHES], cs)[None, None]},
        z, dtype=dtype, out_dtype=od)
    # masked inner BN + ReLU: sep channels normalized+rectified, dil pass
    z32 = z.astype(jnp.float32)
    mean1 = jnp.mean(z32, axis=(0, 1, 2))
    var1 = jnp.mean(jnp.square(z32), axis=(0, 1, 2)) - jnp.square(mean1)
    sep_mask = jnp.tile(jnp.asarray(_SEP_MASK_PATTERN, jnp.float32), cs)
    zn = (z32 - mean1) * jax.lax.rsqrt(var1 + eps)
    z2 = jnp.where(sep_mask > 0.0, jnp.maximum(zn, 0.0), z32)
    z2 = z2.astype(od) if od is not None else z2
    w2 = C.conv2d({"w": _packed_dw2_kernel(p, cs)}, z2, stride=1,
                  padding=2, groups=cs * nb, dtype=dtype, out_dtype=od)
    out = C.conv2d({"w": _packed_pw_matrix(
        [p["sep_conv_3x3"]["pw2"]["w"], p["sep_conv_5x5"]["pw2"]["w"],
         None, None], cs)[None, None]}, w2, dtype=dtype, out_dtype=od)
    # fold each branch's final BN + its alpha; contract the branch axis
    out32 = out.astype(jnp.float32)
    meanp = jnp.mean(out32, axis=(0, 1, 2))
    varp = jnp.mean(jnp.square(out32), axis=(0, 1, 2)) - jnp.square(meanp)
    alphas_b = jnp.stack(
        [weights[PRIMITIVES.index(pr)] for pr in _PACKED_BRANCHES]
    ).astype(jnp.float32)
    coefp = jnp.tile(alphas_b, cs) * jax.lax.rsqrt(varp + eps)
    term = (out32 * coefp).reshape(*out32.shape[:-1], cs, nb).sum(-1)
    biasp = (coefp * meanp).reshape(cs, nb).sum(-1)
    terms.append(term)
    bias = biasp if bias is None else bias + biasp

    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc - bias


# Test hook: run the Pallas mixed-op kernel in interpret mode off-TPU so
# the CPU suite can exercise the integrated path (tests/test_pallas_mixedop)
PALLAS_MIX_INTERPRET = False


def mixed_op_apply(p, x, weights, stride: int, k: int, dtype,
                   shuffle: bool = True, fold_bn: bool = False,
                   pack: bool = False):
    """ops on the first C/k channels, weighted-summed; untouched 3/4
    concatenated (maxpool2x2'd if reduction); channel shuffle.

    shuffle=False defers the (shared) permutation to the caller: the cell
    sums beta-weighted edge outputs first and shuffles ONCE per node —
    exact because channel_shuffle is linear (saves E-1 relayout copies
    per node). fold_bn=True routes through _mixed_fold (same math, final
    BNs folded into the mixture coefficients); pack=True additionally
    packs the depthwise-separable branches (_mixed_fold_packed). The
    Pallas whole-edge kernel is not routed from here — it runs inside
    the HWCN trunk (_network_apply_hwcn)."""
    c = x.shape[-1]
    xtemp = x[..., : c // k]
    xtemp2 = x[..., c // k:]
    acc = jnp.float32 if dtype is None else dtype
    if fold_bn and pack:
        temp1 = _mixed_fold_packed(p, xtemp, weights, stride,
                                   dtype).astype(acc)
    elif fold_bn:
        temp1 = _mixed_fold(p, xtemp, weights, stride, dtype).astype(acc)
    else:
        # Stack the 8 op outputs and contract with the alpha weights in one
        # go — XLA fuses this into the op epilogues, not 8 separate AXPYs.
        outs = jnp.stack([op_apply(p[prim], prim, xtemp, stride, dtype)
                          for prim in PRIMITIVES])
        temp1 = jnp.einsum("o,onhwc->nhwc", weights.astype(outs.dtype),
                           outs,
                           preferred_element_type=jnp.float32).astype(acc)
    if stride == 1:
        ans = jnp.concatenate([temp1, xtemp2.astype(acc)], axis=-1)
    else:
        ans = jnp.concatenate([temp1, C.max_pool(xtemp2, 2, 2).astype(acc)],
                              axis=-1)
    return channel_shuffle(ans, k) if shuffle else ans


# --------------------------------------------------------------------------
# Cell and Network
# --------------------------------------------------------------------------

def num_edges(steps: int) -> int:
    return sum(2 + i for i in range(steps))


def cell_init(key, steps, c_pp, c_p, c, reduction, reduction_prev, k):
    k0, k1, key = jax.random.split(key, 3)
    p = {}
    if reduction_prev:
        p["pre0"] = factorized_reduce_init(k0, c_pp, c)
    else:
        p["pre0"] = relu_conv_bn_init(k0, c_pp, c)
    p["pre1"] = relu_conv_bn_init(k1, c_p, c)
    ops = []
    for i in range(steps):
        for j in range(2 + i):
            key, kk = jax.random.split(key)
            stride = 2 if reduction and j < 2 else 1
            ops.append(mixed_op_init(kk, c, stride, k))
    p["ops"] = ops
    return p


def cell_apply(p, s0, s1, alphas, betas, steps, multiplier, reduction,
               reduction_prev, k, dtype, fold_bn: bool = False,
               pack: bool = False):
    if reduction_prev:
        s0 = factorized_reduce_apply(p["pre0"], s0, dtype)
    else:
        s0 = relu_conv_bn_apply(p["pre0"], s0, dtype)
    s1 = relu_conv_bn_apply(p["pre1"], s1, dtype)

    states = [s0, s1]
    offset = 0
    for i in range(steps):
        s = None
        for j, h in enumerate(states):
            stride = 2 if reduction and j < 2 else 1
            y = betas[offset + j] * mixed_op_apply(
                p["ops"][offset + j], h, alphas[offset + j], stride, k,
                dtype, shuffle=False, fold_bn=fold_bn, pack=pack)
            s = y if s is None else s + y
        offset += len(states)
        # one shuffle per node instead of per edge (see mixed_op_apply)
        states.append(channel_shuffle(s, k))
    return jnp.concatenate(states[-multiplier:], axis=-1)


def cell_schedule(cfg: ModelConfig) -> List[dict]:
    """Static per-cell channel/reduction plan (model_search.py:116-128)."""
    c_curr = cfg.darts_stem_multiplier * cfg.darts_init_ch
    c_pp, c_p = c_curr, c_curr
    c_curr = cfg.darts_init_ch
    sched = []
    reduction_prev = False
    for i in range(cfg.darts_layers):
        reduction = i in (cfg.darts_layers // 3, 2 * cfg.darts_layers // 3)
        if reduction:
            c_curr *= 2
        sched.append(dict(c_pp=c_pp, c_p=c_p, c=c_curr, reduction=reduction,
                          reduction_prev=reduction_prev))
        reduction_prev = reduction
        c_pp, c_p = c_p, cfg.darts_multiplier * c_curr
    return sched


def network_out_features(cfg: ModelConfig) -> int:
    sched = cell_schedule(cfg)
    c_prev = cfg.darts_multiplier * sched[-1]["c"]
    return c_prev * OUTPUT_SIZE * OUTPUT_SIZE


def network_init(key, cfg: ModelConfig):
    k_stem, key = jax.random.split(key)
    c_stem = cfg.darts_stem_multiplier * cfg.darts_init_ch
    p = {
        "stem_conv": C.torch_conv_init(k_stem, 3, 3, 3, c_stem),
        "stem_bn": C.batchnorm_init(c_stem, affine=True),
        "cells": [],
    }
    for spec in cell_schedule(cfg):
        key, kk = jax.random.split(key)
        p["cells"].append(cell_init(
            kk, cfg.darts_steps, spec["c_pp"], spec["c_p"], spec["c"],
            spec["reduction"], spec["reduction_prev"], cfg.darts_partial_k))
    return p


def arch_init(key, cfg: ModelConfig):
    """1e-3 * randn, as model_search.py:187-200."""
    k = num_edges(cfg.darts_steps)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "alphas_normal": 1e-3 * jax.random.normal(k1, (k, len(PRIMITIVES))),
        "alphas_reduce": 1e-3 * jax.random.normal(k2, (k, len(PRIMITIVES))),
        "betas_normal": 1e-3 * jax.random.normal(k3, (k,)),
        "betas_reduce": 1e-3 * jax.random.normal(k4, (k,)),
    }


def beta_softmax(betas, steps: int):
    """Per-node-group softmax of edge betas (model_search.py:154-175):
    groups of sizes 2, 3, ..., steps+1."""
    chunks = []
    start = 0
    for i in range(steps):
        n = 2 + i
        chunks.append(jax.nn.softmax(betas[start:start + n]))
        start += n
    return jnp.concatenate(chunks)


def network_apply(p, arch, cfg: ModelConfig, x, dtype=None):
    """x NHWC -> flattened pooled features [B, c_prev * 49]."""
    s = C.conv2d(p["stem_conv"], x, stride=1, padding=1, dtype=dtype)
    s0 = s1 = C.batchnorm(p["stem_bn"], s)

    w_norm = jax.nn.softmax(arch["alphas_normal"], axis=-1)
    w_red = jax.nn.softmax(arch["alphas_reduce"], axis=-1)
    b_norm = beta_softmax(arch["betas_normal"], cfg.darts_steps)
    b_red = beta_softmax(arch["betas_reduce"], cfg.darts_steps)

    # BN-folded mixture is the fast path; running-stats eval mode needs
    # explicit per-op batchnorm calls (the capture/eval contexts), so it
    # forces the unfolded form. The BN capture/eval contexts are ambient
    # (trace-time) state, so remat's re-trace would double-consume them —
    # disable remat there too.
    fold_bn = cfg.fold_bn_mixture and not cfg.bn_eval_stats
    pack = cfg.pack_conv_branches and fold_bn
    # Pallas whole-edge kernel: TPU only (jnp fallback elsewhere; the CPU
    # suite forces the path in interpret mode via PALLAS_MIX_INTERPRET).
    # The kernel runs inside the HWCN trunk — per-edge transposes from the
    # NHWC cell cost more than the kernel saves (NOTES.md).
    pallas_mix = (cfg.pallas_mixed_op and fold_bn
                  and (jax.default_backend() == "tpu"
                       or PALLAS_MIX_INTERPRET))
    # Per-shard-BN guard, enforced at the consumer (not just
    # Experiment.__init__): on a >1-device TPU topology a DP-sharded batch
    # would give the kernel per-shard batch statistics instead of the
    # global-batch sync-BN the XLA path computes under pjit
    # (tests/test_mesh.py pins sharded == single-device). The interpret
    # hook is exempt — it is a single-array CPU test path.
    if (pallas_mix and not PALLAS_MIX_INTERPRET
            and jax.device_count() > 1):
        pallas_mix = False
    if pallas_mix:
        return _network_apply_hwcn(p, arch, cfg, x, dtype)
    remat = cfg.remat_cells and not cfg.bn_eval_stats

    for cell_p, spec in zip(p["cells"], cell_schedule(cfg)):
        alphas, betas = ((w_red, b_red) if spec["reduction"]
                         else (w_norm, b_norm))

        def _cell(cp, a, b, t0, t1, _spec=spec):
            return cell_apply(
                cp, t0, t1, a, b, cfg.darts_steps, cfg.darts_multiplier,
                _spec["reduction"], _spec["reduction_prev"],
                cfg.darts_partial_k, dtype, fold_bn=fold_bn, pack=pack)

        if remat:
            _cell = jax.checkpoint(_cell)
        s0, s1 = s1, _cell(cell_p, alphas, betas, s0, s1)
    out = C.adaptive_avg_pool(s1, OUTPUT_SIZE)
    # flatten in NCHW element order for reference weight compatibility
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
    return out


# --------------------------------------------------------------------------
# HWCN trunk: the whole search network in [H, W, C, N] layout.
#
# The Pallas whole-edge kernel consumes [H, W, Cs*N]; called from the NHWC
# cell it needs two relayout transposes PER EDGE (~88 per forward), which
# eat its per-edge win (measured: network fwd 8.6 -> 13.2 ms). Keeping the
# trunk in HWCN makes the kernel's input reshape a FREE view (N is the
# minor dim), channel concat/shuffle cheap leading-axis ops, and leaves
# exactly two transposes per network (after the stem, before the head).
# Preprocess 1x1 convs become einsums over C (same fp32-accumulated MXU
# matmuls). Reduction-edge ops fall back to local NHWC transposes (12
# edges). Numerics: same materialization points as the NHWC path.
# --------------------------------------------------------------------------


def _bn_hwcn(x, eps: float = 1e-5):
    """Affine-free batch-stat BN over (H, W, N) per channel."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 3), keepdims=True) \
        - jnp.square(mean)
    return (x32 - mean) * jax.lax.rsqrt(var + eps)


def _pw_conv_hwcn(w, x, dtype):
    """1x1 conv as an einsum over C. w: [1,1,ci,co]; x: [H,W,ci,N]."""
    wd = w[0, 0]
    if dtype is not None:
        x = x.astype(dtype)
        wd = wd.astype(dtype)
    return jnp.einsum("hwcn,cd->hwdn", x, wd,
                      preferred_element_type=jnp.float32)


def _relu_conv_bn_hwcn(p, x, dtype):
    return _bn_hwcn(_pw_conv_hwcn(p["conv"]["w"], jnp.maximum(x, 0.0),
                                  dtype))


def _fact_reduce_hwcn(p, x, dtype):
    """factorized_reduce_apply in HWCN (stride-2 1x1 convs = subsample)."""
    y = jnp.maximum(x, 0.0)
    a = _pw_conv_hwcn(p["conv1"]["w"], y[::2, ::2], dtype)
    b = _pw_conv_hwcn(p["conv2"]["w"], y[1::2, 1::2], dtype)
    return _bn_hwcn(jnp.concatenate([a, b], axis=2))


def _max_pool2_hwcn(x):
    return jax.lax.reduce_window(
        x.astype(jnp.float32), -jnp.inf, jax.lax.max,
        (2, 2, 1, 1), (2, 2, 1, 1), "VALID")


def channel_shuffle_hwcn(x, groups: int):
    h, w, c, n = x.shape
    x = x.reshape(h, w, groups, c // groups, n)
    return jnp.swapaxes(x, 2, 3).reshape(h, w, c, n)


def _mixed_op_hwcn_fallback(p, x, weights, stride: int, k: int, dtype):
    """mixed_op_apply on an [H, W, C, N] state (shuffle deferred) via a
    local NHWC round-trip — the path for reduction / VMEM-ineligible
    edges (12 of 56 edge instances at reference dims)."""
    h, w, c, n = x.shape
    cs = c // k
    xtemp = x[:, :, :cs, :]
    xtemp2 = x[:, :, cs:, :]
    acc = jnp.float32 if dtype is None else dtype
    x_nhwc = jnp.transpose(xtemp, (3, 0, 1, 2))
    mix = _mixed_fold(p, x_nhwc, weights, stride, dtype)
    mix = jnp.transpose(mix, (1, 2, 3, 0))
    rest = xtemp2 if stride == 1 else _max_pool2_hwcn(xtemp2)
    return jnp.concatenate([mix.astype(acc), rest.astype(acc)], axis=2)


def cell_apply_hwcn(p, s0, s1, alphas, betas, steps, multiplier, reduction,
                    reduction_prev, k, dtype):
    """Cell forward on the HWCN trunk with NODE-BATCHED Pallas mixed ops:
    per node, every VMEM-eligible stride-1 edge joins one (or, when the
    backward VMEM cap bites, a few) node-kernel invocation(s) that
    compute sum_j beta_j * mix_j in a single pass (44 -> 14 kernel calls
    at reference dims); the untouched-channel 3/4 gets a plain XLA
    beta-weighted sum; reduction/ineligible edges fall back to the NHWC
    _mixed_fold. Matches `pcdarts/model_search.py:58-91` semantics."""
    from lctvqa.ops import pallas_mixedop as PM

    interp = jax.default_backend() != "tpu"
    if reduction_prev:
        s0 = _fact_reduce_hwcn(p["pre0"], s0, dtype)
    else:
        s0 = _relu_conv_bn_hwcn(p["pre0"], s0, dtype)
    s1 = _relu_conv_bn_hwcn(p["pre1"], s1, dtype)

    states = [s0, s1]
    offset = 0
    for i in range(steps):
        s = None
        group = []
        for j, hst in enumerate(states):
            stride = 2 if reduction and j < 2 else 1
            h, w, c, n = hst.shape
            if PM.node_eligible(h, w, c // k, n, stride, dtype):
                group.append(j)
            else:
                y = betas[offset + j] * _mixed_op_hwcn_fallback(
                    p["ops"][offset + j], hst, alphas[offset + j], stride,
                    k, dtype)
                s = y if s is None else s + y
        if group:
            h, w, c, n = states[group[0]].shape
            cs = c // k
            acc = jnp.float32 if dtype is None else dtype
            fwd_cap = max(PM.node_caps(h, w, cs, n, dtype)[0], 1)
            mix = None
            for lo in range(0, len(group), fwd_cap):
                sub = group[lo:lo + fwd_cap]
                xs = tuple(
                    (states[j][:, :, :cs, :].astype(dtype)
                     if dtype is not None else states[j][:, :, :cs, :])
                    .reshape(h, w, cs * n)       # free view: N is minor
                    for j in sub)
                wts = jnp.stack([betas[offset + j] * alphas[offset + j]
                                 for j in sub])
                m = PM.mixed_node_pallas_hwcn(
                    xs, [p["ops"][offset + j] for j in sub], wts, cs, n,
                    interp)
                mix = m if mix is None else mix + m
            rest = None
            for j in group:
                r = betas[offset + j] \
                    * states[j][:, :, cs:, :].astype(jnp.float32)
                rest = r if rest is None else rest + r
            part = jnp.concatenate(
                [mix.reshape(h, w, cs, n).astype(acc), rest.astype(acc)],
                axis=2)
            s = part if s is None else s + part
        offset += len(states)
        states.append(channel_shuffle_hwcn(s, k))
    return jnp.concatenate(states[-multiplier:], axis=2)


def _network_apply_hwcn(p, arch, cfg: ModelConfig, x, dtype):
    """network_apply with the trunk in HWCN (see block comment above)."""
    s = C.conv2d(p["stem_conv"], x, stride=1, padding=1, dtype=dtype)
    s = C.batchnorm(p["stem_bn"], s)
    s0 = s1 = jnp.transpose(s, (1, 2, 3, 0))       # -> [H, W, C, N], once

    w_norm = jax.nn.softmax(arch["alphas_normal"], axis=-1)
    w_red = jax.nn.softmax(arch["alphas_reduce"], axis=-1)
    b_norm = beta_softmax(arch["betas_normal"], cfg.darts_steps)
    b_red = beta_softmax(arch["betas_reduce"], cfg.darts_steps)
    remat = cfg.remat_cells and not cfg.bn_eval_stats

    for cell_p, spec in zip(p["cells"], cell_schedule(cfg)):
        alphas, betas = ((w_red, b_red) if spec["reduction"]
                         else (w_norm, b_norm))

        def _cell(cp, a, b, t0, t1, _spec=spec):
            return cell_apply_hwcn(
                cp, t0, t1, a, b, cfg.darts_steps, cfg.darts_multiplier,
                _spec["reduction"], _spec["reduction_prev"],
                cfg.darts_partial_k, dtype)

        if remat:
            _cell = jax.checkpoint(_cell)
        s0, s1 = s1, _cell(cell_p, alphas, betas, s0, s1)

    # adaptive pool over the two leading spatial axes
    h, w = s1.shape[0], s1.shape[1]
    mh = jnp.asarray(C._adaptive_pool_matrix(h, OUTPUT_SIZE))
    mw = jnp.asarray(C._adaptive_pool_matrix(w, OUTPUT_SIZE))
    s32 = s1.astype(jnp.float32)
    pooled = jnp.einsum("oh,hwcn->owcn", mh, s32,
                        preferred_element_type=jnp.float32)
    pooled = jnp.einsum("ow,hwcn->hocn", mw, pooled,
                        preferred_element_type=jnp.float32)
    # -> [N, C, 7, 7] flatten (reference NCHW element order), second and
    # last transpose of the network
    out = jnp.transpose(pooled, (3, 2, 0, 1))
    return out.reshape(out.shape[0], -1)


def genotype(arch, steps: int = 4, multiplier: int = 4) -> Genotype:
    """Decode arch params to a discrete Genotype (model_search.py:205-250):
    per node, keep the top-2 incoming edges ranked by beta * max non-'none'
    alpha; per kept edge, the best non-'none' op."""
    def _softmax(v, axis=-1):
        e = np.exp(v - v.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    def _beta_cat(betas):
        chunks, start = [], 0
        for i in range(steps):
            n = 2 + i
            chunks.append(_softmax(np.asarray(betas[start:start + n])))
            start += n
        return np.concatenate(chunks)

    def _parse(weights, weights2):
        gene = []
        n, start = 2, 0
        for i in range(steps):
            end = start + n
            w = weights[start:end].copy() * weights2[start:end, None]
            edges = sorted(
                range(i + 2),
                key=lambda x: -max(w[x][kk] for kk in range(len(w[x]))
                                   if kk != NONE_IDX))[:2]
            for j in edges:
                k_best = None
                for kk in range(len(w[j])):
                    if kk == NONE_IDX:
                        continue
                    if k_best is None or w[j][kk] > w[j][k_best]:
                        k_best = kk
                gene.append((PRIMITIVES[k_best], j))
            start = end
            n += 1
        return gene

    gene_normal = _parse(_softmax(np.asarray(arch["alphas_normal"])),
                         _beta_cat(np.asarray(arch["betas_normal"])))
    gene_reduce = _parse(_softmax(np.asarray(arch["alphas_reduce"])),
                         _beta_cat(np.asarray(arch["betas_reduce"])))
    concat = list(range(2 + steps - multiplier, steps + 2))
    return Genotype(normal=gene_normal, normal_concat=concat,
                    reduce=gene_reduce, reduce_concat=concat)
