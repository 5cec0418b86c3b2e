"""Convolution / pooling / normalization in NHWC (TPU-native layout).

The reference's dense compute lives in cuDNN via torch (SURVEY.md §2 "native
code statement"); here every op lowers to XLA:TPU HLO that tiles onto the
MXU. Kernels are HWIO; activations NHWC. All matmul-like ops take an
explicit compute dtype (bf16 on TPU) and accumulate in fp32.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def torch_conv_init(key, kh, kw, c_in, c_out, groups: int = 1, bias: bool = False):
    """U(-k, k) with k = 1/sqrt(fan_in), fan_in = (c_in/groups)*kh*kw."""
    fan_in = (c_in // groups) * kh * kw
    k = 1.0 / math.sqrt(fan_in)
    kw_key, kb_key = jax.random.split(key)
    p = {"w": jax.random.uniform(kw_key, (kh, kw, c_in // groups, c_out),
                                 jnp.float32, -k, k)}
    if bias:
        p["b"] = jax.random.uniform(kb_key, (c_out,), jnp.float32, -k, k)
    return p


_Q_EPS = 1e-12


def quantize_weight(w, out_axis: int):
    """fp32 weight -> (int8 weight, fp32 per-output-channel scale).

    Symmetric per-output-channel int8: each output channel's abs-max maps
    to +/-127, so the dequantized grid covers the channel exactly."""
    axes = tuple(i for i in range(w.ndim) if i != out_axis)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), _Q_EPS) / 127.0
    shape = [1] * w.ndim
    shape[out_axis] = -1
    q = jnp.clip(jnp.round(w / s.reshape(shape)), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def quantize_act(x, per_sample: bool = False):
    """fp activation -> (int8 activation, fp32 scale), dynamic abs-max —
    computed on device per call, no calibration set.

    per_sample=True keeps one scale per leading-axis sample (shape
    [N, 1, ...]) instead of one per tensor, so a single outlier sample in
    a large serving batch cannot flatten everyone else's grid. The
    int8 dispatch paths use it; the extra cost is a per-sample reduce."""
    x = x.astype(jnp.float32)
    if per_sample:
        axes = tuple(range(1, x.ndim))
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=axes, keepdims=True),
                        _Q_EPS) / 127.0
    else:
        s = jnp.maximum(jnp.max(jnp.abs(x)), _Q_EPS) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_conv_params(p):
    """{"w"[, "b"]} conv params -> {"w_q", "w_s"[, "b"]} (HWIO, out axis 3).
    `conv2d` dispatches on the "w_q" key (serving-only: no derivative)."""
    wq, ws = quantize_weight(p["w"], out_axis=3)
    out = {"w_q": wq, "w_s": ws}
    if "b" in p:
        out["b"] = p["b"]
    return out


def conv2d(params, x, stride=1, padding=0, dilation=1, groups: int = 1,
           dtype=None, out_dtype=None):
    """NHWC conv. `padding` is symmetric int or ((ph0,ph1),(pw0,pw1)).

    out_dtype: dtype the result is MATERIALIZED at (default fp32). The
    bandwidth-bound search-net ops pass out_dtype=compute dtype so conv
    chains never round-trip activations through fp32 HBM writes; the MXU
    still accumulates in fp32 internally either way.

    Quantized params (`quantize_conv_params`) dispatch to the int8 serving
    path: dynamic per-tensor int8 activations x per-channel int8 weights ->
    int32 MXU accumulation -> fp32 dequant + bias. `dtype` is ignored there
    (the operand dtype IS int8); no derivative is defined.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if "w_q" in params:
        xq, sx = quantize_act(x, per_sample=True)
        y = jax.lax.conv_general_dilated(
            xq, params["w_q"], window_strides=stride, padding=padding,
            rhs_dilation=dilation, dimension_numbers=DIMNUMS,
            feature_group_count=groups,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * params["w_s"])
        if "b" in params:
            y = y + params["b"]
        return y.astype(jnp.float32 if out_dtype is None else out_dtype)
    w = params["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    # No preferred_element_type upcast: this JAX version's conv transpose
    # rule rejects mixed (bf16 operand, f32 cotangent).
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=DIMNUMS,
        feature_group_count=groups)
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    y = y.astype(out_dtype)
    if "b" in params:
        y = y + params["b"].astype(out_dtype)
    return y


def depthwise_conv2d(params, x, stride=1, padding=0, dilation=1, dtype=None,
                     out_dtype=None):
    """Depthwise conv: kernel [kh, kw, 1, C] with feature_group_count=C."""
    c = x.shape[-1]
    return conv2d(params, x, stride, padding, dilation, groups=c,
                  dtype=dtype, out_dtype=out_dtype)


def batchnorm_init(c: int, affine: bool = True):
    if affine:
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}
    return {}


# Route eligible affine-free BNs through the single-pass Pallas kernel
# (ops/pallas_bn.py). Default OFF: although the kernel wins in isolation on
# mid shapes, inside the full network the lane-repacking reshape is a real
# relayout copy on TPU tiled layouts and the custom-call breaks XLA fusion
# with neighbors — measured net slower (NOTES.md). Kept for future use with
# a layout-preserving variant.
USE_PALLAS_BN = False


# ---------------------------------------------------------------------------
# BN running-statistics context (opt-in; reference-numerics validation).
#
# Default behavior is batch statistics everywhere (see `batchnorm` below).
# The reference instead calls `model.eval()` during validation
# (`basic_vqa/experiment.py:292-293`), which switches torch BatchNorm to its
# momentum-tracked running statistics. To reproduce those numerics without
# threading mutable BN state through every pure model function, an ambient
# *trace-time* context gates each `batchnorm` call:
#   - `with bn_capture() as cap:` batch-stat math as usual, but every call
#     appends its (mean, biased var, reduction count) to `cap.stats` — the
#     jitted step returns that pytree as an extra output;
#   - `update_running_stats(running, cap.stats)` applies torch's momentum
#     update (0.1, unbiased var), `init_running_stats` gives torch's
#     (0, 1) init;
#   - `with bn_eval(running):` each call consumes the next entry IN CALL
#     ORDER and normalizes with it — the functional equivalent of eval().
# Call order is deterministic under jax tracing, so capture and eval align
# as long as the same network-apply runs under both.
# ---------------------------------------------------------------------------

_BN_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "lctvqa_bn_ctx", default=None)


class _BNCtx:
    __slots__ = ("mode", "stats", "cursor")

    def __init__(self, mode, stats=None):
        self.mode = mode              # 'capture' | 'eval'
        self.stats = list(stats) if stats is not None else []
        self.cursor = 0


@contextlib.contextmanager
def bn_capture():
    """Collect per-call batch stats from every `batchnorm` in the scope."""
    ctx = _BNCtx("capture")
    tok = _BN_CTX.set(ctx)
    try:
        yield ctx
    finally:
        _BN_CTX.reset(tok)


@contextlib.contextmanager
def bn_eval(stats):
    """Serve running stats to `batchnorm` calls, one entry per call in call
    order. Raises if the consumption count mismatches the provided list."""
    ctx = _BNCtx("eval", stats)
    tok = _BN_CTX.set(ctx)
    try:
        yield ctx
    finally:
        _BN_CTX.reset(tok)
    if ctx.cursor != len(ctx.stats):
        raise ValueError(
            f"bn_eval consumed {ctx.cursor} of {len(ctx.stats)} BN stat "
            f"entries — capture/eval network mismatch")


def init_running_stats(captured):
    """torch BatchNorm init: running_mean=0, running_var=1."""
    return [{"mean": jnp.zeros_like(c["mean"]),
             "var": jnp.ones_like(c["var"])} for c in captured]


def update_running_stats(running, captured, momentum: float = 0.1):
    """torch semantics: running = (1-m)*running + m*batch. The captured
    "var" is already the UNBIASED batch variance (torch BatchNorm2d's
    update rule; the unbiasing factor is applied at capture time where the
    reduction count is static)."""
    out = []
    for r, c in zip(running, captured):
        out.append({
            "mean": (1.0 - momentum) * r["mean"] + momentum * c["mean"],
            "var": (1.0 - momentum) * r["var"] + momentum * c["var"],
        })
    return out


def batchnorm(params, x, eps: float = 1e-5, out_dtype=None):
    """Batch-statistics BN over (N, H, W) per channel.

    Design decision (SURVEY.md §7 hard-part 3): the reference's BN layers in
    the DARTS search space run in train mode during both search and eval, so
    batch statistics are what the optimization sees; we use batch stats
    unconditionally (standard in DARTS reimplementations). Under a DP mesh
    the mean over the batch axis is a *global* mean — jit over a sharded
    batch makes XLA insert the cross-replica reduction, i.e. sync-BN for
    free. The opt-in bn_capture/bn_eval contexts above reproduce the
    reference's eval-mode running-stats numerics when needed.
    """
    ctx = _BN_CTX.get()
    if ctx is not None:
        if ctx.mode == "eval":
            if ctx.cursor >= len(ctx.stats):
                raise ValueError("bn_eval ran out of BN stat entries")
            s = ctx.stats[ctx.cursor]
            ctx.cursor += 1
            x32 = x.astype(jnp.float32)
            y = (x32 - s["mean"]) * jax.lax.rsqrt(s["var"] + eps)
            if "scale" in params:
                y = y * params["scale"] + params["bias"]
            return y.astype(out_dtype) if out_dtype is not None else y
        # capture: plain XLA batch-stat path, recording the stats. The
        # recorded variance is pre-unbiased (reduction count is static
        # here) because its only consumer is the running-stat update.
        y, mean, var = batchnorm_xla(params, x, eps, out_dtype,
                                     return_stats=True)
        n = float(np.prod(x.shape[:-1]))
        ctx.stats.append({"mean": mean,
                          "var": var * (n / max(n - 1.0, 1.0))})
        return y
    if (USE_PALLAS_BN and not params and x.ndim == 4
            and eps == 1e-5):
        import jax as _jax
        if _jax.default_backend() == "tpu":
            from lctvqa.ops.pallas_bn import batchnorm_pallas
            return batchnorm_pallas(x, out_dtype=out_dtype)
    return batchnorm_xla(params, x, eps, out_dtype)


def batchnorm_xla(params, x, eps: float = 1e-5, out_dtype=None,
                  return_stats: bool = False):
    """The plain two-pass XLA implementation (also the Pallas fallback)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in params:
        y = y * params["scale"] + params["bias"]
    # stats/normalize in fp32; optionally store the activation narrow (the
    # DARTS nets are HBM-bandwidth-bound on BN traffic — see DESIGN.md)
    if out_dtype is not None:
        y = y.astype(out_dtype)
    if return_stats:
        return y, mean, var
    return y


def _pool_taps(x, window: int, stride: int, padding: int, fill):
    """The window*window strided tap views of x, each [N, Ho, Wo, C]."""
    n, h, w, c = x.shape
    ho = (h + 2 * padding - window) // stride + 1
    wo = (w + 2 * padding - window) // stride + 1
    xp = jnp.pad(x, [(0, 0), (padding, padding), (padding, padding),
                     (0, 0)], constant_values=fill) if padding else x
    taps = []
    for di in range(window):
        for dj in range(window):
            taps.append(jax.lax.slice(
                xp, (0, di, dj, 0),
                (n, di + (ho - 1) * stride + 1, dj + (wo - 1) * stride + 1,
                 c), (1, stride, stride, 1)))
    return taps


def max_pool(x, window: int, stride: int, padding: int = 0):
    """Max pool; XLA differentiates this into select_and_scatter.

    A tap-routed custom-JVP variant exists below (`max_pool_tap_jvp`) and
    was A/B-measured on v5e at reference dims (scripts/bench_train_step.py,
    scripts/bench_stage3.py, NOTES.md round-3): it fixes the (rare) tie
    disagreement with torch's argmax routing and removes
    select_and_scatter's padded HBM temps, but its 9-tap masked-add
    backward costs +42% on the stage1+stage2 train step (93.7 vs 65.8
    ms/step — max_pool_3x3 appears in every MixedOp edge), so the fused
    reduce_window derivative ships as the default."""
    return jax.lax.reduce_window(
        x.astype(jnp.float32), -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def max_pool_tap_jvp(x, window: int, stride: int, padding: int = 0):
    """Max pool whose tangent routes through the first-max window tap
    (row-major — torch MaxPool2d's exact argmax tie rule). The tangent
    map is linear, so XLA transposes it to a pad+mask+add backward with
    no select_and_scatter anywhere, and arbitrary-order AD stays open.
    Measured 42% slower than the default on the train step (see
    `max_pool`); kept as the tie-exact opt-in for parity work."""
    return jax.lax.reduce_window(
        x.astype(jnp.float32), -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


@max_pool_tap_jvp.defjvp
def _max_pool_jvp(window, stride, padding, primals, tangents):
    (x,), (xdot,) = primals, tangents
    taps = _pool_taps(x.astype(jnp.float32), window, stride, padding,
                      -jnp.inf)
    # first-max tap index in row-major window order: strict > keeps the
    # earliest occurrence on ties
    best, idx = taps[0], jnp.zeros(taps[0].shape, jnp.int32)
    for t, xt in enumerate(taps[1:], start=1):
        take = xt > best
        idx = jnp.where(take, t, idx)
        best = jnp.maximum(best, xt)
    dtaps = _pool_taps(xdot.astype(jnp.float32), window, stride, padding,
                       0.0)
    ydot = jnp.where(idx == 0, dtaps[0], 0.0)
    for t, dt in enumerate(dtaps[1:], start=1):
        ydot = ydot + jnp.where(idx == t, dt, 0.0)
    return best, ydot


def avg_pool(x, window: int, stride: int, padding: int = 0,
             count_include_pad: bool = False):
    """AvgPool matching torch semantics (count_include_pad=False divides by
    the number of *valid* elements per window: `pcdarts/operations.py:6`)."""
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), pads)
    if count_include_pad or padding == 0:
        return summed / float(window * window)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), pads)
    return summed / counts


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic [out, in] averaging matrix reproducing
    torch.nn.AdaptiveAvgPool2d bin edges (start=floor(i*in/out),
    end=ceil((i+1)*in/out)).

    Adaptive pooling is linear, so on TPU we express it as two small matmuls
    along H and W instead of a gather — it rides the MXU and fuses.
    """
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x, out_size: int):
    """NHWC adaptive average pool to (out_size, out_size)."""
    n, h, w, c = x.shape
    mh = jnp.asarray(_adaptive_pool_matrix(h, out_size))
    mw = jnp.asarray(_adaptive_pool_matrix(w, out_size))
    x32 = x.astype(jnp.float32)
    # [N,H,W,C] -> [N,out,W,C] -> [N,out,out,C]
    y = jnp.einsum("oh,nhwc->nowc", mh, x32,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("ow,nhwc->nhoc", mw, y,
                      preferred_element_type=jnp.float32)
