"""Convolution / pooling / normalization in NHWC (TPU-native layout).

The reference's dense compute lives in cuDNN via torch (SURVEY.md §2 "native
code statement"); here every op lowers to XLA:TPU HLO that tiles onto the
MXU. Kernels are HWIO; activations NHWC. All matmul-like ops take an
explicit compute dtype (bf16 on TPU) and accumulate in fp32.
"""

from __future__ import annotations

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


def conv2d(params, x, stride=1, padding=0, dilation=1, groups: int = 1,
           dtype=None):
    """NHWC conv. `padding` is symmetric int or ((ph0,ph1),(pw0,pw1))."""
    w = params["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    # No preferred_element_type upcast: this JAX version's conv transpose
    # rule rejects mixed (bf16 operand, f32 cotangent). The TPU MXU
    # accumulates in fp32 internally regardless of the bf16 output dtype;
    # results are upcast to fp32 right here.
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=DIMNUMS,
        feature_group_count=groups)
    y = y.astype(jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y


def depthwise_conv2d(params, x, stride=1, padding=0, dilation=1, dtype=None):
    """Depthwise conv: kernel [kh, kw, 1, C] with feature_group_count=C."""
    c = x.shape[-1]
    return conv2d(params, x, stride, padding, dilation, groups=c, dtype=dtype)


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


def batchnorm(params, x, eps: float = 1e-5, out_dtype=None):
    """Batch-statistics BN over (N, H, W) per channel.

    Design decision (SURVEY.md §7 hard-part 3): the reference's BN layers in
    the DARTS search space run in train mode during both search and eval, so
    batch statistics are what the optimization sees; we use batch stats
    unconditionally (standard in DARTS reimplementations). Under a DP mesh
    the mean over the batch axis is a *global* mean — jit over a sharded
    batch makes XLA insert the cross-replica reduction, i.e. sync-BN for
    free.
    """
    if (USE_PALLAS_BN and not params and x.ndim == 4
            and eps == 1e-5):
        import jax as _jax
        if _jax.default_backend() == "tpu":
            from lctvqa.ops.pallas_bn import batchnorm_pallas
            return batchnorm_pallas(x, out_dtype=out_dtype)
    return batchnorm_xla(params, x, eps, out_dtype)


def batchnorm_xla(params, x, eps: float = 1e-5, out_dtype=None):
    """The plain two-pass XLA implementation (also the Pallas fallback)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in params:
        y = y * params["scale"] + params["bias"]
    # stats/normalize in fp32; optionally store the activation narrow (the
    # DARTS nets are HBM-bandwidth-bound on BN traffic — see DESIGN.md)
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y


def max_pool(x, window: int, stride: int, padding: int = 0):
    return jax.lax.reduce_window(
        x.astype(jnp.float32), -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


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
