"""Single-pass batch-stat BatchNorm as a Pallas TPU kernel.

Profiling (NOTES.md) shows the DARTS nets spend ~40% of device time in
BatchNorm: XLA needs one pass to reduce (mean, E[x^2]) and a second to
normalize — 2 reads + 1 write of the activation. This kernel does stats +
normalize in a single read + write.

TPU detail that shapes the design: these BNs run on 4-16 channel tensors,
and a naive [N*H*W, C] VMEM window pads C onto 128 lanes (a 32x memory
blowup — 128MB for a 16MB tensor). So the activation is viewed as
[M/f, f*C] with f = 128//C row-groups packed into the lane dim; the
per-channel reduction folds the f groups with a tiny constant selection
matrix (one [128, C] matmul), and mean/rsqrt broadcast back through its
transpose. The backward pass fuses its two reductions (mean(g),
mean(g*xhat)) with the dx elementwise the same way.

Only affine=False BNs (the search-space ops) use this path; tensors larger
than the VMEM budget or with awkward shapes fall back to
ops.conv.batchnorm. Parity tests: tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
LANES = 128
# in + out + fp32 scratch comfortably under the ~16MB/core VMEM
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _select_matrix(f: int, c: int) -> np.ndarray:
    """[f*C, C] 0/1 matrix: column c sums lanes k with k % C == c."""
    s = np.zeros((f * c, c), np.float32)
    for k in range(f * c):
        s[k, k % c] = 1.0
    return s


def _fwd_kernel(x_ref, sel_ref, y_ref, stat_ref, *, n_total):
    x = x_ref[:].astype(jnp.float32)              # [rows, f*C]
    sel = sel_ref[:]                              # [f*C, C]
    s = jnp.sum(x, axis=0, keepdims=True)         # [1, f*C]
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    mean = jnp.dot(s, sel, preferred_element_type=jnp.float32) / n_total
    meansq = jnp.dot(sq, sel, preferred_element_type=jnp.float32) / n_total
    var = meansq - mean * mean
    r = jax.lax.rsqrt(var + EPS)                  # [1, C]
    mean_t = jnp.dot(mean, sel.T,
                     preferred_element_type=jnp.float32)  # [1, f*C]
    r_t = jnp.dot(r, sel.T, preferred_element_type=jnp.float32)
    y_ref[:] = ((x - mean_t) * r_t).astype(y_ref.dtype)
    stat_ref[:] = jnp.concatenate([mean_t, r_t], axis=0)  # [2, f*C]


def _bwd_kernel(x_ref, sel_ref, stat_ref, g_ref, dx_ref, *, n_total):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:]
    mean_t = stat_ref[0:1, :]
    r_t = stat_ref[1:2, :]
    xhat = (x - mean_t) * r_t
    gs = jnp.sum(g, axis=0, keepdims=True)
    gxs = jnp.sum(g * xhat, axis=0, keepdims=True)
    g_mean = jnp.dot(jnp.dot(gs, sel) / n_total, sel.T,
                     preferred_element_type=jnp.float32)
    gx_mean = jnp.dot(jnp.dot(gxs, sel) / n_total, sel.T,
                      preferred_element_type=jnp.float32)
    dx_ref[:] = (r_t * (g - g_mean - xhat * gx_mean)).astype(dx_ref.dtype)


def _run_fwd(x2, f, c, out_dtype, interpret):
    rows = x2.shape[0]
    kernel = functools.partial(_fwd_kernel, n_total=rows * f)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, f * c), out_dtype),
                   jax.ShapeDtypeStruct((2, f * c), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x2, jnp.asarray(_select_matrix(f, c)))


def _run_bwd(x2, stat, g2, f, c, interpret):
    rows = x2.shape[0]
    kernel = functools.partial(_bwd_kernel, n_total=rows * f)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, f * c), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, jnp.asarray(_select_matrix(f, c)), stat, g2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _bn(x2, f, c, out_dtype, interpret):
    y, _ = _run_fwd(x2, f, c, out_dtype, interpret)
    return y


def _bn_fwd(x2, f, c, out_dtype, interpret):
    y, stat = _run_fwd(x2, f, c, out_dtype, interpret)
    return y, (x2, stat)


def _bn_bwd(f, c, out_dtype, interpret, res, g):
    x2, stat = res
    dx = _run_bwd(x2, stat, g, f, c, interpret)
    return (dx.astype(x2.dtype),)


_bn.defvjp(_bn_fwd, _bn_bwd)


def batchnorm_pallas(x, out_dtype=None, force_interpret: bool = False):
    """Affine-free batch-stat BN over (N, H, W) per channel — NHWC.

    Falls back to ops.conv.batchnorm when off-TPU (unless force_interpret,
    for tests), when the tensor exceeds the VMEM budget, or when the
    lane-packing doesn't divide evenly.
    """
    from lctvqa.ops.conv import batchnorm_xla

    on_tpu = jax.default_backend() == "tpu"
    n, h, w, c = x.shape
    m = n * h * w
    f = max(LANES // c, 1)
    # rows>4096: the single-block kernel serializes worse than XLA's
    # pipelined two-pass (measured on v5e) — fall back
    eligible = (c <= LANES and m % f == 0 and m // f <= 4096
                and x.size * 4 * 2 <= VMEM_BUDGET_BYTES)
    if (not on_tpu and not force_interpret) or not eligible:
        return batchnorm_xla({}, x, out_dtype=out_dtype)
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    y = _bn(x.reshape(m // f, f * c), f, c, out_dtype,
            not on_tpu)
    return y.reshape(n, h, w, c)
