"""Parity tests for the Pallas mixed-op kernel (ops/pallas_mixedop.py).

The kernel runs in interpret mode off-TPU; numerics must match the XLA
`_mixed_fold` path (models/search.py), which is itself parity-pinned
against the reference-exact unfolded path in tests/test_search.py.

Measured on v5e (bf16, 100-iter steady incl. dispatch):
  C=16 H=16: xla 0.613 ms  pallas 0.479 ms
  C=8  H=32: xla 0.793 ms  pallas 0.514 ms
  C=4  H=64: xla 1.116 ms  pallas 0.588 ms   (cell-0 shape, ~2x)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lctvqa.models import search
from lctvqa.ops.pallas_mixedop import mixed_op_pallas


def _setup(C=4, N=8, H=8, W=8, seed=0):
    key = jax.random.PRNGKey(seed)
    p = search.mixed_op_init(key, C * 4, 1, 4)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, H, W, C),
                          jnp.float32)
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(seed + 2), (8,)))
    return p, x, w


def test_mixed_op_pallas_matches_fold_f32():
    p, x, w = _setup()
    ref = search._mixed_fold(p, x, w, 1, None)
    out = mixed_op_pallas(p, x, w, dtype=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mixed_op_pallas_matches_fold_bf16():
    """bf16 compute: same materialization points as the XLA path (conv
    epilogues at bf16, fp32 accumulation/stats) — agreement to bf16
    resolution."""
    p, x, w = _setup(seed=3)
    ref = search._mixed_fold(p, x, w, 1, jnp.bfloat16)
    out = mixed_op_pallas(p, x, w, dtype=jnp.bfloat16, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.0, atol=0.05 * max(scale, 1.0))


def test_mixed_op_pallas_rect_and_channels():
    """Non-square spatial dims and a different channel count."""
    p, x, w = _setup(C=8, N=4, H=12, W=8, seed=5)
    ref = search._mixed_fold(p, x, w, 1, None)
    out = mixed_op_pallas(p, x, w, dtype=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mixed_op_pallas_alpha_sensitivity():
    """The alphas are folded INSIDE the kernel — a one-hot alpha on
    max_pool must reproduce BN(maxpool(x)) alone."""
    p, x, w = _setup(seed=7)
    one_hot = jnp.zeros(8).at[1].set(1.0)   # max_pool_3x3
    out = mixed_op_pallas(p, x, one_hot, dtype=None, interpret=True)
    from lctvqa.ops import conv as C
    ref = C.batchnorm({}, C.max_pool(x, 3, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
