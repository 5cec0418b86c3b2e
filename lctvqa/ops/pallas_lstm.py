"""Fused LSTM cell as a Pallas TPU kernel.

One kernel computes gates = x@W_ih + h@W_hh + b (two MXU matmuls) and the
gate nonlinearities + state update (VPU) without round-tripping the [B, 4H]
gate tensor through HBM. At reference dims (B=64, H=512) all operands fit
VMEM comfortably. The backward pass is a custom VJP in jnp (XLA fuses it
well; the forward is the latency-critical path inside the 30-step
autoregressive scan — SURVEY.md §7 hard-part 4).

Falls back to interpret mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cell_kernel(x_ref, h_ref, c_ref, wih_ref, whh_ref, b_ref,
                 h_out_ref, c_out_ref):
    gates = jnp.dot(x_ref[:], wih_ref[:],
                    preferred_element_type=jnp.float32)
    gates = gates + jnp.dot(h_ref[:], whh_ref[:],
                            preferred_element_type=jnp.float32)
    gates = gates + b_ref[:]
    hid = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :hid])
    f = jax.nn.sigmoid(gates[:, hid:2 * hid])
    g = jnp.tanh(gates[:, 2 * hid:3 * hid])
    o = jax.nn.sigmoid(gates[:, 3 * hid:])
    c_new = f * c_ref[:] + i * g
    h_out_ref[:] = o * jnp.tanh(c_new)
    c_out_ref[:] = c_new


def _forward(x, h, c, w_ih, w_hh, b, interpret: bool):
    bsz, hid = h.shape
    return pl.pallas_call(
        _cell_kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, hid), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, hid), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, h, c, w_ih, w_hh, b)


@functools.partial(jax.custom_jvp, nondiff_argnums=(6,))
def _fused_cell(x, h, c, w_ih, w_hh, b, interpret):
    return _forward(x, h, c, w_ih, w_hh, b, interpret)


@_fused_cell.defjvp
def _fused_cell_jvp(interpret, primals, tangents):
    """custom_JVP (not VJP, round-2 verdict #9): the tangent rule is the
    gate linearization in plain jnp (cheap, fusible; gates recomputed from
    the inputs), which JAX can partially evaluate, TRANSPOSE (first-order
    reverse = the same math the old handwritten VJP did) and differentiate
    again — so the Pallas forward stays usable under the architects'
    second-order AD instead of being silently swapped out."""
    x, h, c, w_ih, w_hh, b = primals
    tx, th, tc, twih, twhh, tb = tangents
    h_new, c_new = _fused_cell(x, h, c, w_ih, w_hh, b, interpret)
    f32 = jnp.float32
    gates = (jnp.dot(x, w_ih, preferred_element_type=f32)
             + jnp.dot(h, w_hh, preferred_element_type=f32) + b)
    hid = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :hid])
    f = jax.nn.sigmoid(gates[:, hid:2 * hid])
    g = jnp.tanh(gates[:, 2 * hid:3 * hid])
    o = jax.nn.sigmoid(gates[:, 3 * hid:])
    tanh_c = jnp.tanh(c_new)
    dgates = (jnp.dot(tx, w_ih, preferred_element_type=f32)
              + jnp.dot(x, twih, preferred_element_type=f32)
              + jnp.dot(th, w_hh, preferred_element_type=f32)
              + jnp.dot(h, twhh, preferred_element_type=f32) + tb)
    di = i * (1.0 - i) * dgates[:, :hid]
    df = f * (1.0 - f) * dgates[:, hid:2 * hid]
    dg = (1.0 - g * g) * dgates[:, 2 * hid:3 * hid]
    do = o * (1.0 - o) * dgates[:, 3 * hid:]
    dc_new = df * c.astype(f32) + f * tc + di * g + i * dg
    dh_new = do * tanh_c + o * (1.0 - tanh_c * tanh_c) * dc_new
    return (h_new, c_new), (dh_new.astype(f32), dc_new.astype(f32))


def lstm_cell_pallas(layer_params, x, h, c, dtype=None,
                     force_interpret: bool = False):
    """Drop-in replacement for ops.lstm.lstm_cell using the fused kernel.

    Off-TPU the kernel would only run in (slow) interpret mode, so we fall
    back to the jnp cell there — numerics match to fp32 tolerance (tested).
    Tests pass force_interpret=True to exercise the kernel itself on CPU.
    """
    if jax.default_backend() != "tpu" and not force_interpret:
        from lctvqa.ops.lstm import lstm_cell
        return lstm_cell(layer_params, x, h, c, dtype=dtype)
    w_ih, w_hh = layer_params["w_ih"], layer_params["w_hh"]
    b = layer_params["b_ih"] + layer_params["b_hh"]
    if dtype is not None:
        x = x.astype(dtype)
        h = h.astype(dtype)
        w_ih = w_ih.astype(dtype)
        w_hh = w_hh.astype(dtype)
    interpret = jax.default_backend() != "tpu"
    return _fused_cell(x, h.astype(x.dtype), c.astype(jnp.float32),
                       w_ih, w_hh, b.astype(jnp.float32), interpret)
