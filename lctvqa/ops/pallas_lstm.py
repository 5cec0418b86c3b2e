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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_cell(x, h, c, w_ih, w_hh, b, interpret):
    return _forward(x, h, c, w_ih, w_hh, b, interpret)


def _fused_cell_fwd(x, h, c, w_ih, w_hh, b, interpret):
    # recompute gate activations for the backward in jnp (cheap, fusible)
    h_new, c_new = _forward(x, h, c, w_ih, w_hh, b, interpret)
    return (h_new, c_new), (x, h, c, w_ih, w_hh, b)


def _fused_cell_bwd(interpret, res, grads):
    x, h, c, w_ih, w_hh, b = res
    dh_new, dc_new = grads
    gates = (jnp.dot(x, w_ih, preferred_element_type=jnp.float32)
             + jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b)
    hid = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :hid])
    f = jax.nn.sigmoid(gates[:, hid:2 * hid])
    g = jnp.tanh(gates[:, 2 * hid:3 * hid])
    o = jax.nn.sigmoid(gates[:, 3 * hid:])
    c_new = f * c + i * g
    tanh_c = jnp.tanh(c_new)
    do = dh_new * tanh_c
    dc_total = dc_new + dh_new * o * (1.0 - tanh_c * tanh_c)
    di = dc_total * g
    df = dc_total * c
    dg = dc_total * i
    dc = dc_total * f
    dgates = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=-1)
    dx = jnp.dot(dgates, w_ih.T, preferred_element_type=jnp.float32)
    dh = jnp.dot(dgates, w_hh.T, preferred_element_type=jnp.float32)
    dw_ih = jnp.dot(x.T, dgates, preferred_element_type=jnp.float32)
    dw_hh = jnp.dot(h.T, dgates, preferred_element_type=jnp.float32)
    db = jnp.sum(dgates, axis=0)
    return (dx.astype(x.dtype), dh.astype(h.dtype), dc, dw_ih.astype(
        w_ih.dtype), dw_hh.astype(w_hh.dtype), db)


_fused_cell.defvjp(_fused_cell_fwd, _fused_cell_bwd)


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
