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


# --------------------------------------------------------------------------
# Whole-sequence LSTM (final state only) — one kernel for the W encoder
# --------------------------------------------------------------------------

_VMEM_LIMIT = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)
_SEQ_VMEM_BUDGET = 80 * 1024 * 1024


def seq_eligible(b: int, t: int, emb: int, hid: int, dtype) -> bool:
    """Working set of the sequence kernels vs the VMEM budget: weights +
    gates + h/c scratch + x slabs (double-buffered) + per-step out slab."""
    s_ = jnp.dtype(dtype or jnp.float32).itemsize
    footprint = ((emb + hid) * 4 * hid * s_    # w_ih + w_hh
                 + b * 4 * hid * 4             # gates (f32)
                 + 6 * b * hid * 4             # h/c scratch + outs + temps
                 + 2 * b * emb * s_)           # streamed x slabs
    return footprint <= _SEQ_VMEM_BUDGET


def _seq_kernel(x_ref, h0_ref, c0_ref, wih_ref, whh_ref, b_ref,
                h_out_ref, c_out_ref, h_s, c_s):
    """grid=(T,): the TPU grid is sequential and scratch persists across
    iterations, so h_s/c_s carry the recurrence; x is streamed one [B, E]
    time-slab per iteration (weights stay VMEM-resident via their constant
    index_map)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    gates = (jnp.dot(x_ref[0].astype(wih_ref.dtype), wih_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(h_s[:].astype(whh_ref.dtype), whh_ref[:],
                       preferred_element_type=jnp.float32)
             + b_ref[:])
    hid = h_s.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hid])
    f = jax.nn.sigmoid(gates[:, hid:2 * hid])
    g = jnp.tanh(gates[:, 2 * hid:3 * hid])
    o = jax.nn.sigmoid(gates[:, 3 * hid:])
    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_s[:] = h_new
    c_s[:] = c_new

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        h_out_ref[:] = h_new
        c_out_ref[:] = c_new


def _seq_forward(xs, h0, c0, w_ih, w_hh, b, interpret: bool):
    seq, bsz, emb = xs.shape
    hid = h0.shape[-1]
    full = lambda *_: (0, 0)
    return pl.pallas_call(
        _seq_kernel,
        grid=(seq,),
        out_shape=(jax.ShapeDtypeStruct((bsz, hid), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, hid), jnp.float32)),
        in_specs=[
            pl.BlockSpec((1, bsz, emb), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((emb, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hid), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((bsz, hid), full, memory_space=pltpu.VMEM),
                   pl.BlockSpec((bsz, hid), full,
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((bsz, hid), jnp.float32),
                        pltpu.VMEM((bsz, hid), jnp.float32)],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(xs, h0, c0, w_ih, w_hh, b)


@functools.partial(jax.custom_jvp, nondiff_argnums=(6,))
def _fused_seq(xs, h0, c0, w_ih, w_hh, b, interpret):
    return _seq_forward(xs, h0, c0, w_ih, w_hh, b, interpret)


@_fused_seq.defjvp
def _fused_seq_jvp(interpret, primals, tangents):
    """Tangent rule: jax.jvp of the jnp scan (primal trajectory recomputed
    in jnp — same pattern as _fused_cell_jvp). Delegating to jax.jvp keeps
    the rule transposable (reverse mode) and re-differentiable (the
    architects' second-order AD); the kernel primal and the scan's
    recomputed trajectory agree to float tolerance, and the tangent scan
    only runs when the caller differentiates, so eval/serving pays
    nothing."""
    h_out, c_out = _fused_seq(*primals, interpret)

    def ref(xs, h0, c0, w_ih, w_hh, b):
        def step(carry, x):
            h, c = carry
            gates = (jnp.dot(x, w_ih, preferred_element_type=jnp.float32)
                     + jnp.dot(h.astype(w_hh.dtype), w_hh,
                               preferred_element_type=jnp.float32)
                     + b)
            hid = h.shape[-1]
            i = jax.nn.sigmoid(gates[:, :hid])
            f = jax.nn.sigmoid(gates[:, hid:2 * hid])
            g = jnp.tanh(gates[:, 2 * hid:3 * hid])
            o = jax.nn.sigmoid(gates[:, 3 * hid:])
            c_new = f * c + i * g
            return (o * jnp.tanh(c_new), c_new), None

        (h_n, c_n), _ = jax.lax.scan(step, (h0, c0), xs)
        return h_n, c_n

    _, (th, tc) = jax.jvp(ref, primals, tangents)
    return (h_out, c_out), (th, tc)


def lstm_seq_final_pallas(layer_params, xs, h0, c0, dtype=None,
                          force_interpret: bool = False,
                          use_pallas_fallback: bool = False):
    """Whole-sequence LSTM returning ONLY the final (h, c) — the W-model
    question encoder discards per-step outputs (`basic_vqa/models.py:56-62`
    uses just (h_n, c_n)), so the 30-step scan collapses to one kernel.

    xs [B, T, E]; h0/c0 [B, H] or None. Returns (h_n, c_n) each [B, H] f32.
    """
    b, t, emb = xs.shape
    hid = layer_params["w_hh"].shape[0]
    if ((jax.default_backend() != "tpu"
         or not seq_eligible(b, t, emb, hid, dtype))
            and not force_interpret):
        from lctvqa.ops.lstm import lstm
        _, (h_n, c_n) = lstm({"layers": [layer_params]}, xs,
                             h0=None if h0 is None else h0[None],
                             c0=None if c0 is None else c0[None],
                             dtype=dtype, use_pallas=use_pallas_fallback)
        return h_n[0], c_n[0]
    if h0 is None:
        h0 = jnp.zeros((b, hid), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((b, hid), jnp.float32)
    w_ih, w_hh = layer_params["w_ih"], layer_params["w_hh"]
    bias = (layer_params["b_ih"] + layer_params["b_hh"]).astype(
        jnp.float32)[None, :]
    cdt = dtype or jnp.float32
    xs_t = jnp.swapaxes(xs, 0, 1).astype(cdt)  # time-major for the grid
    interpret = force_interpret or jax.default_backend() != "tpu"
    return _fused_seq(xs_t, h0.astype(jnp.float32),
                      c0.astype(jnp.float32), w_ih.astype(cdt),
                      w_hh.astype(cdt), bias, interpret)


# --------------------------------------------------------------------------
# Whole-sequence LSTM with per-step outputs — the EF teacher-forced encoder
# --------------------------------------------------------------------------

def _seq_all_kernel(x_ref, h0_ref, c0_ref, wih_ref, whh_ref, b_ref,
                    out_ref, h_out_ref, c_out_ref, h_s, c_s):
    """Same time-grid recurrence as _seq_kernel but every step's h is
    emitted (the EF encoder's vocab head consumes all outputs,
    models_lct.py:96-122)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    gates = (jnp.dot(x_ref[0].astype(wih_ref.dtype), wih_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(h_s[:].astype(whh_ref.dtype), whh_ref[:],
                       preferred_element_type=jnp.float32)
             + b_ref[:])
    hid = h_s.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hid])
    f = jax.nn.sigmoid(gates[:, hid:2 * hid])
    g = jnp.tanh(gates[:, 2 * hid:3 * hid])
    o = jax.nn.sigmoid(gates[:, 3 * hid:])
    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_s[:] = h_new
    c_s[:] = c_new
    out_ref[0] = h_new

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        h_out_ref[:] = h_new
        c_out_ref[:] = c_new


def _seq_all_forward(xs, h0, c0, w_ih, w_hh, b, interpret: bool):
    seq, bsz, emb = xs.shape
    hid = h0.shape[-1]
    full = lambda *_: (0, 0)
    return pl.pallas_call(
        _seq_all_kernel,
        grid=(seq,),
        out_shape=(jax.ShapeDtypeStruct((seq, bsz, hid), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, hid), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, hid), jnp.float32)),
        in_specs=[
            pl.BlockSpec((1, bsz, emb), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((emb, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hid), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, bsz, hid), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bsz, hid), full,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bsz, hid), full,
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((bsz, hid), jnp.float32),
                        pltpu.VMEM((bsz, hid), jnp.float32)],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(xs, h0, c0, w_ih, w_hh, b)


@functools.partial(jax.custom_jvp, nondiff_argnums=(6,))
def _fused_seq_all(xs, h0, c0, w_ih, w_hh, b, interpret):
    return _seq_all_forward(xs, h0, c0, w_ih, w_hh, b, interpret)


@_fused_seq_all.defjvp
def _fused_seq_all_jvp(interpret, primals, tangents):
    """Tangent rule via jax.jvp of the jnp scan (see _fused_seq_jvp)."""
    outs, h_out, c_out = _fused_seq_all(*primals, interpret)

    def ref(xs, h0, c0, w_ih, w_hh, b):
        def step(carry, x):
            h, c = carry
            gates = (jnp.dot(x, w_ih, preferred_element_type=jnp.float32)
                     + jnp.dot(h.astype(w_hh.dtype), w_hh,
                               preferred_element_type=jnp.float32)
                     + b)
            hid = h.shape[-1]
            i = jax.nn.sigmoid(gates[:, :hid])
            f = jax.nn.sigmoid(gates[:, hid:2 * hid])
            g = jnp.tanh(gates[:, 2 * hid:3 * hid])
            o = jax.nn.sigmoid(gates[:, 3 * hid:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_n, c_n), hs = jax.lax.scan(step, (h0, c0), xs)
        return hs, h_n, c_n

    _, t_out = jax.jvp(ref, primals, tangents)
    return (outs, h_out, c_out), t_out


def lstm_seq_pallas(layer_params, xs, h0, c0, dtype=None,
                    force_interpret: bool = False,
                    use_pallas_fallback: bool = False):
    """Whole-sequence LSTM with per-step outputs as one kernel.

    xs [B, T, E]; h0/c0 [B, H] or None.
    Returns (outputs [B, T, H] f32, (h_n, c_n) each [B, H] f32).
    """
    b, t, emb = xs.shape
    hid = layer_params["w_hh"].shape[0]
    if ((jax.default_backend() != "tpu"
         or not seq_eligible(b, t, emb, hid, dtype))
            and not force_interpret):
        from lctvqa.ops.lstm import lstm
        outs, (h_n, c_n) = lstm({"layers": [layer_params]}, xs,
                                h0=None if h0 is None else h0[None],
                                c0=None if c0 is None else c0[None],
                                dtype=dtype, use_pallas=use_pallas_fallback)
        return outs, (h_n[0], c_n[0])
    if h0 is None:
        h0 = jnp.zeros((b, hid), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((b, hid), jnp.float32)
    cdt = dtype or jnp.float32
    bias = (layer_params["b_ih"] + layer_params["b_hh"]).astype(
        jnp.float32)[None, :]
    xs_t = jnp.swapaxes(xs, 0, 1).astype(cdt)
    interpret = force_interpret or jax.default_backend() != "tpu"
    outs, h_n, c_n = _fused_seq_all(
        xs_t, h0.astype(jnp.float32), c0.astype(jnp.float32),
        layer_params["w_ih"].astype(cdt), layer_params["w_hh"].astype(cdt),
        bias, interpret)
    return jnp.swapaxes(outs, 0, 1), (h_n, c_n)
