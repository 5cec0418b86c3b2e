"""Pallas TPU kernel: one PC-DARTS partial-channel mixed op in VMEM.

The BASELINE.json north star names "mixed-op cells run as a single batched
weighted-op kernel with architecture-weight softmax fused in". After the
BN-fold (models/search.py:_mixed_fold) the XLA execution is LAYOUT-COPY
bound: each edge's ~25 tiny-channel ops (Cs = C/k = 4..16) materialize
intermediates to HBM in rotating layouts (NOTES.md profile: 27.6 of 42.7
device-ms are copies). This kernel runs ONE stride-1 mixed op — all four
depthwise-separable branches, both pools, the identity skip, their folded
final BNs and the alpha mixture (reference semantics:
`pcdarts/model_search.py:41-55`, `operations.py:4-20`) — as a single
Pallas program whose only HBM traffic is: read x once, write the mixture
once. Everything else lives in VMEM.

Layout: the kernel consumes x as [H, W, Cs*N] with channel-major flatten
(c*N + n). Cs*N is a multiple of 128 (lane-exact, no tile padding: the
same tensor as NHWC [N,H,W,4] pads its tiles 8-32x), W sits on sublanes
(spatial shifts are cheap strided slices), H is an untiled leading dim
(shifts are free row offsets). Depthwise taps arrive as full-width
[T, Cs*N] coefficient rows (per-channel values repeated N times, built
once outside), so every kernel memory op is lane-full — no per-channel
slicing in the tap loops. Per-(branch, channel) BN statistics and mixture
coefficients are scalars held in registers.

Branch schedule (one branch temporary at a time, ~3 slabs live):
  for each branch b:  o_b = branch(x)          # VMEM slab
                      mean/var_c over its N-group lanes -> coef scalars
                      acc += coef_bc * o_b ; bias_c += coef_bc * mean_bc
  out = acc - bias  (+ alpha_skip * x for the identity term)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5

# (name, first-stage taps kk, dilation, two-stage?)
BRANCHES = (
    ("sep_conv_3x3", 3, 1, True),
    ("sep_conv_5x5", 5, 1, True),
    ("dil_conv_3x3", 3, 2, False),
    ("dil_conv_5x5", 5, 2, False),
)
MAXT = 25


def _tap_offsets(kk: int, dil: int):
    half = (kk - 1) // 2 * dil
    return [(dh, dw) for dh in range(-half, half + 1, dil)
            for dw in range(-half, half + 1, dil)]


def _shift_slices(h: int, w: int, dh: int, dw: int):
    """Zero-padded shift: out[oh, ow] += x[oh+dh, ow+dw] over the valid
    region. Returns (out_h, out_w, in_h, in_w) static slices."""
    oh = slice(max(0, -dh), h - max(0, dh))
    ow = slice(max(0, -dw), w - max(0, dw))
    ih = slice(max(0, dh), h + min(0, dh))
    iw = slice(max(0, dw), w + min(0, dw))
    return oh, ow, ih, iw


PAD = 4  # halo: max offset of any tap (dil5: (5-1)//2*2)


def _kernel(x_ref, dw_ref, pw_ref, alpha_ref, out_ref, xp_ref, o_ref,
            t_ref, *, H, W, C, N):
    """x_ref [H,W,C*N] compute-dtype; dw_ref [8, MAXT, C*N] f32 (row 2b =
    stage1 of branch b, 2b+1 = stage2; per-channel taps repeated N-wide);
    pw_ref [8, C, C] f32 in SMEM; alpha_ref [8] f32 in SMEM (PRIMITIVES
    order: none, max_pool, avg_pool, skip, sep3, sep5, dil3, dil5);
    out_ref [H,W,C*N] f32.

    Scratch: xp [H+2P, W+2P, C*N] haloed input at the compute dtype —
    every conv/pool tap is then an ALIGNED full [H,W,C*N] read, so a
    depthwise conv is a pure value-chain sum (register-streamed by
    Mosaic), never a read-modify-write per tap (the v1 kernel did that
    and burned ~10x the necessary VMEM traffic). o / t are [H,W,C*N]
    slabs (compute dtype / fp32 accumulator)."""
    cn = C * N
    inv_cnt = 1.0 / float(H * W * N)
    bias = [jnp.float32(0.0)] * C                          # register scalars

    def fill_halo(value, border):
        xp_ref[:] = jnp.full((H + 2 * PAD, W + 2 * PAD, cn), border,
                             xp_ref.dtype)
        xp_ref[PAD:PAD + H, PAD:PAD + W, :] = value.astype(xp_ref.dtype)

    def tap_read(dh, dw):
        return xp_ref[PAD + dh:PAD + dh + H, PAD + dw:PAD + dw + W, :]

    def dw_to_t(taps, kidx):
        """t = depthwise(xp): value-chain of aligned shifted reads."""
        acc = None
        for t, (dh, dw) in enumerate(taps):
            v = tap_read(dh, dw).astype(jnp.float32) * dw_ref[kidx, t, :]
            acc = v if acc is None else acc + v
        t_ref[:] = acc

    def pw_to_o(kidx):
        """o[co] = sum_ci pw[kidx, ci, co] * t[ci] (1x1 conv)."""
        for co in range(C):
            acc = t_ref[:, :, 0:N] * pw_ref[kidx, 0, co]
            for ci in range(1, C):
                acc += t_ref[:, :, ci * N:(ci + 1) * N] \
                    * pw_ref[kidx, ci, co]
            o_ref[:, :, co * N:(co + 1) * N] = acc.astype(o_ref.dtype)

    def channel_stats(ref):
        """Per-channel (mean, var) over H, W and the channel's N lanes."""
        x32 = ref[:].astype(jnp.float32)
        colsum = jnp.sum(x32, axis=(0, 1))                 # [CN]
        colsq = jnp.sum(jnp.square(x32), axis=(0, 1))
        stats = []
        for c in range(C):
            s = jnp.sum(colsum[c * N:(c + 1) * N]) * inv_cnt
            sq = jnp.sum(colsq[c * N:(c + 1) * N]) * inv_cnt
            stats.append((s, sq - s * s))
        return stats

    def fold_into_mixture(ref, alpha):
        """out += alpha * rsqrt(var+eps) * o; bias += same * mean."""
        for c, (mean, var) in enumerate(channel_stats(ref)):
            coef = alpha * jax.lax.rsqrt(var + EPS)
            seg = slice(c * N, (c + 1) * N)
            out_ref[:, :, seg] += ref[:, :, seg].astype(jnp.float32) * coef
            bias[c] = bias[c] + coef * mean

    # identity skip term (no BN; stride-1 skip is raw x)
    out_ref[:] = x_ref[:].astype(jnp.float32) * alpha_ref[3]

    # ---- four depthwise-separable branches: shared halo = relu(x) --------
    xp_is_relu_x = False
    for b, (_, kk, dil, two_stage) in enumerate(BRANCHES):
        if not xp_is_relu_x:        # (re)build after a stage-2 overwrite
            fill_halo(jnp.maximum(x_ref[:], 0), 0.0)
            xp_is_relu_x = True
        dw_to_t(_tap_offsets(kk, dil), 2 * b)              # dw1(relu(x))
        pw_to_o(2 * b)                                     # pw1 -> o
        if two_stage:
            # inner BN (affine-free, own batch stats) + ReLU -> halo
            stats = channel_stats(o_ref)
            # [1,1,CN] per-channel vectors (2D+ shapes for TPU lowering)
            mean_vec = jnp.concatenate(
                [jnp.full((1, 1, N), m, jnp.float32) for m, _ in stats],
                axis=2)
            rstd_vec = jnp.concatenate(
                [jnp.full((1, 1, N), jax.lax.rsqrt(v + EPS), jnp.float32)
                 for _, v in stats], axis=2)
            fill_halo(jnp.maximum(
                (o_ref[:].astype(jnp.float32) - mean_vec) * rstd_vec, 0),
                0.0)
            xp_is_relu_x = False
            dw_to_t(_tap_offsets(kk, 1), 2 * b + 1)        # dw2
            pw_to_o(2 * b + 1)                             # pw2 -> o
        fold_into_mixture(o_ref, alpha_ref[4 + b])

    # ---- max pool 3x3 (stride 1, pad 1; final BN folded) -----------------
    fill_halo(x_ref[:], -jnp.inf)
    acc = None
    for dh, dw in _tap_offsets(3, 1):
        v = tap_read(dh, dw).astype(jnp.float32)
        acc = v if acc is None else jnp.maximum(acc, v)
    o_ref[:] = acc.astype(o_ref.dtype)
    fold_into_mixture(o_ref, alpha_ref[1])

    # ---- avg pool 3x3 (count_include_pad=False) --------------------------
    fill_halo(x_ref[:], 0.0)
    acc = None
    for dh, dw in _tap_offsets(3, 1):
        v = tap_read(dh, dw).astype(jnp.float32)
        acc = v if acc is None else acc + v
    # divide by the per-position valid-window count (3 interior, 2 edge);
    # built from iota compares — .at[].set would lower to scatter, which
    # Mosaic does not support
    ih_idx = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
    iw_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    cnt_h = jnp.where((ih_idx == 0) | (ih_idx == H - 1), 2.0, 3.0)
    cnt_w = jnp.where((iw_idx == 0) | (iw_idx == W - 1), 2.0, 3.0)
    o_ref[:] = (acc / (cnt_h * cnt_w)).astype(o_ref.dtype)
    fold_into_mixture(o_ref, alpha_ref[2])

    # ---- subtract the folded-BN bias per channel -------------------------
    for c in range(C):
        seg = slice(c * N, (c + 1) * N)
        out_ref[:, :, seg] -= bias[c]


def _pack_params(p, C: int, N: int) -> tuple[jax.Array, jax.Array]:
    """Stack per-branch dw taps as full-width [8, MAXT, C*N] rows (each
    channel's tap value repeated N-wide) and pw mats [8, C, C], from the
    mixed-op param pytree (models/search.py naming)."""
    dw_list, pw_list = [], []
    for b, (name, kk, dil, two_stage) in enumerate(BRANCHES):
        bp = p[name]
        if two_stage:
            dw_list += [(2 * b, bp["dw1"]["w"], kk),
                        (2 * b + 1, bp["dw2"]["w"], kk)]
            pw_list += [(2 * b, bp["pw1"]["w"]), (2 * b + 1, bp["pw2"]["w"])]
        else:
            dw_list += [(2 * b, bp["dw"]["w"], kk)]
            pw_list += [(2 * b, bp["pw"]["w"])]
    dws = jnp.zeros((8, MAXT, C * N), jnp.float32)
    pws = jnp.zeros((8, C, C), jnp.float32)
    for idx, w, kk in dw_list:
        taps = w.reshape(kk * kk, C)                      # [T, C]
        wide = jnp.repeat(taps, N, axis=1)                # [T, C*N]
        dws = dws.at[idx, : kk * kk].set(wide)
    for idx, w in pw_list:
        pws = pws.at[idx].set(w[0, 0])                    # [ci, co]
    return dws, pws


def mixed_op_pallas_hwcn(x_hwcn, dws, pws, alphas, C: int, N: int,
                         interpret: bool = False):
    """Raw kernel call on the [H, W, C*N] layout (see module doc)."""
    H, W, cn = x_hwcn.shape
    assert cn == C * N
    kern = functools.partial(_kernel, H=H, W=W, C=C, N=N)
    # xp: haloed input at the compute dtype; o holds materialized
    # activations at the compute dtype (one rounding per stage, like XLA's
    # conv epilogues); t is the fp32 accumulator for the tap/MAC sums
    # (like the MXU's internal fp32 accumulation).
    halo = pltpu.VMEM((H + 2 * PAD, W + 2 * PAD, cn), x_hwcn.dtype)
    slab = pltpu.VMEM((H, W, cn), x_hwcn.dtype)
    slab32 = pltpu.VMEM((H, W, cn), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, W, cn), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[halo, slab, slab32],
        # ~9 MB of named slabs + full-slab fp32 temporaries exceed the
        # conservative 16 MB scoped-vmem default at cell-0 sizes; v5e has
        # 128 MiB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_hwcn, dws, pws, alphas)


def mixed_op_pallas(p, x, weights, dtype=None, interpret: bool = False):
    """Drop-in stride-1 replacement for models.search._mixed_fold.

    x: [N, H, W, Cs] (the partial-channel slice); returns [N, H, W, Cs]
    f32 — the alpha-weighted, final-BN-folded op mixture.
    """
    n, h, w, c = x.shape
    dws, pws = _pack_params(p, c, n)
    xd = x.astype(dtype) if dtype is not None else x
    # NHWC -> [H, W, C, N] -> [H, W, C*N]: one relayout in, one out; the
    # kernel's internal traffic happens in VMEM only.
    xt = jnp.transpose(xd, (1, 2, 3, 0)).reshape(h, w, c * n)
    out = mixed_op_pallas_hwcn(xt, dws, pws,
                               weights.astype(jnp.float32), c, n,
                               interpret=interpret)
    return jnp.transpose(out.reshape(h, w, c, n), (3, 0, 1, 2))
