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


# ---------------------------------------------------------------------------
# Backward kernel. Recomputes the forward in VMEM (flash-attention style —
# the custom_vjp residuals are just the inputs) and emits COLUMNAR
# gradients: per-[C*N]-column reductions, so the cotangent of the widened
# tap rows flows back through _pack_params' jnp.repeat (which sums the
# N-groups) with no in-kernel scalar packing.
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, dw_ref, pw_ref, alpha_ref, g_ref,
                dx_ref, ddw_ref, dpw_ref, dalpha_ref,
                xp_ref, zp_ref, gp_ref, dxp_ref, t_ref, y_ref, o_ref,
                d_ref, *, H, W, C, N):
    """Gradients of the mixed op w.r.t. (x, wide dw taps, pw mats, alphas).

    dpw_ref is [8, C(co), C*N] columnar: entry (kidx, co, ci*N+n) =
    sum_hw t[ci]*do[co]; the wrapper sums the N-groups and transposes to
    the [ci, co] parameter layout. ddw_ref rows are full-width colsums
    (the true cotangent of the [T, C*N] widened taps).
    """
    cn = C * N
    inv_cnt = 1.0 / float(H * W * N)
    f32 = jnp.float32

    ddw_ref[:] = jnp.zeros((8, MAXT, cn), f32)
    dpw_ref[:] = jnp.zeros((8, C, cn), f32)
    dxp_ref[:] = jnp.zeros((H + 2 * PAD, W + 2 * PAD, cn), f32)
    dalpha = [jnp.float32(0.0)] * 8

    def fill(ref, value, border):
        ref[:] = jnp.full((H + 2 * PAD, W + 2 * PAD, cn), border,
                          ref.dtype)
        ref[PAD:PAD + H, PAD:PAD + W, :] = value.astype(ref.dtype)

    def tap(ref, dh, dw):
        return ref[PAD + dh:PAD + dh + H, PAD + dw:PAD + dw + W, :]

    def colsum(v):
        return jnp.sum(v, axis=(0, 1))                     # [CN]

    def seg(vec, c):
        return jnp.sum(vec[c * N:(c + 1) * N])

    def cvec(scalars):
        """[1,1,CN] from per-channel scalars."""
        return jnp.concatenate(
            [jnp.full((1, 1, N), s, f32) for s in scalars], axis=2)

    def dw_to_t(src_halo, taps, kidx):
        acc = None
        for t, (dh, dw) in enumerate(taps):
            v = tap(src_halo, dh, dw).astype(f32) * dw_ref[kidx, t, :]
            acc = v if acc is None else acc + v
        t_ref[:] = acc

    def pw_to(dst_ref, kidx):
        for co in range(C):
            acc = t_ref[:, :, 0:N] * pw_ref[kidx, 0, co]
            for ci in range(1, C):
                acc += t_ref[:, :, ci * N:(ci + 1) * N] \
                    * pw_ref[kidx, ci, co]
            dst_ref[:, :, co * N:(co + 1) * N] = acc.astype(dst_ref.dtype)

    def chan_stats_vecs(o32):
        """Columnar per-channel stats -> (mu_c, var_c lists)."""
        osum = colsum(o32)
        osq = colsum(jnp.square(o32))
        mus, vars_ = [], []
        for c in range(C):
            m = seg(osum, c) * inv_cnt
            v = seg(osq, c) * inv_cnt - m * m
            mus.append(m)
            vars_.append(v)
        return mus, vars_

    def fold_bwd(o32, alpha_idx):
        """d_ref <- dL/d o for out += alpha*BN(o); accumulates dalpha."""
        g = g_ref[:]
        mus, vars_ = chan_stats_vecs(o32)
        go = colsum(g * o32)
        gsum = colsum(g)
        a = alpha_ref[alpha_idx]
        coefs, gbars, k2s = [], [], []
        dal = jnp.float32(0.0)
        for c in range(C):
            r = jax.lax.rsqrt(vars_[c] + EPS)
            s_c = seg(go, c) - mus[c] * seg(gsum, c)
            dal += r * s_c
            coefs.append(a * r)
            gbars.append(seg(gsum, c) * inv_cnt)
            k2s.append(r * r * s_c * inv_cnt)
        dalpha[alpha_idx] = dalpha[alpha_idx] + dal
        d_ref[:] = cvec(coefs) * (g - cvec(gbars)
                                  - (o32 - cvec(mus)) * cvec(k2s))

    def pw_bwd(kidx):
        """Reads t (stage input) + d (output cotangent); writes the
        columnar dpw rows, then overwrites t with the input cotangent."""
        for co in range(C):
            dsl = d_ref[:, :, co * N:(co + 1) * N]
            tiled = jnp.concatenate([dsl] * C, axis=2)
            dpw_ref[kidx, co, :] = colsum(t_ref[:] * tiled)
        for ci in range(C):
            acc = d_ref[:, :, 0:N] * pw_ref[kidx, ci, 0]
            for co in range(1, C):
                acc += d_ref[:, :, co * N:(co + 1) * N] \
                    * pw_ref[kidx, ci, co]
            t_ref[:, :, ci * N:(ci + 1) * N] = acc

    def dw_bwd(src_halo, taps, kidx):
        """Reads t (= dt, the dw output cotangent) + src halo; writes the
        ddw tap rows, then d <- the dw input cotangent."""
        for t, (dh, dw) in enumerate(taps):
            ddw_ref[kidx, t, :] = colsum(
                tap(src_halo, dh, dw).astype(f32) * t_ref[:])
        fill(gp_ref, t_ref[:], 0.0)
        acc = None
        for t, (dh, dw) in enumerate(taps):
            v = tap(gp_ref, -dh, -dw) * dw_ref[kidx, t, :]
            acc = v if acc is None else acc + v
        d_ref[:] = acc

    # ---- branches --------------------------------------------------------
    fill(xp_ref, jnp.maximum(x_ref[:], 0), 0.0)            # relu(x) halo
    for b, (_, kk, dil, two_stage) in enumerate(BRANCHES):
        taps1 = _tap_offsets(kk, dil)
        # recompute forward (same materialization points as the fwd kernel)
        dw_to_t(xp_ref, taps1, 2 * b)
        pw_to(y_ref, 2 * b)                                # y1 (or dil o)
        if two_stage:
            y32 = y_ref[:].astype(f32)
            mus1, vars1 = chan_stats_vecs(y32)
            mu1v = cvec(mus1)
            r1v = cvec([jax.lax.rsqrt(v + EPS) for v in vars1])
            xhat = (y32 - mu1v) * r1v
            taps2 = _tap_offsets(kk, 1)
            fill(zp_ref, jnp.maximum(xhat, 0), 0.0)        # z halo
            dw_to_t(zp_ref, taps2, 2 * b + 1)
            pw_to(o_ref, 2 * b + 1)
            # backward
            fold_bwd(o_ref[:].astype(f32), 4 + b)
            pw_bwd(2 * b + 1)
            dw_bwd(zp_ref, taps2, 2 * b + 1)
            # relu + inner-BN backward: d_ref = dz -> dy1
            xhat = (y_ref[:].astype(f32) - mu1v) * r1v     # recompute
            dzp = d_ref[:] * (xhat > 0)
            s1 = colsum(dzp)
            s2 = colsum(dzp * xhat)
            m1v = cvec([seg(s1, c) * inv_cnt for c in range(C)])
            m2v = cvec([seg(s2, c) * inv_cnt for c in range(C)])
            d_ref[:] = r1v * (dzp - m1v - xhat * m2v)
            # pw1 backward needs t1 = dw1(relu x) again
            dw_to_t(xp_ref, taps1, 2 * b)
            pw_bwd(2 * b)
            dw_bwd(xp_ref, taps1, 2 * b)
        else:
            fold_bwd(y_ref[:].astype(f32), 4 + b)
            pw_bwd(2 * b)
            dw_bwd(xp_ref, taps1, 2 * b)
        # through the shared relu(x): mask and accumulate into dx
        dxp_ref[PAD:PAD + H, PAD:PAD + W, :] += \
            d_ref[:] * (x_ref[:].astype(f32) > 0)

    # ---- max pool --------------------------------------------------------
    taps3 = _tap_offsets(3, 1)
    fill(zp_ref, x_ref[:], -jnp.inf)                       # raw-x halo
    acc = None
    for dh, dw in taps3:
        v = tap(zp_ref, dh, dw).astype(f32)
        acc = v if acc is None else jnp.maximum(acc, v)
    t_ref[:] = acc                                         # maxval f32
    y_ref[:] = jnp.ones((H, W, cn), y_ref.dtype)           # remaining mask
    # the fwd folded the bf16-materialized max — stats/grads match that
    o_ref[:] = acc.astype(o_ref.dtype)
    fold_bwd(o_ref[:].astype(f32), 1)
    for dh, dw in taps3:
        eq = tap(zp_ref, dh, dw).astype(f32) == t_ref[:]
        # compare in f32 — Mosaic has no bf16 vector cmp on this target
        take = jnp.logical_and(eq, y_ref[:].astype(f32) > 0.5)
        dxp_ref[PAD + dh:PAD + dh + H, PAD + dw:PAD + dw + W, :] += \
            jnp.where(take, d_ref[:], 0.0)
        y_ref[:] = jnp.where(take, 0.0, y_ref[:].astype(f32)) \
            .astype(y_ref.dtype)

    # ---- avg pool --------------------------------------------------------
    fill(zp_ref, x_ref[:], 0.0)
    acc = None
    for dh, dw in taps3:
        v = tap(zp_ref, dh, dw).astype(f32)
        acc = v if acc is None else acc + v
    ih_idx = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
    iw_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    cnt_h = jnp.where((ih_idx == 0) | (ih_idx == H - 1), 2.0, 3.0)
    cnt_w = jnp.where((iw_idx == 0) | (iw_idx == W - 1), 2.0, 3.0)
    cnt = cnt_h * cnt_w
    o_ref[:] = (acc / cnt).astype(o_ref.dtype)
    fold_bwd(o_ref[:].astype(f32), 2)
    d_ref[:] = d_ref[:] / cnt
    for dh, dw in taps3:
        dxp_ref[PAD + dh:PAD + dh + H, PAD + dw:PAD + dw + W, :] += \
            d_ref[:]

    # ---- identity skip + finalize ---------------------------------------
    g = g_ref[:]
    x32 = x_ref[:].astype(f32)
    dxp_ref[PAD:PAD + H, PAD:PAD + W, :] += g * alpha_ref[3]
    dalpha[3] = jnp.sum(colsum(g * x32))
    dx_ref[:] = dxp_ref[PAD:PAD + H, PAD:PAD + W, :]
    dalpha_ref[0, :] = jnp.stack(dalpha)


def _mixed_bwd_call(xt, dws, pws, alphas, g, C: int, N: int,
                    interpret: bool = False):
    H, W, cn = xt.shape
    kern = functools.partial(_bwd_kernel, H=H, W=W, C=C, N=N)
    halo = pltpu.VMEM((H + 2 * PAD, W + 2 * PAD, cn), xt.dtype)
    halo32 = pltpu.VMEM((H + 2 * PAD, W + 2 * PAD, cn), jnp.float32)
    slab = pltpu.VMEM((H, W, cn), xt.dtype)
    slab32 = pltpu.VMEM((H, W, cn), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((H, W, cn), jnp.float32),       # dx
            jax.ShapeDtypeStruct((8, MAXT, cn), jnp.float32),    # ddw
            jax.ShapeDtypeStruct((8, C, cn), jnp.float32),       # dpw cols
            jax.ShapeDtypeStruct((1, 8), jnp.float32),           # dalpha
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[halo, halo, halo32, halo32, slab32, slab, slab,
                        slab32],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, dws, pws, alphas, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mixed_hwcn(xt, dws, pws, alphas, C, N, interpret):
    return mixed_op_pallas_hwcn(xt, dws, pws, alphas, C, N,
                                interpret=interpret)


def _mixed_hwcn_fwd(xt, dws, pws, alphas, C, N, interpret):
    return (_mixed_hwcn(xt, dws, pws, alphas, C, N, interpret),
            (xt, dws, pws, alphas))


def _mixed_hwcn_bwd(C, N, interpret, res, g):
    xt, dws, pws, alphas = res
    dxt, ddw, dpw_cols, dalpha = _mixed_bwd_call(
        xt, dws, pws, alphas, g.astype(jnp.float32), C, N, interpret)
    # columnar [8, co, ci*N+n] -> parameter layout [8, ci, co]
    dpw = jnp.swapaxes(
        dpw_cols.reshape(8, C, C, N).sum(axis=-1), 1, 2)
    return (dxt.astype(xt.dtype) if xt.dtype != jnp.float32 else dxt,
            ddw, dpw, dalpha.reshape(8))


_mixed_hwcn.defvjp(_mixed_hwcn_fwd, _mixed_hwcn_bwd)


def mixed_op_pallas(p, x, weights, dtype=None, interpret: bool = False):
    """Drop-in stride-1 replacement for models.search._mixed_fold.

    x: [N, H, W, Cs] (the partial-channel slice); returns [N, H, W, Cs]
    f32 — the alpha-weighted, final-BN-folded op mixture. Differentiable
    (first order) via the paired backward kernel; parameter/alpha
    cotangents flow back through _pack_params' jnp.repeat / scatter by
    XLA autodiff.
    """
    n, h, w, c = x.shape
    dws, pws = _pack_params(p, c, n)
    xd = x.astype(dtype) if dtype is not None else x
    # NHWC -> [H, W, C, N] -> [H, W, C*N]: one relayout in, one out; the
    # kernel's internal traffic happens in VMEM only.
    xt = jnp.transpose(xd, (1, 2, 3, 0)).reshape(h, w, c * n)
    out = _mixed_hwcn(xt, dws, pws, weights.astype(jnp.float32), c, n,
                      interpret)
    return jnp.transpose(out.reshape(h, w, c, n), (3, 0, 1, 2))
