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
once outside), so every kernel memory op is lane-full. The input is
written once into a haloed VMEM scratch, so every conv/pool tap is an
ALIGNED read and a depthwise conv is a pure value-chain sum — never a
read-modify-write per tap (an earlier version did that and burned ~10x
the necessary VMEM traffic).

All row-dimension work runs in `lax.fori_loop` chunks of CH rows: Mosaic
fully unrolls vector ops into vregs, so full-slab expressions at cell-0
sizes ([64, 64, 256]) made the compiler take >25 minutes; with chunked
bodies only one chunk's ops are compiled.

Gradients: a custom_vjp pairs the forward with a backward kernel that
recomputes the forward in VMEM (flash-attention style — the residuals are
just the inputs) and emits COLUMNAR gradients (per-[C*N]-column
reductions), so the cotangent of the widened tap rows flows back through
_pack_params' jnp.repeat with no in-kernel scalar packing. First-order
only (custom_vjp has no JVP rule): the architects exclude this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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
PAD = 4  # halo: max offset of any tap (dil5: (5-1)//2*2)


def _tap_offsets(kk: int, dil: int):
    half = (kk - 1) // 2 * dil
    return [(dh, dw) for dh in range(-half, half + 1, dil)
            for dw in range(-half, half + 1, dil)]


def _chunk_rows(h: int, w: int, cn: int) -> int:
    """Rows per fori_loop chunk: ~256K elements per chunk body keeps the
    Mosaic vreg unrolling bounded (compile ~1 min/kernel) while small
    shapes run as a single chunk (no loop overhead — measured faster)."""
    ch = max(1, min(h, 262144 // (w * cn)))
    while h % ch:
        ch -= 1
    return ch


class _Ctx:
    """Shared chunked-loop helpers over the [H, W, C*N] row dimension."""

    def __init__(self, H, W, C, N):
        self.H, self.W, self.C, self.N = H, W, C, N
        self.cn = C * N
        self.ch = _chunk_rows(H, W, self.cn)
        self.nck = H // self.ch
        self.inv_cnt = 1.0 / float(H * W * N)

    def loop(self, body):
        """body(r0) for r0 = 0, CH, ..., H-CH (dynamic row starts)."""
        ch = self.ch
        jax.lax.fori_loop(0, self.nck,
                          lambda i, c: (body(i * ch), c)[1], 0)

    def reduce2(self, chunk_fn):
        """Sum chunk_fn(r0) -> ([1,cn], [1,cn]) partials over all rows."""
        z = jnp.zeros((1, self.cn), jnp.float32)

        def b(i, carry):
            a, q = chunk_fn(i * self.ch)
            return carry[0] + a, carry[1] + q

        return jax.lax.fori_loop(0, self.nck, b, (z, z))

    def seg(self, vec, c):
        return jnp.sum(vec[:, c * self.N:(c + 1) * self.N])

    def cvec(self, scalars):
        """[1,1,cn] broadcast vector from per-channel scalars."""
        return jnp.concatenate(
            [jnp.full((1, 1, self.N), s, jnp.float32) for s in scalars],
            axis=2)

    def fill_halo(self, halo_ref, chunk_fn, border):
        """halo <- border-padded value; chunk_fn(r0) -> (CH, W, cn)."""
        H, W, cn, ch = self.H, self.W, self.cn, self.ch
        wp = W + 2 * PAD
        halo_ref[0:PAD] = jnp.full((PAD, wp, cn), border, halo_ref.dtype)
        halo_ref[PAD + H:] = jnp.full((PAD, wp, cn), border,
                                      halo_ref.dtype)

        def body(r0):
            halo_ref[pl.ds(PAD + r0, ch), :, :] = jnp.full(
                (ch, wp, cn), border, halo_ref.dtype)
            halo_ref[pl.ds(PAD + r0, ch), PAD:PAD + W, :] = \
                chunk_fn(r0).astype(halo_ref.dtype)

        self.loop(body)

    def tap(self, halo_ref, r0, dh, dw):
        """(CH, W, cn) aligned read at tap offset (dh, dw)."""
        return halo_ref[pl.ds(PAD + r0 + dh, self.ch),
                        PAD + dw:PAD + dw + self.W, :]

    def dw_chunk(self, halo_ref, dw_ref, taps, kidx, r0):
        """Depthwise-conv value chain for one row chunk -> (CH,W,cn) f32."""
        acc = None
        for t, (dh, dw) in enumerate(taps):
            v = self.tap(halo_ref, r0, dh, dw).astype(jnp.float32) \
                * dw_ref[kidx, t, :]
            acc = v if acc is None else acc + v
        return acc

    def pw_chunk(self, src_ref, pw_ref, kidx, r0, transpose=False):
        """Pointwise conv for one row chunk -> (CH,W,cn) f32.
        transpose=True applies the transposed matrix (backward)."""
        C, N, ch = self.C, self.N, self.ch
        outs = []
        for co in range(C):
            acc = None
            for ci in range(C):
                s = (pw_ref[kidx, co, ci] if transpose
                     else pw_ref[kidx, ci, co])
                v = src_ref[pl.ds(r0, ch), :, ci * N:(ci + 1) * N] \
                    .astype(jnp.float32) * s
                acc = v if acc is None else acc + v
            outs.append(acc)
        return jnp.concatenate(outs, axis=2)

    def colsums(self, ref):
        """(sum, sumsq) per column over all rows -> ([1,cn], [1,cn])."""
        ch = self.ch

        def chunk(r0):
            v = ref[pl.ds(r0, ch), :, :].astype(jnp.float32)
            return (jnp.sum(v, axis=(0, 1))[None, :],
                    jnp.sum(v * v, axis=(0, 1))[None, :])

        return self.reduce2(chunk)

    def channel_stats(self, ref):
        s, q = self.colsums(ref)
        stats = []
        for c in range(self.C):
            m = self.seg(s, c) * self.inv_cnt
            v = self.seg(q, c) * self.inv_cnt - m * m
            stats.append((m, v))
        return stats


def _kernel(x_ref, dw_ref, pw_ref, alpha_ref, out_ref, xp_ref, o_ref,
            t_ref, *, H, W, C, N):
    """x_ref [H,W,C*N] compute-dtype; dw_ref [8, MAXT, C*N] f32 (row 2b =
    stage1 of branch b, 2b+1 = stage2; per-channel taps repeated N-wide);
    pw_ref [8, C, C] f32 in SMEM; alpha_ref [8] f32 in SMEM (PRIMITIVES
    order: none, max_pool, avg_pool, skip, sep3, sep5, dil3, dil5);
    out_ref [H,W,C*N] f32. Scratch: xp haloed input (compute dtype),
    o slab (compute dtype), t slab (f32)."""
    cx = _Ctx(H, W, C, N)
    ch = cx.ch
    f32 = jnp.float32
    bias_vecs = []                     # [1,1,cn] vectors, summed at the end

    def branch_stage(halo_ref, taps, kidx):
        """o <- pw(dw(halo)); t holds the dw output (kept for reuse)."""
        def body(r0):
            t_ref[pl.ds(r0, ch)] = cx.dw_chunk(halo_ref, dw_ref, taps,
                                               kidx, r0)
        cx.loop(body)

        def body2(r0):
            o_ref[pl.ds(r0, ch)] = cx.pw_chunk(t_ref, pw_ref, kidx, r0) \
                .astype(o_ref.dtype)
        cx.loop(body2)

    def fold(ref, alpha):
        stats = cx.channel_stats(ref)
        coefs, biases = [], []
        for mean, var in stats:
            r = jax.lax.rsqrt(var + EPS)
            coefs.append(alpha * r)
            biases.append(alpha * r * mean)
        coef_vec = cx.cvec(coefs)
        bias_vecs.append(cx.cvec(biases))

        def body(r0):
            out_ref[pl.ds(r0, ch)] += \
                ref[pl.ds(r0, ch)].astype(f32) * coef_vec
        cx.loop(body)

    # identity skip term (no BN; stride-1 skip is raw x)
    a_skip = alpha_ref[3]
    cx.loop(lambda r0: out_ref.__setitem__(
        pl.ds(r0, ch), x_ref[pl.ds(r0, ch)].astype(f32) * a_skip))

    # ---- four depthwise-separable branches: shared halo = relu(x) --------
    xp_is_relu_x = False
    for b, (_, kk, dil, two_stage) in enumerate(BRANCHES):
        if not xp_is_relu_x:          # (re)build after a stage-2 overwrite
            cx.fill_halo(xp_ref, lambda r0: jnp.maximum(
                x_ref[pl.ds(r0, ch)], 0), 0.0)
            xp_is_relu_x = True
        branch_stage(xp_ref, _tap_offsets(kk, dil), 2 * b)
        if two_stage:
            # inner BN (affine-free, own batch stats) + ReLU -> halo
            stats = cx.channel_stats(o_ref)
            mean_vec = cx.cvec([m for m, _ in stats])
            rstd_vec = cx.cvec([jax.lax.rsqrt(v + EPS) for _, v in stats])
            cx.fill_halo(xp_ref, lambda r0: jnp.maximum(
                (o_ref[pl.ds(r0, ch)].astype(f32) - mean_vec) * rstd_vec,
                0), 0.0)
            xp_is_relu_x = False
            branch_stage(xp_ref, _tap_offsets(kk, 1), 2 * b + 1)
        fold(o_ref, alpha_ref[4 + b])

    # ---- max pool 3x3 (stride 1, pad 1; final BN folded) -----------------
    taps3 = _tap_offsets(3, 1)
    cx.fill_halo(xp_ref, lambda r0: x_ref[pl.ds(r0, ch)], -jnp.inf)

    def maxbody(r0):
        acc = None
        for dh, dw in taps3:
            v = cx.tap(xp_ref, r0, dh, dw).astype(f32)
            acc = v if acc is None else jnp.maximum(acc, v)
        o_ref[pl.ds(r0, ch)] = acc.astype(o_ref.dtype)
    cx.loop(maxbody)
    fold(o_ref, alpha_ref[1])

    # ---- avg pool 3x3 (count_include_pad=False) --------------------------
    cx.fill_halo(xp_ref, lambda r0: x_ref[pl.ds(r0, ch)], 0.0)

    def avgbody(r0):
        acc = None
        for dh, dw in taps3:
            v = cx.tap(xp_ref, r0, dh, dw).astype(f32)
            acc = v if acc is None else acc + v
        # per-position valid-window count (3 interior, 2 at the borders)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0) + r0
        widx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        cnt_h = jnp.where((ridx == 0) | (ridx == H - 1), 2.0, 3.0)
        cnt_w = jnp.where((widx == 0) | (widx == W - 1), 2.0, 3.0)
        o_ref[pl.ds(r0, ch)] = (acc / (cnt_h * cnt_w)).astype(o_ref.dtype)
    cx.loop(avgbody)
    fold(o_ref, alpha_ref[2])

    # ---- subtract the folded-BN biases ----------------------------------
    bias_total = bias_vecs[0]
    for v in bias_vecs[1:]:
        bias_total = bias_total + v
    cx.loop(lambda r0: out_ref.__setitem__(
        pl.ds(r0, ch), out_ref[pl.ds(r0, ch)] - bias_total))


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


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def mixed_op_pallas_hwcn(x_hwcn, dws, pws, alphas, C: int, N: int,
                         interpret: bool = False):
    """Raw forward kernel call on the [H, W, C*N] layout."""
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
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x_hwcn, dws, pws, alphas)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, dw_ref, pw_ref, alpha_ref, g_ref,
                dx_ref, ddw_ref, dpw_ref, dalpha_ref,
                xp_ref, zp_ref, gp_ref, dxp_ref, t_ref, y_ref, o_ref,
                d_ref, *, H, W, C, N):
    """Gradients of the mixed op w.r.t. (x, wide dw taps, pw mats, alphas).

    dpw_ref is [8, C(co), C*N] columnar: entry (kidx, co, ci*N+n) =
    sum_hw t[ci]*do[co]; the wrapper sums the N-groups and transposes to
    the [ci, co] parameter layout. ddw_ref rows are full-width colsums
    (the true cotangent of the [T, C*N] widened taps). dalpha is [1, 8].
    """
    cx = _Ctx(H, W, C, N)
    ch = cx.ch
    cn = cx.cn
    f32 = jnp.float32

    ddw_ref[:] = jnp.zeros((8, MAXT, cn), f32)
    dpw_ref[:] = jnp.zeros((8, C, cn), f32)
    cx.fill_halo(dxp_ref, lambda r0: jnp.zeros((ch, W, cn), f32), 0.0)
    dalpha = [jnp.float32(0.0)] * 8

    def dw_to_t(halo_ref, taps, kidx):
        cx.loop(lambda r0: t_ref.__setitem__(
            pl.ds(r0, ch), cx.dw_chunk(halo_ref, dw_ref, taps, kidx, r0)))

    def pw_to(dst_ref, kidx):
        cx.loop(lambda r0: dst_ref.__setitem__(
            pl.ds(r0, ch),
            cx.pw_chunk(t_ref, pw_ref, kidx, r0).astype(dst_ref.dtype)))

    def fold_bwd(o_sl, alpha_idx):
        """d <- dL/d o for out += alpha*BN(o); accumulates dalpha."""
        osum, osq = cx.colsums(o_sl)

        def gchunk(r0):
            g = g_ref[pl.ds(r0, ch)]
            o32 = o_sl[pl.ds(r0, ch)].astype(f32)
            return (jnp.sum(g, axis=(0, 1))[None, :],
                    jnp.sum(g * o32, axis=(0, 1))[None, :])
        gsum, go = cx.reduce2(gchunk)

        a = alpha_ref[alpha_idx]
        coefs, gbars, k2s, mus = [], [], [], []
        dal = jnp.float32(0.0)
        for c in range(C):
            mu = cx.seg(osum, c) * cx.inv_cnt
            var = cx.seg(osq, c) * cx.inv_cnt - mu * mu
            r = jax.lax.rsqrt(var + EPS)
            s_c = cx.seg(go, c) - mu * cx.seg(gsum, c)
            dal += r * s_c
            mus.append(mu)
            coefs.append(a * r)
            gbars.append(cx.seg(gsum, c) * cx.inv_cnt)
            k2s.append(r * r * s_c * cx.inv_cnt)
        dalpha[alpha_idx] = dalpha[alpha_idx] + dal
        coefv, gbarv = cx.cvec(coefs), cx.cvec(gbars)
        muv, k2v = cx.cvec(mus), cx.cvec(k2s)

        def body(r0):
            g = g_ref[pl.ds(r0, ch)]
            o32 = o_sl[pl.ds(r0, ch)].astype(f32)
            d_ref[pl.ds(r0, ch)] = coefv * (g - gbarv - (o32 - muv) * k2v)
        cx.loop(body)

    def pw_bwd(kidx):
        """Reads t (stage input) + d (output cotangent); writes columnar
        dpw rows, then overwrites t with the input cotangent."""
        for co in range(C):
            def chunk(r0, co=co):
                dsl = d_ref[pl.ds(r0, ch), :, co * N:(co + 1) * N]
                tiled = jnp.concatenate([dsl] * C, axis=2)
                v = t_ref[pl.ds(r0, ch)] * tiled
                return (jnp.sum(v, axis=(0, 1))[None, :],
                        jnp.zeros((1, cn), f32))
            total, _ = cx.reduce2(chunk)
            dpw_ref[kidx, co, :] = total[0, :]
        cx.loop(lambda r0: t_ref.__setitem__(
            pl.ds(r0, ch),
            cx.pw_chunk(d_ref, pw_ref, kidx, r0, transpose=True)))

    def dw_bwd(src_halo, taps, kidx):
        """Reads t (= dt, the dw output cotangent) + src halo; writes the
        ddw tap rows, then d <- the dw input cotangent."""
        for t, (dh, dw) in enumerate(taps):
            def chunk(r0, dh=dh, dw=dw):
                v = cx.tap(src_halo, r0, dh, dw).astype(f32) \
                    * t_ref[pl.ds(r0, ch)]
                return (jnp.sum(v, axis=(0, 1))[None, :],
                        jnp.zeros((1, cn), f32))
            total, _ = cx.reduce2(chunk)
            ddw_ref[kidx, t, :] = total[0, :]
        cx.fill_halo(gp_ref, lambda r0: t_ref[pl.ds(r0, ch)], 0.0)

        def body(r0):
            acc = None
            for t, (dh, dw) in enumerate(taps):
                v = cx.tap(gp_ref, r0, -dh, -dw) * dw_ref[kidx, t, :]
                acc = v if acc is None else acc + v
            d_ref[pl.ds(r0, ch)] = acc
        cx.loop(body)

    # ---- branches --------------------------------------------------------
    cx.fill_halo(xp_ref, lambda r0: jnp.maximum(x_ref[pl.ds(r0, ch)], 0),
                 0.0)
    for b, (_, kk, dil, two_stage) in enumerate(BRANCHES):
        taps1 = _tap_offsets(kk, dil)
        # recompute forward (same materialization points as the fwd kernel)
        dw_to_t(xp_ref, taps1, 2 * b)
        pw_to(y_ref, 2 * b)                                # y1 (or dil o)
        if two_stage:
            stats1 = cx.channel_stats(y_ref)
            mu1v = cx.cvec([m for m, _ in stats1])
            r1v = cx.cvec([jax.lax.rsqrt(v + EPS) for _, v in stats1])
            taps2 = _tap_offsets(kk, 1)
            cx.fill_halo(zp_ref, lambda r0: jnp.maximum(
                (y_ref[pl.ds(r0, ch)].astype(f32) - mu1v) * r1v, 0), 0.0)
            dw_to_t(zp_ref, taps2, 2 * b + 1)
            pw_to(o_ref, 2 * b + 1)
            # backward
            fold_bwd(o_ref, 4 + b)
            pw_bwd(2 * b + 1)
            dw_bwd(zp_ref, taps2, 2 * b + 1)
            # relu + inner-BN backward: d = dz -> dy1
            def schunk(r0):
                xhat = (y_ref[pl.ds(r0, ch)].astype(f32) - mu1v) * r1v
                dzp = d_ref[pl.ds(r0, ch)] * (xhat > 0)
                return (jnp.sum(dzp, axis=(0, 1))[None, :],
                        jnp.sum(dzp * xhat, axis=(0, 1))[None, :])
            s1, s2 = cx.reduce2(schunk)
            m1v = cx.cvec([cx.seg(s1, c) * cx.inv_cnt for c in range(C)])
            m2v = cx.cvec([cx.seg(s2, c) * cx.inv_cnt for c in range(C)])

            def bnbody(r0):
                xhat = (y_ref[pl.ds(r0, ch)].astype(f32) - mu1v) * r1v
                dzp = d_ref[pl.ds(r0, ch)] * (xhat > 0)
                d_ref[pl.ds(r0, ch)] = r1v * (dzp - m1v - xhat * m2v)
            cx.loop(bnbody)
            # pw1 backward needs t1 = dw1(relu x) again
            dw_to_t(xp_ref, taps1, 2 * b)
            pw_bwd(2 * b)
            dw_bwd(xp_ref, taps1, 2 * b)
        else:
            fold_bwd(y_ref, 4 + b)
            pw_bwd(2 * b)
            dw_bwd(xp_ref, taps1, 2 * b)
        # through the shared relu(x): mask and accumulate into dx

        def relubody(r0):
            dxp_ref[pl.ds(PAD + r0, ch), PAD:PAD + W, :] += \
                d_ref[pl.ds(r0, ch)] * (x_ref[pl.ds(r0, ch)]
                                        .astype(f32) > 0)
        cx.loop(relubody)

    # ---- max pool --------------------------------------------------------
    taps3 = _tap_offsets(3, 1)
    cx.fill_halo(zp_ref, lambda r0: x_ref[pl.ds(r0, ch)], -jnp.inf)

    def maxbody(r0):
        acc = None
        for dh, dw in taps3:
            v = cx.tap(zp_ref, r0, dh, dw).astype(f32)
            acc = v if acc is None else jnp.maximum(acc, v)
        t_ref[pl.ds(r0, ch)] = acc                         # maxval f32
        # the fwd folded the bf16-materialized max — stats/grads match it
        o_ref[pl.ds(r0, ch)] = acc.astype(o_ref.dtype)
        y_ref[pl.ds(r0, ch)] = jnp.ones((ch, W, cn), y_ref.dtype)
    cx.loop(maxbody)
    fold_bwd(o_ref, 1)
    for dh, dw in taps3:
        def scatbody(r0, dh=dh, dw=dw):
            eq = cx.tap(zp_ref, r0, dh, dw).astype(f32) \
                == t_ref[pl.ds(r0, ch)]
            # f32 compare — Mosaic has no bf16 vector cmp on this target
            rem = y_ref[pl.ds(r0, ch)].astype(f32)
            take = jnp.logical_and(eq, rem > 0.5)
            dxp_ref[pl.ds(PAD + r0 + dh, ch),
                    PAD + dw:PAD + dw + W, :] += \
                jnp.where(take, d_ref[pl.ds(r0, ch)], 0.0)
            y_ref[pl.ds(r0, ch)] = jnp.where(take, 0.0, rem) \
                .astype(y_ref.dtype)
        cx.loop(scatbody)

    # ---- avg pool --------------------------------------------------------
    cx.fill_halo(zp_ref, lambda r0: x_ref[pl.ds(r0, ch)], 0.0)

    def avgbody(r0):
        acc = None
        for dh, dw in taps3:
            v = cx.tap(zp_ref, r0, dh, dw).astype(f32)
            acc = v if acc is None else acc + v
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0) + r0
        widx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        cnt_h = jnp.where((ridx == 0) | (ridx == H - 1), 2.0, 3.0)
        cnt_w = jnp.where((widx == 0) | (widx == W - 1), 2.0, 3.0)
        o_ref[pl.ds(r0, ch)] = (acc / (cnt_h * cnt_w)).astype(o_ref.dtype)
    cx.loop(avgbody)
    fold_bwd(o_ref, 2)

    def divbody(r0):
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0) + r0
        widx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        cnt_h = jnp.where((ridx == 0) | (ridx == H - 1), 2.0, 3.0)
        cnt_w = jnp.where((widx == 0) | (widx == W - 1), 2.0, 3.0)
        d_ref[pl.ds(r0, ch)] = d_ref[pl.ds(r0, ch)] / (cnt_h * cnt_w)
    cx.loop(divbody)
    for dh, dw in taps3:
        def avgscat(r0, dh=dh, dw=dw):
            dxp_ref[pl.ds(PAD + r0 + dh, ch),
                    PAD + dw:PAD + dw + W, :] += d_ref[pl.ds(r0, ch)]
        cx.loop(avgscat)

    # ---- identity skip + finalize ---------------------------------------
    def skipchunk(r0):
        g = g_ref[pl.ds(r0, ch)]
        return (jnp.sum(g * x_ref[pl.ds(r0, ch)].astype(f32),
                        axis=(0, 1))[None, :],
                jnp.zeros((1, cn), f32))
    gx, _ = cx.reduce2(skipchunk)
    dalpha[3] = jnp.sum(gx)
    a_skip = alpha_ref[3]

    def finbody(r0):
        dxp_ref[pl.ds(PAD + r0, ch), PAD:PAD + W, :] += \
            g_ref[pl.ds(r0, ch)] * a_skip
        dx_ref[pl.ds(r0, ch)] = dxp_ref[pl.ds(PAD + r0, ch),
                                        PAD:PAD + W, :]
    cx.loop(finbody)
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
        compiler_params=_VMEM_LIMIT,
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
