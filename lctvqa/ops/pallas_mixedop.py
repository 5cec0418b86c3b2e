"""Pallas TPU kernel: node-batched PC-DARTS partial-channel mixed ops.

The BASELINE.json north star names "mixed-op cells run as a single batched
weighted-op kernel with architecture-weight softmax fused in". After the
BN-fold (models/search.py:_mixed_fold) the XLA execution is LAYOUT-COPY
bound: each edge's ~25 tiny-channel ops (Cs = C/k = 4..16) materialize
intermediates to HBM in rotating layouts (NOTES.md profile: 27.6 of 42.7
device-ms are copies). Round 2 built a per-edge whole-mixed-op kernel that
wins ~5x standalone but loses at network level: 44 serialized custom-calls
forfeit XLA's cross-edge overlap. This round-3 version batches ALL the
same-shape stride-1 edges of one cell NODE into ONE kernel invocation
(reference semantics: `pcdarts/model_search.py:27-91` MixedOp + the
beta-weighted node sum, `operations.py:4-20`):

    out[HW, Cs*N] = sum_e  w[e, skip] * x_e
                  + sum_e sum_op w[e, op] * BN_op(op(x_e))   (- folded bias)

with w[e, op] = beta_e * softmax(alpha_e)[op] computed OUTSIDE the
custom_vjp, so dalpha/dbeta fall out of plain autodiff through the
product. E edge inputs arrive as E separate [H, W, Cs*N] refs (no HBM
concat copy); internal slabs are E-wide ([H, W, E*Cs*N], edge-major
columns (e*Cs + c)*N + n), so the VPU sees E-fold wider vectors on the
tiny-Cs shapes, and the output is edge-reduced in VMEM — one [H, W, Cs*N]
write instead of E. At reference dims this turns 44 kernel calls into 14.

Layout (per round-2 findings, unchanged): channel-major [H, W, C*N]
flatten is lane-exact where NHWC tiles pad 8-32x; W on sublanes, H an
untiled leading dim; depthwise taps as full-width [T, C*N] coefficient
rows; input staged once into a haloed VMEM scratch so every conv/pool tap
is an ALIGNED read and a depthwise conv is a pure value-chain sum. All
row-dimension work runs in `lax.fori_loop` chunks of CH rows to bound
Mosaic's vreg unrolling (unchunked compiles took >25 min).

Gradients: a custom_vjp pairs the forward with a backward kernel that
recomputes the forward in VMEM (flash-attention style) and emits COLUMNAR
gradients. The backward needs ~3x the forward's VMEM, so the VJP wrapper
splits the E edges into sub-calls of `node_caps(...)[1]` edges — exact,
because edges are independent given the output cotangent. `node_caps`
computes both caps from the actual per-buffer footprints (fwd and bwd
separately, at the real compute dtype — round-2 ADVICE item 1).
First-order only (custom_vjp has no JVP rule): the architects exclude
this path (see optim/architect_lct.py).
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

# VMEM budget the caps are computed against (v5e: 128 MiB physical; the
# pallas_call vmem_limit is 100 MB, leave headroom for Mosaic working set)
VMEM_BUDGET = 90 * 1024 * 1024
# Bound on the unrolled pointwise-MAC count per chunk body (E * Cs^2):
# compile time scales with it (~7-60 s/kernel at <=256 in round 2).
PW_UNROLL_CAP = 1280


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


def _footprints(h: int, w: int, cs: int, n: int, db: int):
    """(per_edge_fwd, fixed_fwd, per_edge_bwd, fixed_bwd) VMEM bytes from
    the actual buffer lists of the two pallas_calls below. db = compute
    dtype bytes (the x/halo/o/y slabs); accumulators/cotangents are f32."""
    ow_el = h * w * cs * n
    halo_el = (h + 2 * PAD) * (w + 2 * PAD) * cs * n
    dws_b = 8 * MAXT * cs * n * 4
    per_fwd = (ow_el * db          # input x_e
               + dws_b             # dw tap rows
               + halo_el * db      # xp halo
               + ow_el * db        # o slab
               + ow_el * 4)        # t slab (f32)
    fixed_fwd = ow_el * 4          # out (f32)
    per_bwd = (ow_el * db + dws_b            # inputs x_e, dws
               + halo_el * (2 * db + 8)      # xp, zp (dtype); gp, dxp (f32)
               + ow_el * (4 + 2 * db + 4)    # t (f32), y, o (dtype), d (f32)
               + ow_el * 4 + dws_b           # outs: dx (f32), ddw
               + 8 * cs * cs * n * 4)        # out: dpw columnar
    fixed_bwd = ow_el * 4                    # g (f32)
    return per_fwd, fixed_fwd, per_bwd, fixed_bwd


def node_caps(h: int, w: int, cs: int, n: int, dtype) -> tuple[int, int]:
    """(fwd_cap, bwd_cap): max edges per fwd / bwd kernel invocation at
    this shape. bwd_cap == 0 means the shape is ineligible entirely."""
    db = 4 if dtype is None else jnp.dtype(dtype).itemsize
    pf, ff, pb, fb = _footprints(h, w, cs, n, db)
    fwd_cap = max((VMEM_BUDGET - ff) // pf, 0)
    bwd_cap = max((VMEM_BUDGET - fb) // pb, 0)
    unroll_cap = max(PW_UNROLL_CAP // (cs * cs), 1)
    return int(min(fwd_cap, unroll_cap)), int(min(bwd_cap, unroll_cap,
                                                  fwd_cap))


def node_eligible(h: int, w: int, cs: int, n: int, stride: int,
                  dtype) -> bool:
    """Shape gate: stride-1, lane-exact channel-major flatten, and at
    least one edge fits the BACKWARD kernel's VMEM footprint."""
    if stride != 1 or (cs * n) % 128 != 0:
        return False
    return node_caps(h, w, cs, n, dtype)[1] >= 1


class _Ctx:
    """Shared chunked-loop helpers over the [H, W, E*Cs*N] row dim."""

    def __init__(self, H, W, Cs, N, E):
        self.H, self.W, self.Cs, self.N, self.E = H, W, Cs, N, E
        self.C = E * Cs                 # total channel segments
        self.cn = self.C * N            # wide (all-edge) column count
        self.ow = Cs * N                # output / per-edge column count
        self.ch = _chunk_rows(H, W, self.cn)
        self.nck = H // self.ch
        self.inv_cnt = 1.0 / float(H * W * N)

    def loop(self, body):
        """body(r0) for r0 = 0, CH, ..., H-CH (dynamic row starts)."""
        ch = self.ch
        jax.lax.fori_loop(0, self.nck,
                          lambda i, c: (body(i * ch), c)[1], 0)

    def reduce2(self, chunk_fn, width=None):
        """Sum chunk_fn(r0) -> ([1,width], [1,width]) over all rows."""
        z = jnp.zeros((1, width or self.cn), jnp.float32)

        def b(i, carry):
            a, q = chunk_fn(i * self.ch)
            return carry[0] + a, carry[1] + q

        return jax.lax.fori_loop(0, self.nck, b, (z, z))

    def seg(self, vec, c):
        return jnp.sum(vec[:, c * self.N:(c + 1) * self.N])

    def cvec(self, scalars):
        """[1,1,len*N] broadcast vector from per-channel scalars."""
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
        """Block-diagonal (per-edge) pointwise conv for one row chunk ->
        (CH,W,cn) f32. pw_ref rows (kidx, e*Cs+ci, co) = pw[e][ci, co];
        transpose=True applies each edge's transposed matrix (backward)."""
        Cs, N, ch = self.Cs, self.N, self.ch
        outs = []
        for e in range(self.E):
            base = e * Cs
            for co in range(Cs):
                acc = None
                for ci in range(Cs):
                    s = (pw_ref[kidx, base + co, ci] if transpose
                         else pw_ref[kidx, base + ci, co])
                    sg = base + ci
                    v = src_ref[pl.ds(r0, ch), :, sg * N:(sg + 1) * N] \
                        .astype(jnp.float32) * s
                    acc = v if acc is None else acc + v
                outs.append(acc)
        return (outs[0] if len(outs) == 1
                else jnp.concatenate(outs, axis=2))

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


def _make_fwd_kernel(H, W, Cs, N, E):
    """Forward: E x_refs [H,W,Cs*N]; dw_ref [8, MAXT, E*Cs*N] f32 (row
    2b = stage1 of branch b, 2b+1 = stage2; per-channel taps repeated
    N-wide, edge-major); pw_ref [8, E*Cs, Cs] f32 in SMEM; w_ref [E, 8]
    f32 in SMEM (PRIMITIVES order: none, max_pool, avg_pool, skip, sep3,
    sep5, dil3, dil5); out_ref [H,W,Cs*N] f32 = edge-reduced mixture.
    Scratch: xp haloed input (compute dtype, E-wide), o slab (dtype),
    t slab (f32)."""

    def kernel(*refs):
        x_refs = refs[:E]
        dw_ref, pw_ref, w_ref, out_ref, xp_ref, o_ref, t_ref = refs[E:]
        cx = _Ctx(H, W, Cs, N, E)
        ch, ow = cx.ch, cx.ow
        f32 = jnp.float32
        bias_vecs = []                 # [1,1,ow] vectors, summed at the end

        def xcat(r0):
            """Row chunk of all edge inputs, edge-major concat."""
            if E == 1:
                return x_refs[0][pl.ds(r0, ch)]
            return jnp.concatenate(
                [x_refs[e][pl.ds(r0, ch)] for e in range(E)], axis=2)

        def branch_stage(halo_ref, taps, kidx):
            """o <- pw(dw(halo)); t holds the dw output (kept for reuse)."""
            def body(r0):
                t_ref[pl.ds(r0, ch)] = cx.dw_chunk(halo_ref, dw_ref, taps,
                                                   kidx, r0)
            cx.loop(body)

            def body2(r0):
                o_ref[pl.ds(r0, ch)] = \
                    cx.pw_chunk(t_ref, pw_ref, kidx, r0).astype(o_ref.dtype)
            cx.loop(body2)

        def fold(ref, opidx):
            """out += edge-reduce(w[e,op] * BN(o_e)); bias deferred."""
            stats = cx.channel_stats(ref)
            coefs = []
            bias_c = [jnp.float32(0.0)] * Cs
            for cg, (mean, var) in enumerate(stats):
                e, c = divmod(cg, Cs)
                a = w_ref[e, opidx]
                r = jax.lax.rsqrt(var + EPS)
                coefs.append(a * r)
                bias_c[c] = bias_c[c] + a * r * mean
            coef_vec = cx.cvec(coefs)            # [1,1,cn]
            bias_vecs.append(cx.cvec(bias_c))    # [1,1,ow]

            def body(r0):
                v = ref[pl.ds(r0, ch)].astype(f32) * coef_vec
                acc = v[:, :, :ow]
                for e in range(1, E):
                    acc = acc + v[:, :, e * ow:(e + 1) * ow]
                out_ref[pl.ds(r0, ch)] += acc
            cx.loop(body)

        # identity skip term (no BN; stride-1 skip is raw x), edge-reduced
        def initbody(r0):
            acc = None
            for e in range(E):
                v = x_refs[e][pl.ds(r0, ch)].astype(f32) * w_ref[e, 3]
                acc = v if acc is None else acc + v
            out_ref[pl.ds(r0, ch)] = acc
        cx.loop(initbody)

        # ---- four depthwise-separable branches: shared halo = relu(x) ----
        xp_is_relu_x = False
        for b, (_, kk, dil, two_stage) in enumerate(BRANCHES):
            if not xp_is_relu_x:      # (re)build after a stage-2 overwrite
                cx.fill_halo(xp_ref,
                             lambda r0: jnp.maximum(xcat(r0), 0), 0.0)
                xp_is_relu_x = True
            branch_stage(xp_ref, _tap_offsets(kk, dil), 2 * b)
            if two_stage:
                # inner BN (affine-free, own batch stats) + ReLU -> halo
                stats = cx.channel_stats(o_ref)
                mean_vec = cx.cvec([m for m, _ in stats])
                rstd_vec = cx.cvec([jax.lax.rsqrt(v + EPS)
                                    for _, v in stats])
                cx.fill_halo(xp_ref, lambda r0: jnp.maximum(
                    (o_ref[pl.ds(r0, ch)].astype(f32) - mean_vec)
                    * rstd_vec, 0), 0.0)
                xp_is_relu_x = False
                branch_stage(xp_ref, _tap_offsets(kk, 1), 2 * b + 1)
            fold(o_ref, 4 + b)

        # ---- max pool 3x3 (stride 1, pad 1; final BN folded) -------------
        taps3 = _tap_offsets(3, 1)
        cx.fill_halo(xp_ref, xcat, -jnp.inf)

        def maxbody(r0):
            acc = None
            for dh, dw in taps3:
                v = cx.tap(xp_ref, r0, dh, dw).astype(f32)
                acc = v if acc is None else jnp.maximum(acc, v)
            o_ref[pl.ds(r0, ch)] = acc.astype(o_ref.dtype)
        cx.loop(maxbody)
        fold(o_ref, 1)

        # ---- avg pool 3x3 (count_include_pad=False) ----------------------
        cx.fill_halo(xp_ref, xcat, 0.0)

        def avgbody(r0):
            acc = None
            for dh, dw in taps3:
                v = cx.tap(xp_ref, r0, dh, dw).astype(f32)
                acc = v if acc is None else acc + v
            # per-position valid-window count (3 interior, 2 at borders)
            ridx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0) + r0
            widx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
            cnt_h = jnp.where((ridx == 0) | (ridx == H - 1), 2.0, 3.0)
            cnt_w = jnp.where((widx == 0) | (widx == W - 1), 2.0, 3.0)
            o_ref[pl.ds(r0, ch)] = (acc / (cnt_h * cnt_w)) \
                .astype(o_ref.dtype)
        cx.loop(avgbody)
        fold(o_ref, 2)

        # ---- subtract the folded-BN biases ------------------------------
        bias_total = bias_vecs[0]
        for v in bias_vecs[1:]:
            bias_total = bias_total + v
        cx.loop(lambda r0: out_ref.__setitem__(
            pl.ds(r0, ch), out_ref[pl.ds(r0, ch)] - bias_total))

    return kernel


def _pack_params(p, C: int, N: int) -> tuple[jax.Array, jax.Array]:
    """Stack ONE edge's per-branch dw taps as full-width [8, MAXT, C*N]
    rows (each channel's tap value repeated N-wide) and pw mats [8, C, C],
    from the mixed-op param pytree (models/search.py naming)."""
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


def _pack_group(p_list, Cs: int, N: int):
    """Edge-major group packing: dws [8, MAXT, E*Cs*N],
    pws [8, E*Cs, Cs]."""
    packed = [_pack_params(p, Cs, N) for p in p_list]
    dws = (packed[0][0] if len(packed) == 1
           else jnp.concatenate([d for d, _ in packed], axis=2))
    pws = (packed[0][1] if len(packed) == 1
           else jnp.concatenate([w for _, w in packed], axis=1))
    return dws, pws


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _node_fwd_call(xs, dws, pws, weights, Cs: int, N: int,
                   interpret: bool = False):
    E = len(xs)
    H, W, ow = xs[0].shape
    assert ow == Cs * N
    kern = _make_fwd_kernel(H, W, Cs, N, E)
    cn = E * Cs * N
    # xp: haloed input at the compute dtype; o holds materialized
    # activations at the compute dtype (one rounding per stage, like XLA's
    # conv epilogues); t is the fp32 accumulator for the tap/MAC sums
    # (like the MXU's internal fp32 accumulation).
    dt = xs[0].dtype
    halo = pltpu.VMEM((H + 2 * PAD, W + 2 * PAD, cn), dt)
    slab = pltpu.VMEM((H, W, cn), dt)
    slab32 = pltpu.VMEM((H, W, cn), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, W, ow), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * E + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[halo, slab, slab32],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*xs, dws, pws, weights)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _make_bwd_kernel(H, W, Cs, N, E):
    """Gradients of the node mixture w.r.t. (x_e, wide dw taps, pw mats,
    weights). g_ref is the [H,W,Cs*N] f32 output cotangent; each edge
    sees it tiled to its own column block (built per chunk in vregs, no
    extra slab). dpw_ref is [8, E*Cs, Cs*N] columnar: row (kidx, e*Cs+co),
    col ci*N+n = sum_hw t[(e,ci)]*do[(e,co)]; the wrapper sums N-groups
    and transposes per edge to the [e*Cs+ci, co] parameter layout.
    ddw_ref rows are full-width colsums (the true cotangent of the
    [T, E*Cs*N] widened taps). dwts is [E, 8]."""

    def kernel(*refs):
        x_refs = refs[:E]
        dw_ref, pw_ref, w_ref, g_ref = refs[E:E + 4]
        dx_refs = refs[E + 4:2 * E + 4]
        (ddw_ref, dpw_ref, dwts_ref,
         xp_ref, zp_ref, gp_ref, dxp_ref,
         t_ref, y_ref, o_ref, d_ref) = refs[2 * E + 4:]
        cx = _Ctx(H, W, Cs, N, E)
        ch, cn, ow, C = cx.ch, cx.cn, cx.ow, cx.C
        f32 = jnp.float32

        ddw_ref[:] = jnp.zeros((8, MAXT, cn), f32)
        dpw_ref[:] = jnp.zeros((8, C, ow), f32)
        cx.fill_halo(dxp_ref, lambda r0: jnp.zeros((ch, W, cn), f32), 0.0)
        dwts = [[jnp.float32(0.0)] * 8 for _ in range(E)]

        def xcat(r0):
            if E == 1:
                return x_refs[0][pl.ds(r0, ch)]
            return jnp.concatenate(
                [x_refs[e][pl.ds(r0, ch)] for e in range(E)], axis=2)

        def gw(r0):
            """g chunk tiled to the E-wide column layout (vregs only)."""
            g = g_ref[pl.ds(r0, ch)]
            return g if E == 1 else jnp.concatenate([g] * E, axis=2)

        def dw_to_t(halo_ref, taps, kidx):
            cx.loop(lambda r0: t_ref.__setitem__(
                pl.ds(r0, ch),
                cx.dw_chunk(halo_ref, dw_ref, taps, kidx, r0)))

        def pw_to(dst_ref, kidx):
            cx.loop(lambda r0: dst_ref.__setitem__(
                pl.ds(r0, ch),
                cx.pw_chunk(t_ref, pw_ref, kidx, r0).astype(dst_ref.dtype)))

        def fold_bwd(o_sl, opidx):
            """d <- dL/d o_e for out += sum_e w[e,op]*BN(o_e); accumulates
            dwts[e][op]."""
            osum, osq = cx.colsums(o_sl)

            def gchunk(r0):
                gwc = gw(r0)
                o32 = o_sl[pl.ds(r0, ch)].astype(f32)
                return (jnp.sum(gwc, axis=(0, 1))[None, :],
                        jnp.sum(gwc * o32, axis=(0, 1))[None, :])
            gsum, go = cx.reduce2(gchunk)

            coefs, gbars, k2s, mus = [], [], [], []
            for cg in range(C):
                e, _c = divmod(cg, Cs)
                a = w_ref[e, opidx]
                mu = cx.seg(osum, cg) * cx.inv_cnt
                var = cx.seg(osq, cg) * cx.inv_cnt - mu * mu
                r = jax.lax.rsqrt(var + EPS)
                s_c = cx.seg(go, cg) - mu * cx.seg(gsum, cg)
                dwts[e][opidx] = dwts[e][opidx] + r * s_c
                mus.append(mu)
                coefs.append(a * r)
                gbars.append(cx.seg(gsum, cg) * cx.inv_cnt)
                k2s.append(r * r * s_c * cx.inv_cnt)
            coefv, gbarv = cx.cvec(coefs), cx.cvec(gbars)
            muv, k2v = cx.cvec(mus), cx.cvec(k2s)

            def body(r0):
                gwc = gw(r0)
                o32 = o_sl[pl.ds(r0, ch)].astype(f32)
                d_ref[pl.ds(r0, ch)] = \
                    coefv * (gwc - gbarv - (o32 - muv) * k2v)
            cx.loop(body)

        def pw_bwd(kidx):
            """Reads t (stage input) + d (output cotangent); writes
            columnar dpw rows, then overwrites t with the input
            cotangent."""
            for e in range(E):
                base = e * Cs
                for co in range(Cs):
                    colg = base + co

                    def chunk(r0, e=e, colg=colg):
                        dsl = d_ref[pl.ds(r0, ch), :,
                                    colg * N:(colg + 1) * N]
                        tiled = (dsl if Cs == 1
                                 else jnp.concatenate([dsl] * Cs, axis=2))
                        v = t_ref[pl.ds(r0, ch), :,
                                  e * ow:(e + 1) * ow] * tiled
                        return (jnp.sum(v, axis=(0, 1))[None, :],
                                jnp.zeros((1, ow), f32))
                    total, _ = cx.reduce2(chunk, width=ow)
                    dpw_ref[kidx, colg, :] = total[0, :]
            cx.loop(lambda r0: t_ref.__setitem__(
                pl.ds(r0, ch),
                cx.pw_chunk(d_ref, pw_ref, kidx, r0, transpose=True)))

        def dw_bwd(src_halo, taps, kidx):
            """Reads t (= dt, the dw output cotangent) + src halo; writes
            the ddw tap rows, then d <- the dw input cotangent."""
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

        # ---- branches ----------------------------------------------------
        cx.fill_halo(xp_ref, lambda r0: jnp.maximum(xcat(r0), 0), 0.0)
        for b, (_, kk, dil, two_stage) in enumerate(BRANCHES):
            taps1 = _tap_offsets(kk, dil)
            # recompute forward (same materialization points as fwd kernel)
            dw_to_t(xp_ref, taps1, 2 * b)
            pw_to(y_ref, 2 * b)                            # y1 (or dil o)
            if two_stage:
                stats1 = cx.channel_stats(y_ref)
                mu1v = cx.cvec([m for m, _ in stats1])
                r1v = cx.cvec([jax.lax.rsqrt(v + EPS) for _, v in stats1])
                taps2 = _tap_offsets(kk, 1)
                cx.fill_halo(zp_ref, lambda r0: jnp.maximum(
                    (y_ref[pl.ds(r0, ch)].astype(f32) - mu1v) * r1v, 0),
                    0.0)
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
                m1v = cx.cvec([cx.seg(s1, c) * cx.inv_cnt
                               for c in range(C)])
                m2v = cx.cvec([cx.seg(s2, c) * cx.inv_cnt
                               for c in range(C)])

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
                    d_ref[pl.ds(r0, ch)] * (xcat(r0).astype(f32) > 0)
            cx.loop(relubody)

        # ---- max pool ----------------------------------------------------
        taps3 = _tap_offsets(3, 1)
        cx.fill_halo(zp_ref, xcat, -jnp.inf)

        def maxbody(r0):
            acc = None
            for dh, dw in taps3:
                v = cx.tap(zp_ref, r0, dh, dw).astype(f32)
                acc = v if acc is None else jnp.maximum(acc, v)
            t_ref[pl.ds(r0, ch)] = acc                     # maxval f32
            # the fwd folded the bf16-materialized max — stats/grads match
            o_ref[pl.ds(r0, ch)] = acc.astype(o_ref.dtype)
            y_ref[pl.ds(r0, ch)] = jnp.ones((ch, W, cn), y_ref.dtype)
        cx.loop(maxbody)
        fold_bwd(o_ref, 1)
        for dh, dw in taps3:
            def scatbody(r0, dh=dh, dw=dw):
                eq = cx.tap(zp_ref, r0, dh, dw).astype(f32) \
                    == t_ref[pl.ds(r0, ch)]
                # f32 compare — Mosaic has no bf16 vector cmp here
                rem = y_ref[pl.ds(r0, ch)].astype(f32)
                take = jnp.logical_and(eq, rem > 0.5)
                dxp_ref[pl.ds(PAD + r0 + dh, ch),
                        PAD + dw:PAD + dw + W, :] += \
                    jnp.where(take, d_ref[pl.ds(r0, ch)], 0.0)
                y_ref[pl.ds(r0, ch)] = jnp.where(take, 0.0, rem) \
                    .astype(y_ref.dtype)
            cx.loop(scatbody)

        # ---- avg pool ----------------------------------------------------
        cx.fill_halo(zp_ref, xcat, 0.0)

        def avgbody(r0):
            acc = None
            for dh, dw in taps3:
                v = cx.tap(zp_ref, r0, dh, dw).astype(f32)
                acc = v if acc is None else acc + v
            ridx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0) + r0
            widx = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
            cnt_h = jnp.where((ridx == 0) | (ridx == H - 1), 2.0, 3.0)
            cnt_w = jnp.where((widx == 0) | (widx == W - 1), 2.0, 3.0)
            o_ref[pl.ds(r0, ch)] = (acc / (cnt_h * cnt_w)) \
                .astype(o_ref.dtype)
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

        # ---- identity skip + finalize ------------------------------------
        def skipchunk(r0):
            return (jnp.sum(gw(r0) * xcat(r0).astype(f32),
                            axis=(0, 1))[None, :],
                    jnp.zeros((1, cn), f32))
        gx, _ = cx.reduce2(skipchunk)
        for e in range(E):
            acc = jnp.float32(0.0)
            for c in range(Cs):
                acc = acc + cx.seg(gx, e * Cs + c)
            dwts[e][3] = acc
        skipv = cx.cvec([w_ref[cg // Cs, 3] for cg in range(C)])

        def finbody(r0):
            dxp_ref[pl.ds(PAD + r0, ch), PAD:PAD + W, :] += gw(r0) * skipv
            full = dxp_ref[pl.ds(PAD + r0, ch), PAD:PAD + W, :]
            for e in range(E):
                dx_refs[e][pl.ds(r0, ch)] = full[:, :, e * ow:(e + 1) * ow]
        cx.loop(finbody)
        for e in range(E):
            dwts_ref[e, :] = jnp.stack(dwts[e])

    return kernel


def _node_bwd_call(xs, dws, pws, weights, g, Cs: int, N: int,
                   interpret: bool = False):
    E = len(xs)
    H, W, ow = xs[0].shape
    kern = _make_bwd_kernel(H, W, Cs, N, E)
    cn = E * Cs * N
    dt = xs[0].dtype
    halo = pltpu.VMEM((H + 2 * PAD, W + 2 * PAD, cn), dt)
    halo32 = pltpu.VMEM((H + 2 * PAD, W + 2 * PAD, cn), jnp.float32)
    slab = pltpu.VMEM((H, W, cn), dt)
    slab32 = pltpu.VMEM((H, W, cn), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=(
            tuple(jax.ShapeDtypeStruct((H, W, ow), jnp.float32)
                  for _ in range(E))                          # dx per edge
            + (jax.ShapeDtypeStruct((8, MAXT, cn), jnp.float32),   # ddw
               jax.ShapeDtypeStruct((8, E * Cs, ow), jnp.float32),  # dpw
               jax.ShapeDtypeStruct((E, 8), jnp.float32))      # dweights
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * E + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(E + 3)),
        scratch_shapes=[halo, halo, halo32, halo32,
                        slab32, slab, slab, slab32],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*xs, dws, pws, weights, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mixed_node(xs, dws, pws, weights, Cs, N, interpret):
    return _node_fwd_call(xs, dws, pws, weights, Cs, N,
                          interpret=interpret)


def _mixed_node_fwd(xs, dws, pws, weights, Cs, N, interpret):
    return (_mixed_node(xs, dws, pws, weights, Cs, N, interpret),
            (xs, dws, pws, weights))


def _mixed_node_bwd(Cs, N, interpret, res, g):
    """Split the E edges into bwd-cap-sized sub-calls (each recomputes
    only its own edges' forwards — exact, edges are independent given g),
    then reassemble the group-layout cotangents."""
    xs, dws, pws, weights = res
    E = len(xs)
    H, W, _ = xs[0].shape
    cap = max(node_caps(H, W, Cs, N, xs[0].dtype)[1], 1)
    g32 = g.astype(jnp.float32)
    dxs, ddws, dpws, dwts = [], [], [], []
    for lo in range(0, E, cap):
        hi = min(lo + cap, E)
        out = _node_bwd_call(
            xs[lo:hi], dws[:, :, lo * Cs * N:hi * Cs * N],
            pws[:, lo * Cs:hi * Cs, :], weights[lo:hi], g32, Cs, N,
            interpret)
        sub = hi - lo
        dxs += list(out[:sub])
        ddws.append(out[sub])
        dpws.append(out[sub + 1])
        dwts.append(out[sub + 2])
    ddw = ddws[0] if len(ddws) == 1 else jnp.concatenate(ddws, axis=2)
    dpw_cols = (dpws[0] if len(dpws) == 1
                else jnp.concatenate(dpws, axis=1))
    dwt = dwts[0] if len(dwts) == 1 else jnp.concatenate(dwts, axis=0)
    # columnar [8, e*Cs+co, ci*N+n] -> parameter layout [8, e*Cs+ci, co]
    dpw = dpw_cols.reshape(8, E, Cs, Cs, N).sum(axis=-1)       # [8,E,co,ci]
    dpw = jnp.swapaxes(dpw, 2, 3).reshape(8, E * Cs, Cs)
    dt = xs[0].dtype
    dxs = tuple(dx if dt == jnp.float32 else dx.astype(dt) for dx in dxs)
    return dxs, ddw, dpw, dwt


_mixed_node.defvjp(_mixed_node_fwd, _mixed_node_bwd)


def mixed_node_pallas_hwcn(xs, p_list, weights, Cs: int, N: int,
                           interpret: bool = False):
    """The node-batched kernel on HWCN-trunk operands.

    xs: sequence of E [H, W, Cs*N] arrays (compute dtype) — each edge's
    partial-channel slice, channel-major flattened (a free view when the
    trunk is HWCN). p_list: the E edges' mixed-op param pytrees
    (models/search.py naming). weights: [E, 8] f32 rows, typically
    beta_e * softmax(alpha_e) so the kernel's edge reduction realizes the
    cell node's beta-weighted sum. Returns [H, W, Cs*N] f32."""
    dws, pws = _pack_group(p_list, Cs, N)
    return _mixed_node(tuple(xs), dws, pws,
                       weights.astype(jnp.float32), Cs, N, interpret)


def mixed_op_pallas(p, x, weights, dtype=None, interpret: bool = False):
    """Drop-in stride-1 replacement for models.search._mixed_fold (the
    E=1 case of the node kernel; kept as the parity-test surface).

    x: [N, H, W, Cs] (the partial-channel slice); returns [N, H, W, Cs]
    f32 — the alpha-weighted, final-BN-folded op mixture. Differentiable
    (first order) via the paired backward kernel; parameter/alpha
    cotangents flow back through _pack_params' jnp.repeat / scatter by
    XLA autodiff."""
    n, h, w, c = x.shape
    xd = x.astype(dtype) if dtype is not None else x
    # NHWC -> [H, W, C, N] -> [H, W, C*N]: one relayout in, one out; the
    # kernel's internal traffic happens in VMEM only.
    xt = jnp.transpose(xd, (1, 2, 3, 0)).reshape(h, w, c * n)
    out = mixed_node_pallas_hwcn((xt,), [p], weights[None, :], c, n,
                                 interpret)
    return jnp.transpose(out.reshape(h, w, c, n), (3, 0, 1, 2))
