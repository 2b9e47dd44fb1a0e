"""Fused RED ConvGRU depth-recurrence — one Pallas kernel per pyramid scale.

The RED regularizer's only irreducibly sequential computation is, per scale,
a ConvGRU recurrence over depth planes (nn/red.py; reference python loop at
/root/reference/modules/module.py:625 and streaming twin :653-693).  As an
XLA `lax.scan` each plane costs ~9 small dispatches plus carry relayout
copies; here the ENTIRE D-plane recurrence of one scale runs as ONE kernel:
grid=(D,) iterates planes sequentially (TPU grid steps are ordered), the
hidden state lives in VMEM scratch across grid steps, and each step computes

    g = conv3x3(h, Wh) + xc_g + bh              (im2col matmul on the MXU)
    r = sigmoid(GN(g[..C]));  u = sigmoid(GN(g[C..]))
    y = tanh(GN(conv3x3(r*h, Wc) + xc_c + bc))
    h = u*h + (1-u)*y                           (== the plane's output)

where xc = [xc_g | xc_c] are the hoisted per-plane input contributions (the
x-halves of the cell's concat-convs, precomputed for ALL planes in one large
batched conv — see nn/blocks.ConvGRUCell.x_contrib).

GroupNorm(num_groups=1) normalizes over the WHOLE (H, W, C) plane, which is
why the plane stays resident: v5e-class VMEM (~128 MB usable, probed) fits
the largest production plane (384x768, C=8) at ~115 MB including the
double-buffered input blocks.

Layout: channel counts here (8..64) are far below the 128-lane vector width,
so channels-last buffers would be 2-16x lane-padded by Mosaic (a (384,768,8)
f32 scratch physically becomes (384,768,128) — measured).  All buffers
instead keep W in lanes and C in sublanes:

    h, g, out, xc:  row-packed (P, C', R*W)  with H = P*R   (dense)
    pad:            (H+2, C, W+2)  zero-bordered conv stage (dense)

and conv3x3 is an im2col matmul per row-pack: the 9*R shifted (C, W) row
slabs of `pad` assemble into a (9C, R*W) patch (static lane/sublane offsets
only), then ONE (Cout, 9C) @ (9C, R*W) MXU matmul — K-packed so the MXU sees
9C contraction depth instead of nine K=C slivers.

Differentiable: a custom VJP recomputes each plane's internals in a reverse
lax.scan from the forward's own output sequence (the GRU state IS the
output), so training uses the fused kernel too, with zero extra residual
storage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _pack_rows(height: int, width: int) -> int:
    """Rows per pack: largest divisor of `height` with pack width ≤ ~2k lanes
    (wider packs help the MXU little but inflate the unrolled im2col copy
    loops — compile time grows with 9·R)."""
    best = 1
    for r in range(1, height + 1):
        if height % r == 0 and r * width <= 2048:
            best = r
    return best


def _red_recur_kernel(
    xc_ref, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref, out_ref,
    h_ref, pad_ref, g_ref, rhs_ref,
    *, c: int, height: int, width: int, r: int,
):
    d = pl.program_id(0)
    p_cnt = height // r
    inv_n = 1.0 / (height * width * c)
    zero = jnp.float32(0)

    @pl.when(d == 0)
    def _():
        # zero state; pad borders AND center stay zero (center == h == 0)
        h_ref[...] = jnp.zeros_like(h_ref)
        pad_ref[...] = jnp.zeros_like(pad_ref)

    def build_rhs(p):
        """im2col patch of pad rows [p*r, p*r+r): (9C, R*W), tap-major K."""
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                for s in range(r):
                    slab = pad_ref[pl.ds(p * r + s + dy, 1), :, dx : dx + width]
                    rhs_ref[t * c : (t + 1) * c, s * width : (s + 1) * width] = (
                        slab.reshape(c, width)
                    )

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    # ---- gates conv: g = Wg @ im2col(h) + xc_g + bg
    def gates_body(p, _):
        build_rhs(p)
        g = jnp.dot(wg_ref[...], rhs_ref[...], preferred_element_type=jnp.float32)
        g_ref[p] = g + xc_ref[0, p, : 2 * c, :] + bg_ref[...]
        return 0

    jax.lax.fori_loop(0, p_cnt, gates_body, 0)

    # ---- GroupNorm stats of the r/u halves (two-pass: mean, then variance)
    def gate_sums(p, acc):
        g = g_ref[p]
        return acc[0] + jnp.sum(g[:c]), acc[1] + jnp.sum(g[c:])

    sr, su = jax.lax.fori_loop(0, p_cnt, gate_sums, (zero, zero))
    mu_r = sr * inv_n
    mu_u = su * inv_n

    def gate_vars(p, acc):
        g = g_ref[p]
        dr = g[:c] - mu_r
        du = g[c:] - mu_u
        return acc[0] + jnp.sum(dr * dr), acc[1] + jnp.sum(du * du)

    vr, vu = jax.lax.fori_loop(0, p_cnt, gate_vars, (zero, zero))
    inv_r = jax.lax.rsqrt(vr * inv_n + _EPS)
    inv_u = jax.lax.rsqrt(vu * inv_n + _EPS)

    # ---- stage m = sigmoid(GN_r(g_r)) · h into pad
    def m_body(p, _):
        raw = g_ref[p, :c, :]
        rgate = jax.nn.sigmoid((raw - mu_r) * inv_r * gn_vec(0) + gn_vec(1))
        m = rgate * h_ref[p]
        for s in range(r):
            pad_ref[pl.ds(p * r + s + 1, 1), :, 1 : width + 1] = (
                m[:, s * width : (s + 1) * width].reshape(1, c, width)
            )
        return 0

    jax.lax.fori_loop(0, p_cnt, m_body, 0)

    # ---- candidate conv (reuses the dead r-half of g as storage)
    def cand_body(p, acc):
        build_rhs(p)
        y = jnp.dot(wc_ref[...], rhs_ref[...], preferred_element_type=jnp.float32)
        y = y + xc_ref[0, p, 2 * c :, :] + bc_ref[...]
        g_ref[p, :c, :] = y
        return acc + jnp.sum(y)

    sy = jax.lax.fori_loop(0, p_cnt, cand_body, zero)
    mu_y = sy * inv_n

    def cand_vars(p, acc):
        dy_ = g_ref[p, :c, :] - mu_y
        return acc + jnp.sum(dy_ * dy_)

    vy = jax.lax.fori_loop(0, p_cnt, cand_vars, zero)
    inv_y = jax.lax.rsqrt(vy * inv_n + _EPS)

    # ---- blend; emit the plane; restage h into pad for the next plane
    def blend_body(p, _):
        g = g_ref[p]
        y = jnp.tanh((g[:c] - mu_y) * inv_y * gn_vec(4) + gn_vec(5))
        u = jax.nn.sigmoid((g[c:] - mu_u) * inv_u * gn_vec(2) + gn_vec(3))
        hn = u * h_ref[p] + (1.0 - u) * y
        h_ref[p] = hn
        out_ref[0, p] = hn
        for s in range(r):
            pad_ref[pl.ds(p * r + s + 1, 1), :, 1 : width + 1] = (
                hn[:, s * width : (s + 1) * width].reshape(1, c, width)
            )
        return 0

    jax.lax.fori_loop(0, p_cnt, blend_body, 0)


def _red_recur_impl(
    xc: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    gn: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    d, height, width, c3 = xc.shape
    c = c3 // 3
    r = _pack_rows(height, width)
    p_cnt = height // r

    # NHWC → row-packed (D, P, 3C, R·W)
    xc_packed = (
        xc.reshape(d, p_cnt, r, width, 3 * c)
        .transpose(0, 1, 4, 2, 3)
        .reshape(d, p_cnt, 3 * c, r * width)
    )
    # tap-major (Cout, 9C) weight matrices
    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T

    kernel = functools.partial(
        _red_recur_kernel, c=c, height=height, width=width, r=r
    )
    out = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec(
                (1, p_cnt, 3 * c, r * width),
                lambda di: (di, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p_cnt, c, r * width),
            lambda di: (di, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, p_cnt, c, r * width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # h state
            pltpu.VMEM((height + 2, c, width + 2), jnp.float32),   # conv stage
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # raw gates
            pltpu.VMEM((9 * c, r * width), jnp.float32),           # im2col patch
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xc_packed,
        wg_mat,
        bh.reshape(2 * c, 1),
        wc_mat,
        bc.reshape(c, 1),
        gn,
    )
    # row-packed → NHWC
    return (
        out.reshape(d, p_cnt, c, r, width)
        .transpose(0, 1, 3, 4, 2)
        .reshape(d, height, width, c)
    )


def _red_recur_bwd_kernel(
    h_ref, xc_ref, gb_ref, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref,
    wgrT_ref, wguT_ref, wcT_ref,
    dxc_ref, dwg_ref, dbg_ref, dwc_ref, dbc_ref, dgn_ref,
    dh_ref, dhn_ref, gates_ref, ylin_ref, tmp_ref, pada_ref, padb_ref, rhs_ref,
    *, c: int, height: int, width: int, r: int,
):
    """Adjoint of one RED scale's depth recurrence — reverse grid over planes.

    Per plane d (visited D−1 → 0): recompute the forward internals from the
    carried-in h_prev (= the forward's own output for plane d−1, an input
    block) and xc, then run the exact adjoint chain in VMEM:

        dht = dh_carry + g_d
        du = dht(h_prev − y)σ'(u);  dy_lin = GN_yᵀ(dht(1−u)·tanh')
        dm = convᵀ(dy_lin, Wc);     dr = dm·h_prev
        dgates = [GN_rᵀ(dr·σ'(r)) | GN_uᵀ(du)]
        dh_prev = dht·u + dm·r + convᵀ(dgates, Wg)

    Weight/bias/GN cotangents accumulate in VMEM-resident output blocks
    (constant BlockSpec index) and are written to HBM once at the end.
    GroupNorm(groups=1) transposes need whole-plane scalar moments, hence the
    two-pass structure per normalized tensor.  conv and convᵀ are both
    im2col matmuls (convᵀ uses the flipped-kernel transposed matrices, built
    host-side).
    """
    d = pl.program_id(0)
    nd = pl.num_programs(0)
    p_cnt = height // r
    inv_n = 1.0 / (height * width * c)
    zero = jnp.float32(0)

    @pl.when(d == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        pada_ref[...] = jnp.zeros_like(pada_ref)
        padb_ref[...] = jnp.zeros_like(padb_ref)
        dwg_ref[...] = jnp.zeros_like(dwg_ref)
        dbg_ref[...] = jnp.zeros_like(dbg_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)
        dbc_ref[...] = jnp.zeros_like(dbc_ref)
        dgn_ref[...] = jnp.zeros_like(dgn_ref)

    def build_rhs(pad_ref, p, ch):
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                for s in range(r):
                    slab = pad_ref[pl.ds(p * r + s + dy, 1), :, dx : dx + width]
                    rhs_ref[t * ch : (t + 1) * ch, s * width : (s + 1) * width] = (
                        slab.reshape(ch, width)
                    )

    def stage(pad_ref, p, buf):
        """Write a (C, R·W) pack into pad rows (interior)."""
        for s in range(r):
            pad_ref[pl.ds(p * r + s + 1, 1), :, 1 : width + 1] = (
                buf[:, s * width : (s + 1) * width].reshape(1, c, width)
            )

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    # ================= phase A: recompute forward internals ===============
    def stage_h(p, _):
        stage(pada_ref, p, h_ref[0, p])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_h, 0)

    def gates_body(p, _):
        build_rhs(pada_ref, p, c)
        g = jnp.dot(wg_ref[...], rhs_ref[...], preferred_element_type=jnp.float32)
        gates_ref[p] = g + xc_ref[0, p, : 2 * c, :] + bg_ref[...]
        return 0

    jax.lax.fori_loop(0, p_cnt, gates_body, 0)

    def gate_sums(p, acc):
        g = gates_ref[p]
        return acc[0] + jnp.sum(g[:c]), acc[1] + jnp.sum(g[c:])

    sr, su = jax.lax.fori_loop(0, p_cnt, gate_sums, (zero, zero))
    mu_r = sr * inv_n
    mu_u = su * inv_n

    def gate_vars(p, acc):
        g = gates_ref[p]
        dr_ = g[:c] - mu_r
        du_ = g[c:] - mu_u
        return acc[0] + jnp.sum(dr_ * dr_), acc[1] + jnp.sum(du_ * du_)

    vr, vu = jax.lax.fori_loop(0, p_cnt, gate_vars, (zero, zero))
    inv_r = jax.lax.rsqrt(vr * inv_n + _EPS)
    inv_u = jax.lax.rsqrt(vu * inv_n + _EPS)

    def r_of(p):
        return jax.nn.sigmoid(
            (gates_ref[p, :c, :] - mu_r) * inv_r * gn_vec(0) + gn_vec(1)
        )

    def u_of(p):
        return jax.nn.sigmoid(
            (gates_ref[p, c:, :] - mu_u) * inv_u * gn_vec(2) + gn_vec(3)
        )

    def m_body(p, _):
        stage(padb_ref, p, r_of(p) * h_ref[0, p])
        return 0

    jax.lax.fori_loop(0, p_cnt, m_body, 0)

    def cand_body(p, acc):
        build_rhs(padb_ref, p, c)
        y = jnp.dot(wc_ref[...], rhs_ref[...], preferred_element_type=jnp.float32)
        y = y + xc_ref[0, p, 2 * c :, :] + bc_ref[...]
        ylin_ref[p] = y
        return acc + jnp.sum(y)

    sy = jax.lax.fori_loop(0, p_cnt, cand_body, zero)
    mu_y = sy * inv_n

    def cand_vars(p, acc):
        dy_ = ylin_ref[p] - mu_y
        return acc + jnp.sum(dy_ * dy_)

    vy = jax.lax.fori_loop(0, p_cnt, cand_vars, zero)
    inv_y = jax.lax.rsqrt(vy * inv_n + _EPS)

    def xn_y(p):
        return (ylin_ref[p] - mu_y) * inv_y

    def y_of(p):
        return jnp.tanh(xn_y(p) * gn_vec(4) + gn_vec(5))

    # ================= phase B: blend + tanh + GN_y adjoint ================
    # pass B1: tmp ← do_y (= dht(1−u)·(1−y²)); dhn ← dht·u; GN_y reductions
    def b1(p, acc):
        s_dxn, s_dxx, dsy, dby = acc
        dht = dh_ref[p] + gb_ref[0, p]
        u = u_of(p)
        y = y_of(p)
        do = dht * (1.0 - u) * (1.0 - y * y)
        tmp_ref[p] = do
        dhn_ref[p] = dht * u
        xn = xn_y(p)
        dxn = do * gn_vec(4)
        return (
            s_dxn + jnp.sum(dxn),
            s_dxx + jnp.sum(dxn * xn),
            dsy + jnp.sum(do * xn, axis=1, keepdims=True),
            dby + jnp.sum(do, axis=1, keepdims=True),
        )

    zc = jnp.zeros((c, 1), jnp.float32)
    s_dxn, s_dxx, dsy, dby = jax.lax.fori_loop(0, p_cnt, b1, (zero, zero, zc, zc))
    dgn_ref[:, 4:5] = dgn_ref[:, 4:5] + dsy
    dgn_ref[:, 5:6] = dgn_ref[:, 5:6] + dby
    m1y = s_dxn * inv_n
    m2y = s_dxx * inv_n

    # pass B2: tmp ← dy_lin; dbc, dWc (rhs of m still in pad_b), dxc[2C:]
    def b2(p, _):
        do = tmp_ref[p]
        dy_lin = (do * gn_vec(4) - m1y - xn_y(p) * m2y) * inv_y
        tmp_ref[p] = dy_lin
        dxc_ref[0, p, 2 * c :, :] = dy_lin
        dbc_ref[...] = dbc_ref[...] + jnp.sum(dy_lin, axis=1, keepdims=True)
        build_rhs(padb_ref, p, c)
        dwc_ref[...] = dwc_ref[...] + jax.lax.dot_general(
            dy_lin, rhs_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, b2, 0)

    # pass B3: dm = convᵀ(dy_lin, Wc)  (stage dy_lin into pad_b, reuse rhs)
    def stage_tmp(p, _):
        stage(padb_ref, p, tmp_ref[p])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_tmp, 0)

    def b3(p, _):
        build_rhs(padb_ref, p, c)
        tmp_ref[p] = jnp.dot(
            wcT_ref[...], rhs_ref[...], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, b3, 0)

    # ================= phase C: r / u chains ===============================
    # pass C1: dr_pre → dxc[:C], du_pre → dxc[C:2C]; dhn += dm·r; reductions
    def xn_r(p):
        return (gates_ref[p, :c, :] - mu_r) * inv_r

    def xn_u(p):
        return (gates_ref[p, c:, :] - mu_u) * inv_u

    def c1(p, acc):
        s_dxn_r, s_dxx_r, dsr, dbr, s_dxn_u, s_dxx_u, dsu, dbu = acc
        dm = tmp_ref[p]
        rr = r_of(p)
        dhn_ref[p] = dhn_ref[p] + dm * rr
        dr_pre = dm * h_ref[0, p] * rr * (1.0 - rr)
        uu = u_of(p)
        dht = dh_ref[p] + gb_ref[0, p]
        du_pre = dht * (h_ref[0, p] - y_of(p)) * uu * (1.0 - uu)
        dxc_ref[0, p, :c, :] = dr_pre
        dxc_ref[0, p, c : 2 * c, :] = du_pre
        xnr = xn_r(p)
        xnu = xn_u(p)
        dxnr = dr_pre * gn_vec(0)
        dxnu = du_pre * gn_vec(2)
        return (
            s_dxn_r + jnp.sum(dxnr),
            s_dxx_r + jnp.sum(dxnr * xnr),
            dsr + jnp.sum(dr_pre * xnr, axis=1, keepdims=True),
            dbr + jnp.sum(dr_pre, axis=1, keepdims=True),
            s_dxn_u + jnp.sum(dxnu),
            s_dxx_u + jnp.sum(dxnu * xnu),
            dsu + jnp.sum(du_pre * xnu, axis=1, keepdims=True),
            dbu + jnp.sum(du_pre, axis=1, keepdims=True),
        )

    acc0 = (zero, zero, zc, zc, zero, zero, zc, zc)
    s_dxn_r, s_dxx_r, dsr, dbr, s_dxn_u, s_dxx_u, dsu, dbu = (
        jax.lax.fori_loop(0, p_cnt, c1, acc0)
    )
    dgn_ref[:, 0:1] = dgn_ref[:, 0:1] + dsr
    dgn_ref[:, 1:2] = dgn_ref[:, 1:2] + dbr
    dgn_ref[:, 2:3] = dgn_ref[:, 2:3] + dsu
    dgn_ref[:, 3:4] = dgn_ref[:, 3:4] + dbu
    m1r = s_dxn_r * inv_n
    m2r = s_dxx_r * inv_n
    m1u = s_dxn_u * inv_n
    m2u = s_dxx_u * inv_n

    # pass C2: finalize dgates in dxc[:2C]; dbg; dWg (rhs of h in pad_a)
    def c2(p, _):
        dr_pre = dxc_ref[0, p, :c, :]
        du_pre = dxc_ref[0, p, c : 2 * c, :]
        dgr = (dr_pre * gn_vec(0) - m1r - xn_r(p) * m2r) * inv_r
        dgu = (du_pre * gn_vec(2) - m1u - xn_u(p) * m2u) * inv_u
        dxc_ref[0, p, :c, :] = dgr
        dxc_ref[0, p, c : 2 * c, :] = dgu
        dbg_ref[:c] = dbg_ref[:c] + jnp.sum(dgr, axis=1, keepdims=True)
        dbg_ref[c:] = dbg_ref[c:] + jnp.sum(dgu, axis=1, keepdims=True)
        build_rhs(pada_ref, p, c)
        dg2 = jnp.concatenate([dgr, dgu], axis=0)
        dwg_ref[...] = dwg_ref[...] + jax.lax.dot_general(
            dg2, rhs_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c2, 0)

    # pass C3: dh_prev += convᵀ(dgr, Wg_r) + convᵀ(dgu, Wg_u)
    def stage_dgr(p, _):
        stage(padb_ref, p, dxc_ref[0, p, :c, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgr, 0)

    def c3r(p, _):
        build_rhs(padb_ref, p, c)
        dhn_ref[p] = dhn_ref[p] + jnp.dot(
            wgrT_ref[...], rhs_ref[...], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3r, 0)

    def stage_dgu(p, _):
        stage(padb_ref, p, dxc_ref[0, p, c : 2 * c, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgu, 0)

    def c3u(p, _):
        build_rhs(padb_ref, p, c)
        dh_ref[p] = dhn_ref[p] + jnp.dot(
            wguT_ref[...], rhs_ref[...], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3u, 0)


def _flipT(w):
    """(3, 3, Cin, Cout) conv kernel → (Cin, 9·Cout) transposed-conv matrix:
    element [ci, (dy·3+dx)·Cout + co] = w[2−dy, 2−dx, ci, co]."""
    c_in = w.shape[2]
    return jnp.flip(w, (0, 1)).transpose(2, 0, 1, 3).reshape(c_in, -1)


def _red_recur_bwd_pallas(xc, outs, wh, bh, wc, bc, gn, g, interpret=False):
    """Pallas backward: cotangents of (xc, wh, bh, wc, bc, gn) from upstream
    g (D, H, W, C) and the forward state sequence `outs`."""
    d, height, width, c3 = xc.shape
    c = c3 // 3
    r = _pack_rows(height, width)
    p_cnt = height // r

    def pack(t, ch):
        return (
            t.reshape(d, p_cnt, r, width, ch)
            .transpose(0, 1, 4, 2, 3)
            .reshape(d, p_cnt, ch, r * width)
        )

    h_all = jnp.concatenate([jnp.zeros_like(outs[:1]), outs[:-1]], axis=0)
    xc_p = pack(xc, 3 * c)
    h_p = pack(h_all, c)
    g_p = pack(g, c)

    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T
    wgrT = _flipT(wh[..., :c])
    wguT = _flipT(wh[..., c:])
    wcT = _flipT(wc)

    kernel = functools.partial(
        _red_recur_bwd_kernel, c=c, height=height, width=width, r=r
    )
    rev = lambda di: (d - 1 - di, 0, 0, 0)
    blk = lambda ch: pl.BlockSpec((1, p_cnt, ch, r * width), rev,
                                  memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda di: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    outs_spec = [
        blk(3 * c),                                  # dxc
        const((2 * c, 9 * c)),                       # dwg
        const((2 * c, 1)),                           # dbg
        const((c, 9 * c)),                           # dwc
        const((c, 1)),                               # dbc
        const((c, 6)),                               # dgn (transposed)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((d, p_cnt, 3 * c, r * width), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 6), jnp.float32),
    ]
    dxc_p, dwg, dbg, dwc, dbc, dgn_t = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            blk(c),                                  # h_prev
            blk(3 * c),                              # xc
            blk(c),                                  # g upstream
            full, full, full, full, full,            # wg, bg, wc, bc, gn
            full, full, full,                        # wgrT, wguT, wcT
        ],
        out_specs=outs_spec,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # dh carry
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # dhn accum
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # gates raw
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # ylin raw
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # tmp
            pltpu.VMEM((height + 2, c, width + 2), jnp.float32),   # pad_a
            pltpu.VMEM((height + 2, c, width + 2), jnp.float32),   # pad_b
            pltpu.VMEM((9 * c, r * width), jnp.float32),           # im2col
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        h_p, xc_p, g_p,
        wg_mat, bh.reshape(2 * c, 1), wc_mat, bc.reshape(c, 1), gn,
        wgrT, wguT, wcT,
    )
    dxc = (
        dxc_p.reshape(d, p_cnt, 3 * c, r, width)
        .transpose(0, 1, 3, 4, 2)
        .reshape(d, height, width, 3 * c)
    )
    dwh = dwg.T.reshape(3, 3, c, 2 * c)
    dwc_k = dwc.T.reshape(3, 3, c, c)
    return dxc, dwh, dbg.reshape(2 * c), dwc_k, dbc.reshape(c), dgn_t.T


def _stream_slab_packs(p_cnt: int, c: int, rw: int) -> int:
    """Row-packs per DMA slab for the streamed backward: largest divisor of
    p_cnt whose (sp, 2C, R·W) staging buffer stays ≤ ~2 MB."""
    limit = 2 * 1024 * 1024
    best = 1
    for sp_ in range(1, p_cnt + 1):
        if p_cnt % sp_ == 0 and sp_ * 2 * c * rw * 4 <= limit:
            best = sp_
    return best


def _red_recur_bwd_kernel_stream(
    h_ref, g_ref, xc_hbm, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref,
    wgrT_ref, wguT_ref, wcT_ref,
    dxcg_hbm, dxcc_hbm, dwg_ref, dbg_ref, dwc_ref, dbc_ref, dgn_ref,
    dh_ref, gates_ref, ylin_ref, tmp_ref, pad_ref, rhs_ref, xcs_ref, sem,
    *, c: int, height: int, width: int, r: int, sp: int,
):
    """Slab-streamed adjoint of one RED scale — same math as
    `_red_recur_bwd_kernel`, restructured so the stage-3 production planes
    (384x768 C=8, 192x384 C=16) fit VMEM:

      * xc stays in HBM and is DMA'd in (sp, ·, R·W) slabs inside the two
        passes that read it (gates / candidate recompute);
      * dxc is written back to HBM slab-by-slab as each pass finalizes it
        (candidate half after the GN_y transpose, gates half after the
        GN_r/GN_u transpose) — no whole-plane dxc buffer;
      * the dhn accumulator is eliminated: B1 materializes dht into the dh
        carry in place, C1 rebuilds the new carry as dht·u + dm·r (u is
        already recomputed there), C3 adds the convᵀ terms;
      * one shared pad buffer (h → m → dy_lin → h → dgr → dgu restaged as
        needed) instead of two.

    VMEM ≈ 9C·plane vs the dense kernel's ~22C·plane."""
    d = pl.program_id(0)
    nd = pl.num_programs(0)
    dp = nd - 1 - d
    p_cnt = height // r
    n_slabs = p_cnt // sp
    inv_n = 1.0 / (height * width * c)
    zero = jnp.float32(0)
    zc = jnp.zeros((c, 1), jnp.float32)

    @pl.when(d == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        pad_ref[...] = jnp.zeros_like(pad_ref)
        dwg_ref[...] = jnp.zeros_like(dwg_ref)
        dbg_ref[...] = jnp.zeros_like(dbg_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)
        dbc_ref[...] = jnp.zeros_like(dbc_ref)
        dgn_ref[...] = jnp.zeros_like(dgn_ref)

    def build_rhs(p):
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                for s_ in range(r):
                    slab = pad_ref[pl.ds(p * r + s_ + dy, 1), :, dx : dx + width]
                    rhs_ref[t * c : (t + 1) * c, s_ * width : (s_ + 1) * width] = (
                        slab.reshape(c, width)
                    )

    def stage(p, buf):
        for s_ in range(r):
            pad_ref[pl.ds(p * r + s_ + 1, 1), :, 1 : width + 1] = (
                buf[:, s_ * width : (s_ + 1) * width].reshape(1, c, width)
            )

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    # ================= phase A: recompute forward internals ===============
    def stage_h(p, _):
        stage(p, h_ref[0, p])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_h, 0)

    for s in range(n_slabs):
        dma = pltpu.make_async_copy(
            xc_hbm.at[dp, pl.ds(s * sp, sp), 0 : 2 * c, :], xcs_ref, sem
        )
        dma.start()
        dma.wait()

        def gates_body(q, _):
            p = s * sp + q
            build_rhs(p)
            g = jnp.dot(wg_ref[...], rhs_ref[...],
                        preferred_element_type=jnp.float32)
            gates_ref[p] = g + xcs_ref[q] + bg_ref[...]
            return 0

        jax.lax.fori_loop(0, sp, gates_body, 0)

    def gate_sums(p, acc):
        g = gates_ref[p]
        return acc[0] + jnp.sum(g[:c]), acc[1] + jnp.sum(g[c:])

    sr, su = jax.lax.fori_loop(0, p_cnt, gate_sums, (zero, zero))
    mu_r = sr * inv_n
    mu_u = su * inv_n

    def gate_vars(p, acc):
        g = gates_ref[p]
        dr_ = g[:c] - mu_r
        du_ = g[c:] - mu_u
        return acc[0] + jnp.sum(dr_ * dr_), acc[1] + jnp.sum(du_ * du_)

    vr, vu = jax.lax.fori_loop(0, p_cnt, gate_vars, (zero, zero))
    inv_r = jax.lax.rsqrt(vr * inv_n + _EPS)
    inv_u = jax.lax.rsqrt(vu * inv_n + _EPS)

    def xn_r(p):
        return (gates_ref[p, :c, :] - mu_r) * inv_r

    def xn_u(p):
        return (gates_ref[p, c:, :] - mu_u) * inv_u

    def r_of(p):
        return jax.nn.sigmoid(xn_r(p) * gn_vec(0) + gn_vec(1))

    def u_of(p):
        return jax.nn.sigmoid(xn_u(p) * gn_vec(2) + gn_vec(3))

    def m_body(p, _):
        stage(p, r_of(p) * h_ref[0, p])            # pad ← m
        return 0

    jax.lax.fori_loop(0, p_cnt, m_body, 0)

    sy = zero
    for s in range(n_slabs):
        dma = pltpu.make_async_copy(
            xc_hbm.at[dp, pl.ds(s * sp, sp), 2 * c : 3 * c, :],
            xcs_ref.at[:, :c, :], sem,
        )
        dma.start()
        dma.wait()

        def cand_body(q, acc):
            p = s * sp + q
            build_rhs(p)
            y = jnp.dot(wc_ref[...], rhs_ref[...],
                        preferred_element_type=jnp.float32)
            y = y + xcs_ref[q, :c, :] + bc_ref[...]
            ylin_ref[p] = y
            return acc + jnp.sum(y)

        sy = jax.lax.fori_loop(0, sp, cand_body, sy)
    mu_y = sy * inv_n

    def cand_vars(p, acc):
        dy_ = ylin_ref[p] - mu_y
        return acc + jnp.sum(dy_ * dy_)

    vy = jax.lax.fori_loop(0, p_cnt, cand_vars, zero)
    inv_y = jax.lax.rsqrt(vy * inv_n + _EPS)

    def xn_y(p):
        return (ylin_ref[p] - mu_y) * inv_y

    def y_of(p):
        return jnp.tanh(xn_y(p) * gn_vec(4) + gn_vec(5))

    # ================= phase B: blend + tanh + GN_y adjoint ================
    def b1(p, acc):
        s_dxn, s_dxx, dsy, dby = acc
        dht = dh_ref[p] + g_ref[0, p]
        dh_ref[p] = dht                            # materialize dht in place
        u = u_of(p)
        y = y_of(p)
        do = dht * (1.0 - u) * (1.0 - y * y)
        tmp_ref[p] = do
        xn = xn_y(p)
        dxn = do * gn_vec(4)
        return (
            s_dxn + jnp.sum(dxn),
            s_dxx + jnp.sum(dxn * xn),
            dsy + jnp.sum(do * xn, axis=1, keepdims=True),
            dby + jnp.sum(do, axis=1, keepdims=True),
        )

    s_dxn, s_dxx, dsy, dby = jax.lax.fori_loop(0, p_cnt, b1, (zero, zero, zc, zc))
    dgn_ref[:, 4:5] = dgn_ref[:, 4:5] + dsy
    dgn_ref[:, 5:6] = dgn_ref[:, 5:6] + dby
    m1y = s_dxn * inv_n
    m2y = s_dxx * inv_n

    # pass B2: tmp ← dy_lin; dbc, dWc (rhs of m still staged); dxc_cand out
    for s in range(n_slabs):

        def b2(q, _):
            p = s * sp + q
            do = tmp_ref[p]
            dy_lin = (do * gn_vec(4) - m1y - xn_y(p) * m2y) * inv_y
            tmp_ref[p] = dy_lin
            dbc_ref[...] = dbc_ref[...] + jnp.sum(dy_lin, axis=1, keepdims=True)
            build_rhs(p)
            dwc_ref[...] = dwc_ref[...] + jax.lax.dot_general(
                dy_lin, rhs_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, sp, b2, 0)
        dma = pltpu.make_async_copy(
            tmp_ref.at[pl.ds(s * sp, sp)],
            dxcc_hbm.at[dp, pl.ds(s * sp, sp)], sem,
        )
        dma.start()
        dma.wait()

    # pass B3: dm = convᵀ(dy_lin, Wc)
    def stage_tmp(p, _):
        stage(p, tmp_ref[p])                       # pad ← dy_lin
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_tmp, 0)

    def b3(p, _):
        build_rhs(p)
        tmp_ref[p] = jnp.dot(wcT_ref[...], rhs_ref[...],
                             preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, p_cnt, b3, 0)

    # ================= phase C: r / u chains ===============================
    def c1(p, acc):
        s_dxn_r, s_dxx_r, dsr, dbr, s_dxn_u, s_dxx_u, dsu, dbu = acc
        dm = tmp_ref[p]
        rr_ = r_of(p)
        uu = u_of(p)
        dht = dh_ref[p]
        hp = h_ref[0, p]
        yy = y_of(p)
        dr_pre = dm * hp * rr_ * (1.0 - rr_)
        du_pre = dht * (hp - yy) * uu * (1.0 - uu)
        dh_ref[p] = dht * uu + dm * rr_            # new carry (pre-convᵀ)
        tmp_ref[p] = dr_pre
        ylin_ref[p] = du_pre
        xnr = xn_r(p)
        xnu = xn_u(p)
        dxnr = dr_pre * gn_vec(0)
        dxnu = du_pre * gn_vec(2)
        return (
            s_dxn_r + jnp.sum(dxnr),
            s_dxx_r + jnp.sum(dxnr * xnr),
            dsr + jnp.sum(dr_pre * xnr, axis=1, keepdims=True),
            dbr + jnp.sum(dr_pre, axis=1, keepdims=True),
            s_dxn_u + jnp.sum(dxnu),
            s_dxx_u + jnp.sum(dxnu * xnu),
            dsu + jnp.sum(du_pre * xnu, axis=1, keepdims=True),
            dbu + jnp.sum(du_pre, axis=1, keepdims=True),
        )

    acc0 = (zero, zero, zc, zc, zero, zero, zc, zc)
    s_dxn_r, s_dxx_r, dsr, dbr, s_dxn_u, s_dxx_u, dsu, dbu = (
        jax.lax.fori_loop(0, p_cnt, c1, acc0)
    )
    dgn_ref[:, 0:1] = dgn_ref[:, 0:1] + dsr
    dgn_ref[:, 1:2] = dgn_ref[:, 1:2] + dbr
    dgn_ref[:, 2:3] = dgn_ref[:, 2:3] + dsu
    dgn_ref[:, 3:4] = dgn_ref[:, 3:4] + dbu
    m1r = s_dxn_r * inv_n
    m2r = s_dxx_r * inv_n
    m1u = s_dxn_u * inv_n
    m2u = s_dxx_u * inv_n

    # pass C2: dgates overwrite the dead raw gates; dbg; dWg; dxc_gates out
    def stage_h2(p, _):
        stage(p, h_ref[0, p])                      # pad ← h again
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_h2, 0)

    for s in range(n_slabs):

        def c2(q, _):
            p = s * sp + q
            dr_pre = tmp_ref[p]
            du_pre = ylin_ref[p]
            dgr = (dr_pre * gn_vec(0) - m1r - xn_r(p) * m2r) * inv_r
            dgu = (du_pre * gn_vec(2) - m1u - xn_u(p) * m2u) * inv_u
            gates_ref[p, :c, :] = dgr
            gates_ref[p, c:, :] = dgu
            dbg_ref[:c] = dbg_ref[:c] + jnp.sum(dgr, axis=1, keepdims=True)
            dbg_ref[c:] = dbg_ref[c:] + jnp.sum(dgu, axis=1, keepdims=True)
            build_rhs(p)
            dg2 = jnp.concatenate([dgr, dgu], axis=0)
            dwg_ref[...] = dwg_ref[...] + jax.lax.dot_general(
                dg2, rhs_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, sp, c2, 0)
        dma = pltpu.make_async_copy(
            gates_ref.at[pl.ds(s * sp, sp)],
            dxcg_hbm.at[dp, pl.ds(s * sp, sp)], sem,
        )
        dma.start()
        dma.wait()

    # pass C3: dh_prev += convᵀ(dgr, Wg_r) + convᵀ(dgu, Wg_u)
    def stage_dgr(p, _):
        stage(p, gates_ref[p, :c, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgr, 0)

    def c3r(p, _):
        build_rhs(p)
        dh_ref[p] = dh_ref[p] + jnp.dot(
            wgrT_ref[...], rhs_ref[...], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3r, 0)

    def stage_dgu(p, _):
        stage(p, gates_ref[p, c:, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgu, 0)

    def c3u(p, _):
        build_rhs(p)
        dh_ref[p] = dh_ref[p] + jnp.dot(
            wguT_ref[...], rhs_ref[...], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3u, 0)


def _red_recur_bwd_pallas_stream(xc, outs, wh, bh, wc, bc, gn, g,
                                 interpret=False):
    """Streamed-kernel backward: same contract as `_red_recur_bwd_pallas`."""
    d, height, width, c3 = xc.shape
    c = c3 // 3
    r = _pack_rows(height, width)
    p_cnt = height // r
    sp = _stream_slab_packs(p_cnt, c, r * width)

    def pack(t, ch):
        return (
            t.reshape(d, p_cnt, r, width, ch)
            .transpose(0, 1, 4, 2, 3)
            .reshape(d, p_cnt, ch, r * width)
        )

    h_all = jnp.concatenate([jnp.zeros_like(outs[:1]), outs[:-1]], axis=0)
    xc_p = pack(xc, 3 * c)
    h_p = pack(h_all, c)
    g_p = pack(g, c)

    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T
    wgrT = _flipT(wh[..., :c])
    wguT = _flipT(wh[..., c:])
    wcT = _flipT(wc)

    kernel = functools.partial(
        _red_recur_bwd_kernel_stream, c=c, height=height, width=width, r=r,
        sp=sp,
    )
    rev = lambda di: (d - 1 - di, 0, 0, 0)
    blk = lambda ch: pl.BlockSpec((1, p_cnt, ch, r * width), rev,
                                  memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    const = lambda shape: pl.BlockSpec(shape, lambda di: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    outs_spec = [
        hbm,                                         # dxc gates half
        hbm,                                         # dxc cand half
        const((2 * c, 9 * c)),                       # dwg
        const((2 * c, 1)),                           # dbg
        const((c, 9 * c)),                           # dwc
        const((c, 1)),                               # dbc
        const((c, 6)),                               # dgn (transposed)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((d, p_cnt, 2 * c, r * width), jnp.float32),
        jax.ShapeDtypeStruct((d, p_cnt, c, r * width), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 6), jnp.float32),
    ]
    dxcg, dxcc, dwg, dbg, dwc, dbc, dgn_t = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            blk(c),                                  # h_prev (pipelined)
            blk(c),                                  # g upstream (pipelined)
            hbm,                                     # xc (slab-DMA'd)
            full, full, full, full, full,            # wg, bg, wc, bc, gn
            full, full, full,                        # wgrT, wguT, wcT
        ],
        out_specs=outs_spec,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # dh carry
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # gates/dgates
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # ylin/du_pre
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # do/dy_lin/dm/dr_pre
            pltpu.VMEM((height + 2, c, width + 2), jnp.float32),   # shared pad
            pltpu.VMEM((9 * c, r * width), jnp.float32),           # im2col
            pltpu.VMEM((sp, 2 * c, r * width), jnp.float32),       # xc slab
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        h_p, g_p, xc_p,
        wg_mat, bh.reshape(2 * c, 1), wc_mat, bc.reshape(c, 1), gn,
        wgrT, wguT, wcT,
    )

    def unpack(t, ch):
        return (
            t.reshape(d, p_cnt, ch, r, width)
            .transpose(0, 1, 3, 4, 2)
            .reshape(d, height, width, ch)
        )

    dxc = jnp.concatenate([unpack(dxcg, 2 * c), unpack(dxcc, c)], axis=-1)
    dwh = dwg.T.reshape(3, 3, c, 2 * c)
    dwc_k = dwc.T.reshape(3, 3, c, c)
    return dxc, dwh, dbg.reshape(2 * c), dwc_k, dbc.reshape(c), dgn_t.T


def _stream_vmem_bytes(d, height, width, c):
    """Rough VMEM footprint of the streamed backward kernel."""
    plane = height * width * 4
    io = 2 * (c + c) * plane                         # h, g pipelined ×2
    scratch = (c + 2 * c + c + c) * plane            # dh, gates, ylin, tmp
    pad = (height + 2) * c * (width + 2) * 4
    r = _pack_rows(height, width)
    sp = _stream_slab_packs(height // r, c, r * width)
    slab = sp * 2 * c * r * width * 4
    return io + scratch + pad + slab


def _bwd_vmem_bytes(d, height, width, c):
    """Rough VMEM footprint of the backward kernel (I/O blocks are
    double-buffered by the pipeline; scratches are single)."""
    plane = height * width * 4
    io = 2 * (c + 3 * c + c + 3 * c) * plane          # h, xc, g, dxc ×2
    scratch = (c + c + 2 * c + c + c) * plane         # dh, dhn, gates, ylin, tmp
    pads = 2 * (height + 2) * c * (width + 2) * 4
    return io + scratch + pads


def _gn1(x, scale, bias):
    """GroupNorm(num_groups=1): normalize over the whole (H, W, C) plane."""
    mu = jnp.mean(x)
    var = jnp.mean((x - mu) ** 2)
    return (x - mu) * jax.lax.rsqrt(var + _EPS) * scale + bias


def _cell_step(h, xc, wh, bh, wc, bc, gn):
    """Pure-jnp mirror of one kernel plane step (single plane, NHWC-no-batch).

    Used only by the custom-VJP backward: `jax.vjp` of this function gives
    the exact local adjoint of what the kernel computes per plane."""
    c = h.shape[-1]

    def conv(inp, k):
        return jax.lax.conv_general_dilated(
            inp[None], k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    gates = conv(h, wh) + xc[..., : 2 * c] + bh
    r = jax.nn.sigmoid(_gn1(gates[..., :c], gn[0], gn[1]))
    u = jax.nn.sigmoid(_gn1(gates[..., c:], gn[2], gn[3]))
    y = jnp.tanh(_gn1(conv(r * h, wc) + xc[..., 2 * c :] + bc, gn[4], gn[5]))
    return u * h + (1.0 - u) * y


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def red_recur(
    xc: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    gn: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full ConvGRU depth recurrence of one RED scale (fused kernel).

    Args:
      xc: (D, H, W, 3C) hoisted input contributions [gates-x (2C) | cand-x (C)].
      wh: (3, 3, C, 2C) gates h-conv kernel;  bh: (2C,) its bias.
      wc: (3, 3, C, C) candidate h-conv kernel;  bc: (C,) its bias.
      gn: (6, C) GroupNorm params, rows = [r_scale, r_bias, u_scale, u_bias,
          y_scale, y_bias].
    Returns (D, H, W, C): the GRU output/state for every plane (zero-init
    state; identical math to scanning nn/blocks.ConvGRUCell.recur over D).

    Differentiable: the backward is a reverse `lax.scan` that recomputes each
    plane's internals from the saved state sequence (the forward's own
    output) and applies the exact local VJP — no extra forward residuals are
    stored, so the fused kernel serves training too.
    """
    return _red_recur_impl(xc, wh, bh, wc, bc, gn, interpret)


def _red_recur_fwd(xc, wh, bh, wc, bc, gn, interpret):
    outs = _red_recur_impl(xc, wh, bh, wc, bc, gn, interpret)
    return outs, (xc, outs, wh, bh, wc, bc, gn)


_BWD_VMEM_CAP = 100 * 1024 * 1024
_STREAM_VMEM_CAP = 112 * 1024 * 1024


def _red_recur_bwd(interpret, res, g):
    xc, outs, wh, bh, wc, bc, gn = res
    d, height, width, c3 = xc.shape
    c = c3 // 3
    if _bwd_vmem_bytes(d, height, width, c) <= _BWD_VMEM_CAP:
        return _red_recur_bwd_pallas(xc, outs, wh, bh, wc, bc, gn, g, interpret)
    if (height % _pack_rows(height, width) == 0
            and _stream_vmem_bytes(d, height, width, c) <= _STREAM_VMEM_CAP):
        # plane too large for the dense adjoint but fits the slab-streamed
        # one (xc/dxc stay in HBM) — covers the stage-3 production scales
        return _red_recur_bwd_pallas_stream(
            xc, outs, wh, bh, wc, bc, gn, g, interpret
        )

    # fallback (plane too large even for the streamed adjoint): reverse scan
    # recomputing each step in XLA
    params = (wh, bh, wc, bc, gn)
    h_prev = jnp.concatenate([jnp.zeros_like(outs[:1]), outs[:-1]], axis=0)

    def step(carry, inp):
        dh, dps = carry
        hp, xc_d, g_d = inp
        _, vjp = jax.vjp(_cell_step, hp, xc_d, *params)
        dhp, dxc_d, *dp = vjp(dh + g_d)
        dps = jax.tree.map(jnp.add, dps, tuple(dp))
        return (dhp, dps), dxc_d

    zero = (jnp.zeros_like(outs[0]), jax.tree.map(jnp.zeros_like, params))
    (_, dps), dxc = jax.lax.scan(step, zero, (h_prev, xc, g), reverse=True)
    return (dxc, *dps)


red_recur.defvjp(_red_recur_fwd, _red_recur_bwd)


def cell_params_matrices(cell_params: dict) -> tuple:
    """ConvGRUCell param subtree → red_recur's (wh, bh, wc, bc, gn) args."""
    gn = jnp.stack(
        [
            cell_params["GroupNorm_0"]["scale"],
            cell_params["GroupNorm_0"]["bias"],
            cell_params["GroupNorm_1"]["scale"],
            cell_params["GroupNorm_1"]["bias"],
            cell_params["GroupNorm_2"]["scale"],
            cell_params["GroupNorm_2"]["bias"],
        ]
    )
    return (
        cell_params["Conv_h"]["kernel"],
        cell_params["Conv_h"]["bias"],
        cell_params["Conv_c"]["kernel"],
        cell_params["Conv_c"]["bias"],
        gn,
    )
