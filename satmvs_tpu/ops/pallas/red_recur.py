"""Fused RED ConvGRU depth-recurrence — one Pallas kernel per pyramid scale.

The RED regularizer's only irreducibly sequential computation is, per scale,
a ConvGRU recurrence over depth planes (nn/red.py; reference python loop at
/root/reference/modules/module.py:625 and streaming twin :653-693).  As an
XLA `lax.scan` each plane costs ~9 small dispatches plus carry relayout
copies; here the ENTIRE D-plane recurrence of one scale runs as ONE kernel:
grid=(D,) iterates planes sequentially (TPU grid steps are ordered), the
hidden state lives in VMEM scratch across grid steps, and each step computes

    xc = conv3x3(x, Wx)                         (the cell-input conv)
    g = conv3x3(h, Wh) + xc[..2C] + bh          (im2col matmuls on the MXU)
    r = sigmoid(GN(g[..C]));  u = sigmoid(GN(g[C..]))
    y = tanh(GN(conv3x3(r*h, Wc) + xc[2C..] + bc))
    h = u*h + (1-u)*y                           (== the plane's output)

where x is the scale's raw encoder output.  The input conv runs IN-KERNEL
(it used to be a hoisted XLA batched conv): an NHWC conv at C≈8-64 puts the
channels into the 128-wide lane dimension (up to 16x wasted bandwidth), and
the NHWC → row-packed transpose of its 3C-channel output cost more than the
conv itself — consuming the C-channel x instead cuts both 3x and keeps all
conv math in the dense W-in-lanes layout.

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


def _interp(flag: bool) -> bool:
    """Auto-interpret off-TPU (CPU tests exercise the real kernels through
    interpret mode, including custom-VJP backwards that run outside any
    force_tpu_interpret_mode context; production gates the fused path to
    TPU in models/cascade.py)."""
    return flag or jax.default_backend() != "tpu"


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
    x_ref, wx_ref, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref, h0_ref, out_ref,
    hf_ref, mf_ref, xf_ref, g_ref, xc_ref, rhs_ref, msk_ref,
    *, c: int, cin: int, height: int, width: int, r: int, d_axis: int = 0,
):
    """Flat-pad forward: conv operands live in (C, (H+2)·W) flat buffers
    (rows contiguous in lanes, one zero row top/bottom).  Staging is one
    aligned (C, R·W) lane-slice per row-pack, and an im2col tap (dy, dx) of
    a whole pack is ONE (R·W)-wide slice at lane offset (p·r+dy)·W, column-
    shifted by a STATIC pltpu.roll and border-masked — the roll's wrapped
    element lands exactly where the mask has a zero.  The resident GRU state
    IS the flat h buffer (no separate state array or restaging).  Measured
    1.03–1.19x over per-row pad staging, bit-exact (scripts/_flat_fwd_proto
    trail).  Unaligned widths (W % 128 != 0, the coarse pyramid scales) use
    statically-unrolled pack loops — Mosaic only allows dynamic lane offsets
    at multiples of 128.

    d_axis: grid axis carrying the depth-plane index.  The batched form
    (grid=(B, D), `_red_recur_impl_batched`) puts the batch element on axis 0
    and resets the resident state at every d == 0 — i.e. once per batch
    element, whose h0 block the index maps select."""
    d = pl.program_id(d_axis)
    p_cnt = height // r
    rw = r * width
    inv_n = 1.0 / (height * width * c)
    zero = jnp.float32(0)
    aligned = width % 128 == 0

    def ploop(body):
        if aligned:
            jax.lax.fori_loop(0, p_cnt, body, 0)
        else:
            for p in range(p_cnt):
                body(p, 0)

    def ploop_acc(body, init):
        if aligned:
            return jax.lax.fori_loop(0, p_cnt, body, init)
        acc = init
        for p in range(p_cnt):
            acc = body(p, acc)
        return acc

    @pl.when(d == 0)
    def _():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        mf_ref[...] = jnp.zeros_like(mf_ref)
        xf_ref[...] = jnp.zeros_like(xf_ref)
        # border masks as float arithmetic (Mosaic can't lower i1 vectors):
        # row 0 zeroes x == 0 (dx=0 tap), row 1 zeroes x == W-1 (dx=2 tap)
        pos = (jax.lax.broadcasted_iota(jnp.int32, (2, rw), 1) % width
               ).astype(jnp.float32)
        msk_ref[0:1] = jnp.minimum(pos[0:1], 1.0)
        msk_ref[1:2] = jnp.minimum(jnp.float32(width - 1) - pos[1:2], 1.0)

        # initial state h0 (zeros for the full-volume form; the previous
        # slab's last state when slab-streaming)
        def h0_body(p, _):
            hf_ref[:, pl.ds((p * r + 1) * width, rw)] = h0_ref[p]
            return 0

        ploop(h0_body)

    def hslice(p):
        return hf_ref[:, pl.ds((p * r + 1) * width, rw)]

    def build_rhs(flat_ref, p, ch=c):
        """im2col patch of pack p: (9·ch, R·W), tap-major K — 9 whole-pack
        slices (+static roll + border mask for the dx != 1 taps)."""
        for dy in range(3):
            base = flat_ref[:, pl.ds((p * r + dy) * width, rw)]
            t = dy * 3
            rhs_ref[t * ch : (t + 1) * ch] = (
                pltpu.roll(base, 1, 1) * msk_ref[0:1]
            )
            rhs_ref[(t + 1) * ch : (t + 2) * ch] = base
            rhs_ref[(t + 2) * ch : (t + 3) * ch] = (
                pltpu.roll(base, rw - 1, 1) * msk_ref[1:2]
            )

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    # ---- x-side conv (the cell's input contribution), in-kernel: xc =
    # Wx @ im2col(x).  An XLA NHWC conv at C≈8 wastes 16x lane bandwidth,
    # and only the C-channel x crosses the NHWC → row-packed boundary.
    def stage_x(p, _):
        xf_ref[:, pl.ds((p * r + 1) * width, rw)] = x_ref[0, p]
        return 0

    ploop(stage_x)

    def xc_body(p, _):
        build_rhs(xf_ref, p, cin)
        xc_ref[p] = jnp.dot(wx_ref[...], rhs_ref[: 9 * cin],
                            preferred_element_type=jnp.float32)
        return 0

    ploop(xc_body)

    # ---- gates conv: g = Wg @ im2col(h) + xc_g + bg
    def gates_body(p, _):
        build_rhs(hf_ref, p)
        g = jnp.dot(wg_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        g_ref[p] = g + xc_ref[p, : 2 * c, :] + bg_ref[...]
        return 0

    ploop(gates_body)

    # ---- GroupNorm stats of the r/u halves (two-pass: mean, then variance)
    def gate_sums(p, acc):
        g = g_ref[p]
        return acc[0] + jnp.sum(g[:c]), acc[1] + jnp.sum(g[c:])

    sr, su = ploop_acc(gate_sums, (zero, zero))
    mu_r = sr * inv_n
    mu_u = su * inv_n

    def gate_vars(p, acc):
        g = g_ref[p]
        dr = g[:c] - mu_r
        du = g[c:] - mu_u
        return acc[0] + jnp.sum(dr * dr), acc[1] + jnp.sum(du * du)

    vr, vu = ploop_acc(gate_vars, (zero, zero))
    inv_r = jax.lax.rsqrt(vr * inv_n + _EPS)
    inv_u = jax.lax.rsqrt(vu * inv_n + _EPS)

    # ---- m = sigmoid(GN_r(g_r)) · h into the m flat buffer
    def m_body(p, _):
        raw = g_ref[p, :c, :]
        rgate = jax.nn.sigmoid((raw - mu_r) * inv_r * gn_vec(0) + gn_vec(1))
        mf_ref[:, pl.ds((p * r + 1) * width, rw)] = rgate * hslice(p)
        return 0

    ploop(m_body)

    # ---- candidate conv (reuses the dead r-half of g as storage)
    def cand_body(p, acc):
        build_rhs(mf_ref, p)
        y = jnp.dot(wc_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        y = y + xc_ref[p, 2 * c :, :] + bc_ref[...]
        g_ref[p, :c, :] = y
        return acc + jnp.sum(y)

    sy = ploop_acc(cand_body, zero)
    mu_y = sy * inv_n

    def cand_vars(p, acc):
        dy_ = g_ref[p, :c, :] - mu_y
        return acc + jnp.sum(dy_ * dy_)

    vy = ploop_acc(cand_vars, zero)
    inv_y = jax.lax.rsqrt(vy * inv_n + _EPS)

    # ---- blend; emit the plane; the state update IS the flat-h write
    def blend_body(p, _):
        g = g_ref[p]
        y = jnp.tanh((g[:c] - mu_y) * inv_y * gn_vec(4) + gn_vec(5))
        u = jax.nn.sigmoid((g[c:] - mu_u) * inv_u * gn_vec(2) + gn_vec(3))
        hn = u * hslice(p) + (1.0 - u) * y
        hf_ref[:, pl.ds((p * r + 1) * width, rw)] = hn
        out_ref[0, p] = hn
        return 0

    ploop(blend_body)


def _pack_nhwc(t: jnp.ndarray, ch: int, p_cnt: int, r: int, width: int):
    """(D, H, W, ch) NHWC → row-packed (D, P, ch, R·W)."""
    d = t.shape[0]
    return (
        t.reshape(d, p_cnt, r, width, ch)
        .transpose(0, 1, 4, 2, 3)
        .reshape(d, p_cnt, ch, r * width)
    )


def _red_recur_impl(
    x_packed: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    gn: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
    h0_packed: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Core kernel call — row-packed in/out: (D, P, Cin, R·W) → (D, P, C, R·W)."""
    d, p_cnt, cin, _ = x_packed.shape
    c = wx.shape[-1] // 3
    r = height // p_cnt

    if h0_packed is None:
        h0_packed = jnp.zeros((p_cnt, c, r * width), jnp.float32)
    # tap-major (Cout, 9·Cin) weight matrices
    wx_mat = wx.reshape(9 * cin, 3 * c).T
    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T

    kernel = functools.partial(
        _red_recur_kernel, c=c, cin=cin, height=height, width=width, r=r
    )
    out = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec(
                (1, p_cnt, cin, r * width),
                lambda di: (di, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
        ],
        out_specs=pl.BlockSpec(
            (1, p_cnt, c, r * width),
            lambda di: (di, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, p_cnt, c, r * width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, (height + 2) * width), jnp.float32),    # h flat
            pltpu.VMEM((c, (height + 2) * width), jnp.float32),    # m flat
            pltpu.VMEM((cin, (height + 2) * width), jnp.float32),  # x flat
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # raw gates
            pltpu.VMEM((p_cnt, 3 * c, r * width), jnp.float32),    # xc
            pltpu.VMEM((9 * max(c, cin), r * width), jnp.float32),  # im2col
            pltpu.VMEM((2, r * width), jnp.float32),               # border masks
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(
        x_packed,
        wx_mat,
        wg_mat,
        bh.reshape(2 * c, 1),
        wc_mat,
        bc.reshape(c, 1),
        gn,
        h0_packed,
    )
    return out


def _red_recur_impl_batched(
    x_packed: jnp.ndarray,
    wx, wh, bh, wc, bc, gn,
    height: int,
    width: int,
    interpret: bool = False,
    h0_packed: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched core: (B, D, P, Cin, R·W) → (B, D, P, C, R·W) in ONE kernel.

    grid=(B, D): the depth recurrence runs on grid axis 1 and the resident
    VMEM state resets at every d == 0, re-seeded from batch element b's h0
    block — B independent recurrences without B separate pallas_calls (the
    per-call boundary glue and unrolled-HLO growth of the python batch loop,
    VERDICT r2 weak #4).  Inference-only: no custom VJP (training keeps the
    per-element `red_recur_packed`, whose adjoint kernels are unbatched)."""
    bb, d, p_cnt, cin, _ = x_packed.shape
    c = wx.shape[-1] // 3
    r = height // p_cnt

    if h0_packed is None:
        h0_packed = jnp.zeros((bb, p_cnt, c, r * width), jnp.float32)
    wx_mat = wx.reshape(9 * cin, 3 * c).T
    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T

    kernel = functools.partial(
        _red_recur_kernel, c=c, cin=cin, height=height, width=width, r=r,
        d_axis=1,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bb, d),
        in_specs=[
            # batch dim squeezed (None) so the kernel sees the SAME ref ranks
            # as the unbatched impl: x (1, P, Cin, R·W), h0 (P, C, R·W)
            pl.BlockSpec(
                (None, 1, p_cnt, cin, r * width),
                lambda bi, di: (bi, di, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full(), full(), full(), full(), full(), full(),
            pl.BlockSpec(
                (None, p_cnt, c, r * width),
                lambda bi, di: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, 1, p_cnt, c, r * width),
            lambda bi, di: (bi, di, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bb, d, p_cnt, c, r * width), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((c, (height + 2) * width), jnp.float32),    # h flat
            pltpu.VMEM((c, (height + 2) * width), jnp.float32),    # m flat
            pltpu.VMEM((cin, (height + 2) * width), jnp.float32),  # x flat
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # raw gates
            pltpu.VMEM((p_cnt, 3 * c, r * width), jnp.float32),    # xc
            pltpu.VMEM((9 * max(c, cin), r * width), jnp.float32),  # im2col
            pltpu.VMEM((2, r * width), jnp.float32),               # border masks
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(
        x_packed,
        wx_mat,
        wg_mat,
        bh.reshape(2 * c, 1),
        wc_mat,
        bc.reshape(c, 1),
        gn,
        h0_packed,
    )
    return out


def _red_recur_bwd_kernel(
    h_ref, x_ref, gb_ref, wx_ref, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref,
    wgrT_ref, wguT_ref, wcT_ref, wxrT_ref, wxuT_ref, wxcT_ref,
    dx_ref, dwx_ref, dwg_ref, dbg_ref, dwc_ref, dbc_ref, dgn_ref,
    dh_ref, dhn_ref, gates_ref, ylin_ref, tmp_ref, pada_ref, padb_ref,
    padx_ref, rhs_ref,
    *, c: int, cin: int, height: int, width: int, r: int,
):
    """Adjoint of one RED scale's depth recurrence — reverse grid over planes.

    Per plane d (visited D−1 → 0): recompute the forward internals from the
    carried-in h_prev (= the forward's own output for plane d−1, an input
    block) and x (the cell input — its conv contribution xc = Wx ⊛ x is
    recomputed in-kernel, like the forward), then run the exact adjoint
    chain in VMEM:

        dht = dh_carry + g_d
        du = dht(h_prev − y)σ'(u);  dy_lin = GN_yᵀ(dht(1−u)·tanh')
        dm = convᵀ(dy_lin, Wc);     dr = dm·h_prev
        dgates = [GN_rᵀ(dr·σ'(r)) | GN_uᵀ(du)]
        dh_prev = dht·u + dm·r + convᵀ(dgates, Wg)
        dx = convᵀ(dgates, Wx_g) + convᵀ(dy_lin, Wx_c)

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
        padx_ref[...] = jnp.zeros_like(padx_ref)
        dwx_ref[...] = jnp.zeros_like(dwx_ref)
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
        """Write a (ch, R·W) pack into pad rows (interior)."""
        ch = buf.shape[0]
        for s in range(r):
            pad_ref[pl.ds(p * r + s + 1, 1), :, 1 : width + 1] = (
                buf[:, s * width : (s + 1) * width].reshape(1, ch, width)
            )

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    # ================= phase A: recompute forward internals ===============
    def stage_hx(p, _):
        stage(pada_ref, p, h_ref[0, p])
        stage(padx_ref, p, x_ref[0, p])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_hx, 0)

    def gates_body(p, _):
        build_rhs(pada_ref, p, c)
        g = jnp.dot(wg_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        build_rhs(padx_ref, p, cin)
        g = g + jnp.dot(wx_ref[: 2 * c], rhs_ref[: 9 * cin],
                        preferred_element_type=jnp.float32)
        gates_ref[p] = g + bg_ref[...]
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
        y = jnp.dot(wc_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        build_rhs(padx_ref, p, cin)
        y = y + jnp.dot(wx_ref[2 * c :], rhs_ref[: 9 * cin],
                        preferred_element_type=jnp.float32)
        ylin_ref[p] = y + bc_ref[...]
        return acc + jnp.sum(ylin_ref[p])

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

    # pass B2: tmp ← dy_lin; dbc, dWc (rhs of m still in pad_b), dWx cand rows
    def b2(p, _):
        do = tmp_ref[p]
        dy_lin = (do * gn_vec(4) - m1y - xn_y(p) * m2y) * inv_y
        tmp_ref[p] = dy_lin
        dbc_ref[...] = dbc_ref[...] + jnp.sum(dy_lin, axis=1, keepdims=True)
        build_rhs(padb_ref, p, c)
        dwc_ref[...] = dwc_ref[...] + jax.lax.dot_general(
            dy_lin, rhs_ref[: 9 * c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        build_rhs(padx_ref, p, cin)
        dwx_ref[2 * c :] = dwx_ref[2 * c :] + jax.lax.dot_general(
            dy_lin, rhs_ref[: 9 * cin], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, b2, 0)

    # pass B3: dm = convᵀ(dy_lin, Wc); dx ← convᵀ(dy_lin, Wx_c)
    def stage_tmp(p, _):
        stage(padb_ref, p, tmp_ref[p])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_tmp, 0)

    def b3(p, _):
        build_rhs(padb_ref, p, c)
        tmp_ref[p] = jnp.dot(
            wcT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        dx_ref[0, p] = jnp.dot(
            wxcT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
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
        tmp_ref[p] = dr_pre                      # dm dead; ylin dead after y_of
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

    # pass C2: finalize dgates (overwrite the dead raw gates); dbg; dWg
    # (rhs of h in pad_a); dWx gate rows (rhs of x in pad_x)
    def c2(p, _):
        dr_pre = tmp_ref[p]
        du_pre = ylin_ref[p]
        dgr = (dr_pre * gn_vec(0) - m1r - xn_r(p) * m2r) * inv_r
        dgu = (du_pre * gn_vec(2) - m1u - xn_u(p) * m2u) * inv_u
        gates_ref[p, :c, :] = dgr
        gates_ref[p, c:, :] = dgu
        dbg_ref[:c] = dbg_ref[:c] + jnp.sum(dgr, axis=1, keepdims=True)
        dbg_ref[c:] = dbg_ref[c:] + jnp.sum(dgu, axis=1, keepdims=True)
        dg2 = jnp.concatenate([dgr, dgu], axis=0)
        build_rhs(pada_ref, p, c)
        dwg_ref[...] = dwg_ref[...] + jax.lax.dot_general(
            dg2, rhs_ref[: 9 * c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        build_rhs(padx_ref, p, cin)
        dwx_ref[: 2 * c] = dwx_ref[: 2 * c] + jax.lax.dot_general(
            dg2, rhs_ref[: 9 * cin], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c2, 0)

    # pass C3: dh_prev += convᵀ(dgr, Wg_r) + convᵀ(dgu, Wg_u);
    #          dx += convᵀ(dgr, Wx_r) + convᵀ(dgu, Wx_u)
    def stage_dgr(p, _):
        stage(padb_ref, p, gates_ref[p, :c, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgr, 0)

    def c3r(p, _):
        build_rhs(padb_ref, p, c)
        dhn_ref[p] = dhn_ref[p] + jnp.dot(
            wgrT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        dx_ref[0, p] = dx_ref[0, p] + jnp.dot(
            wxrT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3r, 0)

    def stage_dgu(p, _):
        stage(padb_ref, p, gates_ref[p, c:, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgu, 0)

    def c3u(p, _):
        build_rhs(padb_ref, p, c)
        dh_ref[p] = dhn_ref[p] + jnp.dot(
            wguT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        dx_ref[0, p] = dx_ref[0, p] + jnp.dot(
            wxuT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3u, 0)


def _flipT(w):
    """(3, 3, Cin, Cout) conv kernel → (Cin, 9·Cout) transposed-conv matrix:
    element [ci, (dy·3+dx)·Cout + co] = w[2−dy, 2−dx, ci, co]."""
    c_in = w.shape[2]
    return jnp.flip(w, (0, 1)).transpose(2, 0, 1, 3).reshape(c_in, -1)


def _red_recur_bwd_pallas(x_p, outs_p, wx, wh, bh, wc, bc, gn, g_p,
                          height, width, interpret=False):
    """Pallas backward: cotangents of (x, wx, wh, bh, wc, bc, gn) from
    upstream g and the forward state sequence `outs` (all row-packed)."""
    d, p_cnt, cin, _ = x_p.shape
    c = wx.shape[-1] // 3
    r = height // p_cnt

    h_p = jnp.concatenate([jnp.zeros_like(outs_p[:1]), outs_p[:-1]], axis=0)

    wx_mat = wx.reshape(9 * cin, 3 * c).T
    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T
    wgrT = _flipT(wh[..., :c])
    wguT = _flipT(wh[..., c:])
    wcT = _flipT(wc)
    wxrT = _flipT(wx[..., :c])
    wxuT = _flipT(wx[..., c : 2 * c])
    wxcT = _flipT(wx[..., 2 * c :])

    kernel = functools.partial(
        _red_recur_bwd_kernel, c=c, cin=cin, height=height, width=width, r=r
    )
    rev = lambda di: (d - 1 - di, 0, 0, 0)
    blk = lambda ch: pl.BlockSpec((1, p_cnt, ch, r * width), rev,
                                  memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda di: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    outs_spec = [
        blk(cin),                                    # dx
        const((3 * c, 9 * cin)),                     # dwx
        const((2 * c, 9 * c)),                       # dwg
        const((2 * c, 1)),                           # dbg
        const((c, 9 * c)),                           # dwc
        const((c, 1)),                               # dbc
        const((c, 6)),                               # dgn (transposed)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((d, p_cnt, cin, r * width), jnp.float32),
        jax.ShapeDtypeStruct((3 * c, 9 * cin), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 6), jnp.float32),
    ]
    dx_p, dwx, dwg, dbg, dwc, dbc, dgn_t = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            blk(c),                                  # h_prev
            blk(cin),                                # x
            blk(c),                                  # g upstream
            full, full, full, full, full, full,      # wx, wg, bg, wc, bc, gn
            full, full, full,                        # wgrT, wguT, wcT
            full, full, full,                        # wxrT, wxuT, wxcT
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
            pltpu.VMEM((height + 2, cin, width + 2), jnp.float32),  # pad_x
            pltpu.VMEM((9 * max(c, cin), r * width), jnp.float32),  # im2col
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(
        h_p, x_p, g_p,
        wx_mat, wg_mat, bh.reshape(2 * c, 1), wc_mat, bc.reshape(c, 1), gn,
        wgrT, wguT, wcT, wxrT, wxuT, wxcT,
    )
    dwx_k = dwx.T.reshape(3, 3, cin, 3 * c)
    dwh = dwg.T.reshape(3, 3, c, 2 * c)
    dwc_k = dwc.T.reshape(3, 3, c, c)
    return dx_p, dwx_k, dwh, dbg.reshape(2 * c), dwc_k, dbc.reshape(c), dgn_t.T


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
    h_ref, g_ref, x_hbm, wx_ref, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref,
    wgrT_ref, wguT_ref, wcT_ref, wxrT_ref, wxuT_ref, wxcT_ref,
    dx_hbm, dwx_ref, dwg_ref, dbg_ref, dwc_ref, dbc_ref, dgn_ref,
    dh_ref, gates_ref, ylin_ref, tmp_ref, dx_ref, pad_ref, padx_ref,
    rhs_ref, xs_ref, sem, osem,
    *, c: int, cin: int, height: int, width: int, r: int, sp: int,
):
    """Slab-streamed adjoint of one RED scale — same math as
    `_red_recur_bwd_kernel`, restructured so the stage-3 production planes
    (384x768 C=8, 192x384 C=16) fit VMEM:

      * x stays in HBM, DMA'd once per plane in (sp, C, R·W) slabs and staged
        into a persistent pad_x (the in-kernel xc recompute and the dWx
        accumulation read it via im2col builds);
      * dx accumulates in a VMEM buffer across the three convᵀ passes and is
        written back to HBM once per plane — no pipelined dx blocks;
      * the dhn accumulator is eliminated: B1 materializes dht into the dh
        carry in place, C1 rebuilds the new carry as dht·u + dm·r (u is
        already recomputed there), C3 adds the convᵀ terms;
      * one shared pad buffer (h → m → dy_lin → h → dgr → dgu restaged as
        needed) plus the persistent pad_x.

    VMEM ≈ 12C·plane vs the dense kernel's ~17C·plane."""
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
        padx_ref[...] = jnp.zeros_like(padx_ref)
        dwx_ref[...] = jnp.zeros_like(dwx_ref)
        dwg_ref[...] = jnp.zeros_like(dwg_ref)
        dbg_ref[...] = jnp.zeros_like(dbg_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)
        dbc_ref[...] = jnp.zeros_like(dbc_ref)
        dgn_ref[...] = jnp.zeros_like(dgn_ref)

    def build_rhs_from(pad, p, ch=c):
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                for s_ in range(r):
                    slab = pad[pl.ds(p * r + s_ + dy, 1), :, dx : dx + width]
                    rhs_ref[t * ch : (t + 1) * ch, s_ * width : (s_ + 1) * width] = (
                        slab.reshape(ch, width)
                    )

    def build_rhs(p):
        build_rhs_from(pad_ref, p)

    def stage_into(pad, p, buf):
        ch = buf.shape[0]
        for s_ in range(r):
            pad[pl.ds(p * r + s_ + 1, 1), :, 1 : width + 1] = (
                buf[:, s_ * width : (s_ + 1) * width].reshape(1, ch, width)
            )

    def stage(p, buf):
        stage_into(pad_ref, p, buf)

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    # ================= phase A: recompute forward internals ===============
    def stage_h(p, _):
        stage(p, h_ref[0, p])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_h, 0)

    # x: slab-DMA from HBM into the persistent pad_x
    for s in range(n_slabs):
        dma = pltpu.make_async_copy(
            x_hbm.at[dp, pl.ds(s * sp, sp), :, :], xs_ref, sem
        )
        dma.start()
        dma.wait()

        def stage_x(q, _):
            stage_into(padx_ref, s * sp + q, xs_ref[q])
            return 0

        jax.lax.fori_loop(0, sp, stage_x, 0)

    def gates_body(p, _):
        build_rhs(p)
        g = jnp.dot(wg_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        build_rhs_from(padx_ref, p, cin)
        g = g + jnp.dot(wx_ref[: 2 * c], rhs_ref[: 9 * cin],
                        preferred_element_type=jnp.float32)
        gates_ref[p] = g + bg_ref[...]
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

    def cand_body(p, acc):
        build_rhs(p)
        y = jnp.dot(wc_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        build_rhs_from(padx_ref, p, cin)
        y = y + jnp.dot(wx_ref[2 * c :], rhs_ref[: 9 * cin],
                        preferred_element_type=jnp.float32)
        ylin_ref[p] = y + bc_ref[...]
        return acc + jnp.sum(ylin_ref[p])

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

    # pass B2: tmp ← dy_lin; dbc, dWc (rhs of m still staged); dWx cand rows
    def b2(p, _):
        do = tmp_ref[p]
        dy_lin = (do * gn_vec(4) - m1y - xn_y(p) * m2y) * inv_y
        tmp_ref[p] = dy_lin
        dbc_ref[...] = dbc_ref[...] + jnp.sum(dy_lin, axis=1, keepdims=True)
        build_rhs(p)
        dwc_ref[...] = dwc_ref[...] + jax.lax.dot_general(
            dy_lin, rhs_ref[: 9 * c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        build_rhs_from(padx_ref, p, cin)
        dwx_ref[2 * c :] = dwx_ref[2 * c :] + jax.lax.dot_general(
            dy_lin, rhs_ref[: 9 * cin], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, b2, 0)

    # pass B3: dm = convᵀ(dy_lin, Wc); dx ← convᵀ(dy_lin, Wx_c)
    def stage_tmp(p, _):
        stage(p, tmp_ref[p])                       # pad ← dy_lin
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_tmp, 0)

    def b3(p, _):
        build_rhs(p)
        tmp_ref[p] = jnp.dot(wcT_ref[...], rhs_ref[: 9 * c],
                             preferred_element_type=jnp.float32)
        dx_ref[p] = jnp.dot(wxcT_ref[...], rhs_ref[: 9 * c],
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

    # pass C2: dgates overwrite the dead raw gates; dbg; dWg; dWx gate rows
    def stage_h2(p, _):
        stage(p, h_ref[0, p])                      # pad ← h again
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_h2, 0)

    def c2(p, _):
        dr_pre = tmp_ref[p]
        du_pre = ylin_ref[p]
        dgr = (dr_pre * gn_vec(0) - m1r - xn_r(p) * m2r) * inv_r
        dgu = (du_pre * gn_vec(2) - m1u - xn_u(p) * m2u) * inv_u
        gates_ref[p, :c, :] = dgr
        gates_ref[p, c:, :] = dgu
        dbg_ref[:c] = dbg_ref[:c] + jnp.sum(dgr, axis=1, keepdims=True)
        dbg_ref[c:] = dbg_ref[c:] + jnp.sum(dgu, axis=1, keepdims=True)
        dg2 = jnp.concatenate([dgr, dgu], axis=0)
        build_rhs(p)
        dwg_ref[...] = dwg_ref[...] + jax.lax.dot_general(
            dg2, rhs_ref[: 9 * c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        build_rhs_from(padx_ref, p, cin)
        dwx_ref[: 2 * c] = dwx_ref[: 2 * c] + jax.lax.dot_general(
            dg2, rhs_ref[: 9 * cin], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c2, 0)

    # pass C3: dh_prev += convᵀ(dgr, Wg_r) + convᵀ(dgu, Wg_u);
    #          dx += convᵀ(dgr, Wx_r) + convᵀ(dgu, Wx_u)
    def stage_dgr(p, _):
        stage(p, gates_ref[p, :c, :])
        return 0

    jax.lax.fori_loop(0, p_cnt, stage_dgr, 0)

    def c3r(p, _):
        build_rhs(p)
        dh_ref[p] = dh_ref[p] + jnp.dot(
            wgrT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        dx_ref[p] = dx_ref[p] + jnp.dot(
            wxrT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
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
            wguT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        dx_ref[p] = dx_ref[p] + jnp.dot(
            wxuT_ref[...], rhs_ref[: 9 * c], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, c3u, 0)

    # write this plane's dx back to HBM (single DMA per plane)
    odma = pltpu.make_async_copy(dx_ref, dx_hbm.at[dp], osem)
    odma.start()
    odma.wait()


def _red_recur_bwd_pallas_stream(x_p, outs_p, wx, wh, bh, wc, bc, gn, g_p,
                                 height, width, interpret=False):
    """Streamed-kernel backward: same contract as `_red_recur_bwd_pallas`."""
    d, p_cnt, cin, _ = x_p.shape
    c = wx.shape[-1] // 3
    r = height // p_cnt
    sp = _stream_slab_packs(p_cnt, cin, r * width)

    h_p = jnp.concatenate([jnp.zeros_like(outs_p[:1]), outs_p[:-1]], axis=0)

    wx_mat = wx.reshape(9 * cin, 3 * c).T
    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T
    wgrT = _flipT(wh[..., :c])
    wguT = _flipT(wh[..., c:])
    wcT = _flipT(wc)
    wxrT = _flipT(wx[..., :c])
    wxuT = _flipT(wx[..., c : 2 * c])
    wxcT = _flipT(wx[..., 2 * c :])

    kernel = functools.partial(
        _red_recur_bwd_kernel_stream, c=c, cin=cin, height=height, width=width,
        r=r, sp=sp,
    )
    rev = lambda di: (d - 1 - di, 0, 0, 0)
    blk = lambda ch: pl.BlockSpec((1, p_cnt, ch, r * width), rev,
                                  memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    const = lambda shape: pl.BlockSpec(shape, lambda di: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    outs_spec = [
        hbm,                                         # dx (plane DMA writes)
        const((3 * c, 9 * cin)),                     # dwx
        const((2 * c, 9 * c)),                       # dwg
        const((2 * c, 1)),                           # dbg
        const((c, 9 * c)),                           # dwc
        const((c, 1)),                               # dbc
        const((c, 6)),                               # dgn (transposed)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((d, p_cnt, cin, r * width), jnp.float32),
        jax.ShapeDtypeStruct((3 * c, 9 * cin), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((2 * c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 9 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 6), jnp.float32),
    ]
    dx_p, dwx, dwg, dbg, dwc, dbc, dgn_t = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            blk(c),                                  # h_prev (pipelined)
            blk(c),                                  # g upstream (pipelined)
            hbm,                                     # x (slab-DMA'd)
            full, full, full, full, full, full,      # wx, wg, bg, wc, bc, gn
            full, full, full,                        # wgrT, wguT, wcT
            full, full, full,                        # wxrT, wxuT, wxcT
        ],
        out_specs=outs_spec,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # dh carry
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # gates/dgates
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # ylin/du_pre
            pltpu.VMEM((p_cnt, c, r * width), jnp.float32),        # do/dy_lin/dm/dr_pre
            pltpu.VMEM((p_cnt, cin, r * width), jnp.float32),      # dx accum
            pltpu.VMEM((height + 2, c, width + 2), jnp.float32),   # shared pad
            pltpu.VMEM((height + 2, cin, width + 2), jnp.float32),  # pad_x
            pltpu.VMEM((9 * max(c, cin), r * width), jnp.float32),  # im2col
            pltpu.VMEM((sp, cin, r * width), jnp.float32),         # x slab
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(
        h_p, g_p, x_p,
        wx_mat, wg_mat, bh.reshape(2 * c, 1), wc_mat, bc.reshape(c, 1), gn,
        wgrT, wguT, wcT, wxrT, wxuT, wxcT,
    )

    dx = dx_p
    dwx_k = dwx.T.reshape(3, 3, cin, 3 * c)
    dwh = dwg.T.reshape(3, 3, c, 2 * c)
    dwc_k = dwc.T.reshape(3, 3, c, c)
    return dx, dwx_k, dwh, dbg.reshape(2 * c), dwc_k, dbc.reshape(c), dgn_t.T


def fwd_vmem_bytes(height, width, c, cin):
    """Rough VMEM footprint of the flat-pad forward kernel (scratches +
    double-buffered I/O blocks) — the feasibility gate for the fused
    pipeline at large tile geometries (nn/red.packed_pipeline_feasible)."""
    plane = height * width * 4
    flats = (2 * c + cin) * (height + 2) * width * 4   # h, m, x flat pads
    scratch = (2 * c + 3 * c) * plane                  # raw gates + xc
    r = _pack_rows(height, width)
    rhs = 9 * max(c, cin) * r * width * 4
    io = (2 * (cin + c) + c) * plane                   # in/out ×2 + h0
    return flats + scratch + rhs + io


def _stream_vmem_bytes(d, height, width, c, cin):
    """Rough VMEM footprint of the streamed backward kernel."""
    plane = height * width * 4
    io = 2 * (c + c) * plane                         # h, g pipelined ×2
    scratch = (c + 2 * c + c + c + cin) * plane      # dh, gates, ylin, tmp, dx
    pads = (height + 2) * (c + cin) * (width + 2) * 4  # shared pad + pad_x
    r = _pack_rows(height, width)
    sp = _stream_slab_packs(height // r, cin, r * width)
    slab = sp * cin * r * width * 4
    return io + scratch + pads + slab


def _bwd_vmem_bytes(d, height, width, c, cin):
    """Rough VMEM footprint of the backward kernel (I/O blocks are
    double-buffered by the pipeline; scratches are single)."""
    plane = height * width * 4
    io = 2 * (c + cin + c + cin) * plane              # h, x, g, dx ×2
    scratch = (c + c + 2 * c + c + c) * plane         # dh, dhn, gates, ylin, tmp
    pads = (height + 2) * (2 * c + cin) * (width + 2) * 4  # pad_a/b, pad_x
    return io + scratch + pads


def _gn1(x, scale, bias):
    """GroupNorm(num_groups=1): normalize over the whole (H, W, C) plane."""
    mu = jnp.mean(x)
    var = jnp.mean((x - mu) ** 2)
    return (x - mu) * jax.lax.rsqrt(var + _EPS) * scale + bias


def _cell_step(h, x, wx, wh, bh, wc, bc, gn):
    """Pure-jnp mirror of one kernel plane step (single plane, NHWC-no-batch).

    Used only by the custom-VJP backward: `jax.vjp` of this function gives
    the exact local adjoint of what the kernel computes per plane."""
    c = h.shape[-1]

    def conv(inp, k):
        return jax.lax.conv_general_dilated(
            inp[None], k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    xc = conv(x, wx)
    gates = conv(h, wh) + xc[..., : 2 * c] + bh
    r = jax.nn.sigmoid(_gn1(gates[..., :c], gn[0], gn[1]))
    u = jax.nn.sigmoid(_gn1(gates[..., c:], gn[2], gn[3]))
    y = jnp.tanh(_gn1(conv(r * h, wc) + xc[..., 2 * c :] + bc, gn[4], gn[5]))
    return u * h + (1.0 - u) * y


def _pack(x: jnp.ndarray) -> jnp.ndarray:
    d, h, w, c = x.shape
    r = _pack_rows(h, w)
    return _pack_nhwc(x, c, h // r, r, w)


def _unpack(xp: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    d, p_cnt, c, _ = xp.shape
    r = height // p_cnt
    return (
        xp.reshape(d, p_cnt, c, r, width)
        .transpose(0, 1, 3, 4, 2)
        .reshape(d, height, width, c)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def red_recur_packed(
    x: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    gn: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """`red_recur` on row-packed (D, P, C, R·W) input/output — the layout the
    plane_conv encoder/decoder kernels produce/consume, so the whole RED
    pipeline avoids NHWC transposes (see red_recur for the math)."""
    return _red_recur_impl(x, wx, wh, bh, wc, bc, gn, height, width, interpret)


def red_recur(
    x: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    gn: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full ConvGRU depth recurrence of one RED scale (fused kernel).

    Args:
      x:  (D, H, W, C) the cell input for every plane (the scale's encoder
          output).  Its conv contribution xc = Wx ⊛ x is computed IN-KERNEL
          (im2col matmuls in the W-in-lanes layout): an XLA NHWC conv at
          C≈8-64 wastes up to 16x lane bandwidth, and only the C-channel x
          (not the 3C xc) crosses the NHWC → row-packed layout boundary.
      wx: (3, 3, C, 3C) input-conv kernel [gates-x (2C) | cand-x (C)]
          (nn/blocks.ConvGRUCell `Conv_x`, bias-free).
      wh: (3, 3, C, 2C) gates h-conv kernel;  bh: (2C,) its bias.
      wc: (3, 3, C, C) candidate h-conv kernel;  bc: (C,) its bias.
      gn: (6, C) GroupNorm params, rows = [r_scale, r_bias, u_scale, u_bias,
          y_scale, y_bias].
    Returns (D, H, W, C): the GRU output/state for every plane (zero-init
    state; identical math to scanning nn/blocks.ConvGRUCell over D with
    x_contrib inputs).

    Differentiable: the backward recomputes each plane's internals from the
    saved state sequence (the forward's own output) and applies the exact
    adjoint — in a reverse-grid Pallas kernel when it fits VMEM (dense or
    slab-streamed), else a reverse `lax.scan` of the local VJP.  (NHWC
    wrapper over `red_recur_packed`, which owns the custom VJP; the pack /
    unpack transposes differentiate as plain XLA ops.)
    """
    d, height, width, cin = x.shape
    out = red_recur_packed(_pack(x), wx, wh, bh, wc, bc, gn, height, width,
                           interpret)
    return _unpack(out, height, width)


def red_recur_from(h0: jnp.ndarray, x: jnp.ndarray, wx, wh, bh, wc, bc, gn,
                   interpret: bool = False) -> jnp.ndarray:
    """`red_recur` starting from carried state h0 (H, W, C) — the
    slab-streaming inference form (ref slice_RED_Regularization semantics,
    module.py:653-693, but a whole depth SLAB per kernel call with the
    state handed between calls).  Chaining contract (test-gated):
    red_recur_from(red_recur(x[:k])[-1], x[k:]) == red_recur(x)[k:].
    Inference-only: no custom VJP."""
    d, height, width, cin = x.shape
    out = _red_recur_impl(_pack(x), wx, wh, bh, wc, bc, gn, height, width,
                          interpret, h0_packed=_pack(h0[None])[0])
    return _unpack(out, height, width)


def red_recur_from_packed(h0, x, wx, wh, bh, wc, bc, gn, height, width,
                          interpret: bool = False) -> jnp.ndarray:
    """Row-packed `red_recur_from`: h0 (P, C, R·W), x (D, P, Cin, R·W)."""
    return _red_recur_impl(x, wx, wh, bh, wc, bc, gn, height, width,
                           interpret, h0_packed=h0)


def red_recur_from_packed_batched(h0, x, wx, wh, bh, wc, bc, gn, height,
                                  width, interpret: bool = False):
    """Batched row-packed seeded recurrence: h0 (B, P, C, R·W) (or None for
    zero states), x (B, D, P, Cin, R·W) → (B, D, P, C, R·W), all B
    independent recurrences in ONE pallas_call (grid=(B, D); the kernel
    reseeds its resident state from batch b's h0 block at each d == 0).
    Inference-only — no VJP; training differentiates the unbatched
    `red_recur_packed` per element."""
    return _red_recur_impl_batched(x, wx, wh, bh, wc, bc, gn, height, width,
                                   interpret, h0_packed=h0)


def _red_recur_fwd(x, wx, wh, bh, wc, bc, gn, height, width, interpret):
    outs = _red_recur_impl(x, wx, wh, bh, wc, bc, gn, height, width, interpret)
    return outs, (x, outs, wx, wh, bh, wc, bc, gn)


_BWD_VMEM_CAP = 100 * 1024 * 1024
_STREAM_VMEM_CAP = 112 * 1024 * 1024


def _red_recur_bwd(height, width, interpret, res, g):
    x, outs, wx, wh, bh, wc, bc, gn = res
    d, p_cnt, cin, _ = x.shape
    c = wx.shape[-1] // 3
    if _bwd_vmem_bytes(d, height, width, c, cin) <= _BWD_VMEM_CAP:
        return _red_recur_bwd_pallas(x, outs, wx, wh, bh, wc, bc, gn, g,
                                     height, width, interpret)
    if (height % _pack_rows(height, width) == 0
            and _stream_vmem_bytes(d, height, width, c, cin) <= _STREAM_VMEM_CAP):
        # plane too large for the dense adjoint but fits the slab-streamed
        # one (x/dx stay in HBM) — covers the stage-3 production scales
        return _red_recur_bwd_pallas_stream(
            x, outs, wx, wh, bh, wc, bc, gn, g, height, width, interpret
        )

    # fallback (plane too large even for the streamed adjoint): reverse scan
    # recomputing each step in XLA (NHWC)
    params = (wx, wh, bh, wc, bc, gn)
    x_n = _unpack(x, height, width)
    outs_n = _unpack(outs, height, width)
    g_n = _unpack(g, height, width)
    h_prev = jnp.concatenate([jnp.zeros_like(outs_n[:1]), outs_n[:-1]], axis=0)

    def step(carry, inp):
        dh, dps = carry
        hp, x_d, g_d = inp
        _, vjp = jax.vjp(_cell_step, hp, x_d, *params)
        dhp, dx_d, *dp = vjp(dh + g_d)
        dps = jax.tree.map(jnp.add, dps, tuple(dp))
        return (dhp, dps), dx_d

    zero = (jnp.zeros_like(outs_n[0]), jax.tree.map(jnp.zeros_like, params))
    (_, dps), dx = jax.lax.scan(step, zero, (h_prev, x_n, g_n), reverse=True)
    return (_pack(dx), *dps)


red_recur_packed.defvjp(_red_recur_fwd, _red_recur_bwd)


def cell_params_matrices(cell_params: dict) -> tuple:
    """ConvGRUCell param subtree → red_recur's (wx, wh, bh, wc, bc, gn) args."""
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
        cell_params["Conv_x"]["kernel"],
        cell_params["Conv_h"]["kernel"],
        cell_params["Conv_h"]["bias"],
        cell_params["Conv_c"]["kernel"],
        cell_params["Conv_c"]["bias"],
        gn,
    )
