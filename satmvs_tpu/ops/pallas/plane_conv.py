"""Plane-batched conv/deconv Pallas kernels in the W-in-lanes row-packed
layout — the RED encoder/decoder without NHWC.

The RED regularizer's per-plane encoder (3x stride-2 ConvBlock) and decoder
(3x stride-2 DeconvBlock + 3x3 head) are plane-independent and were hoisted
out of the depth scan as batched XLA NHWC convs (nn/red.py; reference modules
at /root/reference/modules/module.py:595-649).  At C=8..64 an NHWC conv puts
the channels into the 128-wide lane dimension (6-50% lane utilization,
measured ~77 ms of a 215 ms train step), and the NHWC <-> row-packed
transposes around the fused recurrence kernels cost another ~15 ms.  Here
every conv runs in the dense row-packed layout the recurrence kernels
(red_recur.py) already use:

    activations: (D, P, C, R*W) with H = P*R, W (or R*W) in lanes, C in
    sublanes -- fully dense for any C.

so the whole regularizer (encode -> 4x ConvGRU recurrence -> decode) is a
row-packed pipeline; NHWC appears only at the cost-volume input and the
1-channel logits output (single pack transposes).

Column-parity design (the TPU constraint that shaped this file): Mosaic
cannot lane-shuffle — strided lane slices/stores and lane-splitting reshapes
all fail to compile ("infer-vector-layout: unsupported shape cast"), so a
kernel can never de-interleave or interleave image columns.  Stride-2 ops
therefore move all column-parity handling to the XLA boundary, where a
strided slice / stack-reshape is an ordinary fused copy:

  * `conv_dn` (stride-2 3x3 + ReLU) CONSUMES the even/odd column halves
    (`split_cols`) — staged into a split pad pair, all 9 taps become
    contiguous lane slices (dx=0 -> odd cols at offset 0; dx=1 -> even at
    +1; dx=2 -> odd at +1);
  * `deconv_up` (stride-2 3x3 transposed + ReLU) PRODUCES the even/odd
    column halves of its 2x output via per-row-parity phase matmuls over a
    natural input pad (out[2i,2j]=K[1,1]x[i,j] etc.), which the caller
    re-interleaves with `merge_cols` where a natural layout is needed;
  * the backward of each is exactly the other: conv_dn's input cotangent is
    a phase deconv (split outputs = the split primal inputs' cotangents);
    deconv_up's input cotangent is a stride-2 conv over the split upstream
    cotangent.  No shuffle ever happens inside a kernel.

Conv mechanics (shared with red_recur): zero-bordered pad buffers, im2col
patches from shifted (C, W) row slabs, one (Cout, K) @ (K, N) MXU matmul per
row-pack; weight cotangents accumulate in VMEM-resident constant output
blocks across the plane grid.  `conv_head` (stride-1, the 1-channel logit
head) needs no parity handling at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .red_recur import _flipT, _pack_nhwc, _pack_rows

_VMEM_LIMIT = 127 * 1024 * 1024


def _interp(flag: bool) -> bool:
    """Auto-interpret off-TPU: the fused RED pipeline is TPU-gated in
    production (models/cascade.py), and interpret mode lets CPU tests
    exercise the real code path (incl. the custom-VJP backward, which runs
    outside any force_tpu_interpret_mode context)."""
    return flag or jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# feasibility estimates (consumed by nn/red.packed_pipeline_feasible)
# --------------------------------------------------------------------------

def conv_dn_vmem_bytes(h, w, cin, cout, train):
    """Rough VMEM footprint of conv_dn fwd (and bwd when `train`)."""
    h2, w2 = h // 2, w // 2
    r_in, r_out = _dn_geom(h, w)
    fwd = (2 * (h + 2) * cin * (w2 + 2) + 9 * cin * r_out * w2
           + 2 * 2 * cin * h * w2 + 2 * cout * h2 * w2)
    if not train:
        return 4 * fwd
    bwd = (2 * (h + 2) * cin * (w2 + 2) + (h2 + 2) * cout * (w2 + 2)
           + max(9 * cin, 4 * cout) * max(r_out * w2, (r_in // 2) * w2)
           + 2 * (2 * cin * h * w2 + 2 * cout * h2 * w2)   # xe/xo/y/g in
           + 2 * 2 * cin * h * w2)                          # dxe/dxo out
    return 4 * max(fwd, bwd)


def deconv_up_vmem_bytes(h, w, cin, cout, train):
    """Rough VMEM footprint of deconv_up fwd (and bwd when `train`)."""
    r_in, r_out = _up_geom(h, w)
    fwd = ((h + 2) * cin * (w + 2) + 4 * cin * (r_out // 2) * w
           + 2 * cin * h * w + 2 * 2 * cout * 2 * h * w)
    if not train:
        return 4 * fwd
    bwd = (2 * (2 * h + 2) * cout * (w + 2) + 9 * cout * r_in * w
           + 2 * (cin * h * w + 4 * cout * 2 * h * w)       # x + ye/yo/ge/go
           + 2 * cin * h * w)                                # dx out
    return 4 * max(fwd, bwd)


def conv_head_vmem_bytes(h, w, cin, cout, train):
    """Rough VMEM footprint of conv_head fwd (and bwd when `train`)."""
    r = _pack_rows(h, w)
    fwd = ((h + 2) * cin * (w + 2) + 9 * cin * r * w
           + 2 * (cin + cout) * h * w)
    if not train:
        return 4 * fwd
    bwd = ((h + 2) * (cin + cout) * (w + 2) + 9 * max(cin, cout) * r * w
           + 2 * (cin + cout) * h * w + 2 * cin * h * w)
    return 4 * max(fwd, bwd)


def phase_pack_ok(h, w) -> bool:
    """True iff the (h, w) geometry admits the phase-matmul deconv:
    `_phase_deconv` emits rows in (even, odd) pairs per output pack, so the
    output row-pack must be even.  deconv_up's outputs land at (h, w) when
    called from (h/2, w/2); conv_dn's BACKWARD phase-deconvs into its input
    geometry (h, w).  Wide tiles (e.g. W=2048 ⇒ r=1) fail this — callers
    must fall back to the XLA scan path (nn/red.packed_pipeline_feasible)."""
    return _pack_rows(h, w) % 2 == 0


# --------------------------------------------------------------------------
# host-side packing / column-parity helpers (the XLA boundary)
# --------------------------------------------------------------------------

def pack_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(D, H, W, C) NHWC -> row-packed (D, P, C, R*W)."""
    d, h, w, c = x.shape
    r = _pack_rows(h, w)
    return _pack_nhwc(x, c, h // r, r, w)


def pack_planes_hcw(x: jnp.ndarray) -> jnp.ndarray:
    """(D, H, C, W) — the sweep kernels' native layout — -> row-packed
    (D, P, C, R*W).  Only the small R (2-16 rows) and C (8-64) axes swap,
    instead of the W<->C transpose `pack_planes` pays from NHWC."""
    d, h, c, w = x.shape
    r = _pack_rows(h, w)
    return (
        x.reshape(d, h // r, r, c, w)
        .transpose(0, 1, 3, 2, 4)
        .reshape(d, h // r, c, r * w)
    )


def unpack_planes(xp: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """row-packed (D, P, C, R*W) -> (D, H, W, C) NHWC."""
    d, p, c, rw = xp.shape
    r = h // p
    return xp.reshape(d, p, c, r, w).transpose(0, 1, 3, 4, 2).reshape(d, h, w, c)


def split_cols(xp: jnp.ndarray):
    """Row-packed (..., R*W) -> even/odd column halves (..., R*W/2) each.
    Lane s*w + x has the parity of x (w is even), so a flat stride-2 slice
    is exactly the per-row-segment column de-interleave."""
    return xp[..., 0::2], xp[..., 1::2]


def merge_cols(xe: jnp.ndarray, xo: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `split_cols`."""
    return jnp.stack([xe, xo], axis=-1).reshape(
        *xe.shape[:-1], 2 * xe.shape[-1]
    )


# --------------------------------------------------------------------------
# in-kernel helpers (plain functions traced inside kernels)
# --------------------------------------------------------------------------

def _stage_pad(pad_ref, get_pack, p_cnt, r, width):
    """Stage row-packed planes into a zero-bordered pad:
    pad[y+1, :, x+1] = in[y, x].  `get_pack(p)` -> (c, r*width)."""

    def body(p, _):
        buf = get_pack(p)
        c = buf.shape[0]
        for s in range(r):
            pad_ref[pl.ds(p * r + s + 1, 1), :, 1 : width + 1] = (
                buf[:, s * width : (s + 1) * width].reshape(1, c, width)
            )
        return 0

    jax.lax.fori_loop(0, p_cnt, body, 0)


def _build_rhs(rhs_ref, pad_ref, p, ch, r, width):
    """Stride-1 im2col patch of pad rows [p*r, p*r+r): (9*ch, r*width)."""
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            for s in range(r):
                slab = pad_ref[pl.ds(p * r + s + dy, 1), :, dx : dx + width]
                rhs_ref[t * ch : (t + 1) * ch, s * width : (s + 1) * width] = (
                    slab.reshape(ch, width)
                )


def _build_rhs_s2(rhs_ref, pe_ref, po_ref, p2, ch, r2, w2):
    """Stride-2 im2col patch from the column-split pads: (9*ch, r2*w2).
    Tap t=(dy,dx) reads in[2y+dy-1, 2x+dx-1]: dx=0 -> odd cols at offset 0;
    dx=1 -> even at +1; dx=2 -> odd at +1."""
    for dy in range(3):
        for s in range(r2):
            base = 2 * (p2 * r2 + s) + dy  # input pad row index
            for dx, (pad, off) in enumerate(
                ((po_ref, 0), (pe_ref, 1), (po_ref, 1))
            ):
                t = dy * 3 + dx
                slab = pad[pl.ds(base, 1), :, off : off + w2]
                rhs_ref[t * ch : (t + 1) * ch, s * w2 : (s + 1) * w2] = (
                    slab.reshape(ch, w2)
                )


def _phase_mats(k: jnp.ndarray):
    """Phase matrices of the 2x zero-insert transposed conv out =
    conv3x3_s1(zero_insert(in), K), K (3, 3, zc, oc):

        ye[2i,   j] = K[1,1]'in[i,j]
        yo[2i,   j] = K[1,0]'in[i,j] + K[1,2]'in[i,j+1]
        ye[2i+1, j] = K[0,1]'in[i,j] + K[2,1]'in[i+1,j]
        yo[2i+1, j] = K[0,0]'in[i,j] + K[0,2]'in[i,j+1]
                    + K[2,0]'in[i+1,j] + K[2,2]'in[i+1,j+1]

    Returns (M_even (2oc, 2zc), M_odd (2oc, 4zc)); rows stack [ye | yo],
    K-columns are the taps [in[i,j], in[i,j+1], in[i+1,j], in[i+1,j+1]]
    (first two only for M_even)."""
    zc, oc = k.shape[2], k.shape[3]
    zero = jnp.zeros((oc, zc), k.dtype)
    t = lambda a, b: k[a, b].T  # (oc, zc)
    m_even = jnp.block([[t(1, 1), zero], [t(1, 0), t(1, 2)]])
    m_odd = jnp.block([
        [t(0, 1), zero, t(2, 1), zero],
        [t(0, 0), t(0, 2), t(2, 0), t(2, 2)],
    ])
    return m_even, m_odd


def _phase_deconv(pad_ref, rhs_ref, me_ref, mo_ref, write_row,
                  *, zc, oc, h, w, r_out, relu):
    """Compute the 2x transposed conv from a natural input pad via phase
    matmuls, emitting split column halves row by row.

    pad: (h+2, zc, w+2) the staged natural input.  For each output row pack
    p (of the (2h, 2w) parent geometry, r_out rows/pack) and row parity q,
    one (2oc, K_q) @ (K_q, (r_out/2)*w) matmul yields the even|odd column
    halves of all parity-q rows; `write_row(p, s, ye_row, yo_row)` stores
    them.  Requires r_out even (parity of row s in any pack is s%2)."""
    assert r_out % 2 == 0, "phase deconv needs an even output row-pack"
    p_out = (2 * h) // r_out
    half = r_out // 2

    def body(p, _):
        for q in (0, 1):
            ch_taps = 2 if q == 0 else 4
            for idx in range(half):
                s = 2 * idx + q
                # output row Y = p*r_out + s; input row i = Y//2
                # (r_out even => i = p*(r_out//2) + s//2)
                i = p * half + (s // 2)
                taps = [
                    pad_ref[pl.ds(i + 1, 1), :, 1 : w + 1],
                    pad_ref[pl.ds(i + 1, 1), :, 2 : w + 2],
                ]
                if q == 1:
                    taps += [
                        pad_ref[pl.ds(i + 2, 1), :, 1 : w + 1],
                        pad_ref[pl.ds(i + 2, 1), :, 2 : w + 2],
                    ]
                for ti, slab in enumerate(taps):
                    rhs_ref[ti * zc : (ti + 1) * zc, idx * w : (idx + 1) * w] = (
                        slab.reshape(zc, w)
                    )
            m = me_ref if q == 0 else mo_ref
            res = jnp.dot(m[...], rhs_ref[: ch_taps * zc, : half * w],
                          preferred_element_type=jnp.float32)
            if relu:
                res = jnp.maximum(res, 0.0)
            for idx in range(half):
                s = 2 * idx + q
                seg = res[:, idx * w : (idx + 1) * w]
                write_row(p, s, seg[:oc], seg[oc:])
        return 0

    jax.lax.fori_loop(0, p_out, body, 0)


# --------------------------------------------------------------------------
# conv_dn: y = relu(conv3x3 stride-2(x, w)), bias-free (ConvBlock norm="none")
# --------------------------------------------------------------------------

def _conv_dn_kernel(xe_ref, xo_ref, m_ref, out_ref, pe_ref, po_ref, rhs_ref,
                    *, cin, cout, h, w, r_in, r_out, relu):
    p_in, p_out = h // r_in, (h // 2) // r_out
    w2 = w // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        pe_ref[...] = jnp.zeros_like(pe_ref)
        po_ref[...] = jnp.zeros_like(po_ref)

    _stage_pad(pe_ref, lambda p: xe_ref[0, p], p_in, r_in, w2)
    _stage_pad(po_ref, lambda p: xo_ref[0, p], p_in, r_in, w2)

    def body(p2, _):
        _build_rhs_s2(rhs_ref, pe_ref, po_ref, p2, cin, r_out, w2)
        y = jnp.dot(m_ref[...], rhs_ref[...],
                    preferred_element_type=jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, p2] = y
        return 0

    jax.lax.fori_loop(0, p_out, body, 0)


def _conv_dn_bwd_kernel(xe_ref, xo_ref, y_ref, g_ref, me_ref, mo_ref,
                        dxe_ref, dxo_ref, dm_ref,
                        pe_ref, po_ref, dzpad_ref, rhs_ref,
                        *, cin, cout, h, w, r_in, r_out, relu):
    p_in, p_out = h // r_in, (h // 2) // r_out
    w2 = w // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        pe_ref[...] = jnp.zeros_like(pe_ref)
        po_ref[...] = jnp.zeros_like(po_ref)
        dzpad_ref[...] = jnp.zeros_like(dzpad_ref)
        dm_ref[...] = jnp.zeros_like(dm_ref)

    _stage_pad(pe_ref, lambda p: xe_ref[0, p], p_in, r_in, w2)
    _stage_pad(po_ref, lambda p: xo_ref[0, p], p_in, r_in, w2)

    # dz = g * relu'(y); dM accumulation; dz staged into a natural pad
    def out_body(p2, _):
        dz = g_ref[0, p2]
        if relu:
            dz = jnp.where(y_ref[0, p2] > 0.0, dz, 0.0)
        _build_rhs_s2(rhs_ref, pe_ref, po_ref, p2, cin, r_out, w2)
        dm_ref[...] = dm_ref[...] + jax.lax.dot_general(
            dz, rhs_ref[: 9 * cin, : r_out * w2], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for s in range(r_out):
            dzpad_ref[pl.ds(p2 * r_out + s + 1, 1), :, 1 : w2 + 1] = (
                dz[:, s * w2 : (s + 1) * w2].reshape(1, cout, w2)
            )
        return 0

    jax.lax.fori_loop(0, p_out, out_body, 0)

    # dx = phase deconv of dz with the flipped channel-transposed kernel;
    # split outputs == the split primal inputs' cotangents
    def write_row(p, s, e_row, o_row):
        dxe_ref[0, p, :, pl.ds(s * w2, w2)] = e_row
        dxo_ref[0, p, :, pl.ds(s * w2, w2)] = o_row

    _phase_deconv(dzpad_ref, rhs_ref, me_ref, mo_ref, write_row,
                  zc=cout, oc=cin, h=h // 2, w=w2, r_out=r_in, relu=False)


def _dn_geom(h, w):
    return _pack_rows(h, w), _pack_rows(h // 2, w // 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def conv_dn(xe: jnp.ndarray, xo: jnp.ndarray, w_hwio: jnp.ndarray,
            h: int, w: int, relu: bool = True,
            interpret: bool = False) -> jnp.ndarray:
    """Row-packed stride-2 3x3 conv (+ReLU) from column-split input halves
    (`split_cols` of the natural (D, P, Cin, R*W) array at (h, w)) to the
    natural (D, P2, Cout, R2*(w/2)) output at (h/2, w/2).
    w_hwio: (3, 3, Cin, Cout).  Matches flax nn.Conv(strides=2, padding=1)
    + relu — the RED encoder's ConvBlock(norm="none", use_bias=False)
    (nn/red.py, ref module.py:598-608)."""
    return _conv_dn_impl(xe, xo, w_hwio, h, w, relu, interpret)


def _conv_dn_impl(xe, xo, w_hwio, h, w, relu, interpret):
    d = xe.shape[0]
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    r_in, r_out = _dn_geom(h, w)
    h2, w2 = h // 2, w // 2
    m = w_hwio.reshape(9 * cin, cout).T
    kernel = functools.partial(
        _conv_dn_kernel, cin=cin, cout=cout, h=h, w=w,
        r_in=r_in, r_out=r_out, relu=relu,
    )
    half_blk = pl.BlockSpec((1, h // r_in, cin, r_in * w2),
                            lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            half_blk, half_blk,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h2 // r_out, cout, r_out * w2),
                               lambda di: (di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h2 // r_out, cout, r_out * w2),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2, cin, w2 + 2), jnp.float32),   # even cols
            pltpu.VMEM((h + 2, cin, w2 + 2), jnp.float32),   # odd cols
            pltpu.VMEM((9 * cin, r_out * w2), jnp.float32),  # im2col
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interp(interpret),
    )(xe, xo, m)


def _conv_dn_fwd(xe, xo, w_hwio, h, w, relu, interpret):
    y = _conv_dn_impl(xe, xo, w_hwio, h, w, relu, interpret)
    return y, (xe, xo, y, w_hwio)


def _conv_dn_bwd(h, w, relu, interpret, res, g):
    xe, xo, y, w_hwio = res
    d = xe.shape[0]
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    r_in, r_out = _dn_geom(h, w)
    h2, w2 = h // 2, w // 2
    # dx = phase deconv of dz with F[a,b,co,ci] = w[2-a, 2-b, ci, co]
    f = jnp.flip(w_hwio, (0, 1)).transpose(0, 1, 3, 2)
    me, mo = _phase_mats(f)
    kernel = functools.partial(
        _conv_dn_bwd_kernel, cin=cin, cout=cout, h=h, w=w,
        r_in=r_in, r_out=r_out, relu=relu,
    )
    half_blk = pl.BlockSpec((1, h // r_in, cin, r_in * w2),
                            lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, h2 // r_out, cout, r_out * w2),
                           lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dxe, dxo, dm = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[half_blk, half_blk, out_blk, out_blk, full, full],
        out_specs=[
            half_blk, half_blk,
            pl.BlockSpec((cout, 9 * cin), lambda di: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h // r_in, cin, r_in * w2), jnp.float32),
            jax.ShapeDtypeStruct((d, h // r_in, cin, r_in * w2), jnp.float32),
            jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, cin, w2 + 2), jnp.float32),
            pltpu.VMEM((h + 2, cin, w2 + 2), jnp.float32),
            pltpu.VMEM((h2 + 2, cout, w2 + 2), jnp.float32),  # dz natural
            pltpu.VMEM((max(9 * cin, 4 * cout),
                        max(r_out * w2, (r_in // 2) * w2)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interp(interpret),
    )(xe, xo, y, g, me, mo)
    dw = dm.T.reshape(3, 3, cin, cout)
    return dxe, dxo, dw


conv_dn.defvjp(_conv_dn_fwd, _conv_dn_bwd)


# --------------------------------------------------------------------------
# deconv_up: y = relu(convT3x3 stride-2(x, wt)), bias-free (DeconvBlock)
# --------------------------------------------------------------------------

def _deconv_up_kernel(x_ref, me_ref, mo_ref, ye_ref, yo_ref, pad_ref, rhs_ref,
                      *, cin, cout, h, w, r_in, r_out, relu):
    p_in = h // r_in

    @pl.when(pl.program_id(0) == 0)
    def _():
        pad_ref[...] = jnp.zeros_like(pad_ref)

    _stage_pad(pad_ref, lambda p: x_ref[0, p], p_in, r_in, w)

    def write_row(p, s, e_row, o_row):
        ye_ref[0, p, :, pl.ds(s * w, w)] = e_row
        yo_ref[0, p, :, pl.ds(s * w, w)] = o_row

    _phase_deconv(pad_ref, rhs_ref, me_ref, mo_ref, write_row,
                  zc=cin, oc=cout, h=h, w=w, r_out=r_out, relu=relu)


def _deconv_up_bwd_kernel(x_ref, ye_ref, yo_ref, ge_ref, go_ref, mdx_ref,
                          dx_ref, dm_ref, pe_ref, po_ref, rhs_ref,
                          *, cin, cout, h, w, r_in, r_out, relu):
    p_in, p_out = h // r_in, (2 * h) // r_out

    @pl.when(pl.program_id(0) == 0)
    def _():
        pe_ref[...] = jnp.zeros_like(pe_ref)
        po_ref[...] = jnp.zeros_like(po_ref)
        dm_ref[...] = jnp.zeros_like(dm_ref)

    # dz = g * relu'(y), already column-split — stage each half directly
    def stage_dz(p, _):
        dze = ge_ref[0, p]
        dzo = go_ref[0, p]
        if relu:
            dze = jnp.where(ye_ref[0, p] > 0.0, dze, 0.0)
            dzo = jnp.where(yo_ref[0, p] > 0.0, dzo, 0.0)
        for s in range(r_out):
            pe_ref[pl.ds(p * r_out + s + 1, 1), :, 1 : w + 1] = (
                dze[:, s * w : (s + 1) * w].reshape(1, cout, w)
            )
            po_ref[pl.ds(p * r_out + s + 1, 1), :, 1 : w + 1] = (
                dzo[:, s * w : (s + 1) * w].reshape(1, cout, w)
            )
        return 0

    jax.lax.fori_loop(0, p_out, stage_dz, 0)

    # dx[y,x] = sum_{a,b} wt[a,b,co,ci] dz[2y+a-1, 2x+b-1]  (stride-2
    # correlation over the split dz pads); dM[ci, t(2-a,2-b)*co+co'] += the
    # same taps against the x rows
    def in_body(p, _):
        _build_rhs_s2(rhs_ref, pe_ref, po_ref, p, cout, r_in, w)
        dx_ref[0, p] = jnp.dot(mdx_ref[...],
                               rhs_ref[: 9 * cout, : r_in * w],
                               preferred_element_type=jnp.float32)
        dm_ref[...] = dm_ref[...] + jax.lax.dot_general(
            x_ref[0, p], rhs_ref[: 9 * cout, : r_in * w],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, p_in, in_body, 0)


def _up_geom(h, w):
    return _pack_rows(h, w), _pack_rows(2 * h, 2 * w)


def _up_zi_kernel(wt: jnp.ndarray) -> jnp.ndarray:
    """flax ConvTranspose(transpose_kernel=True) kernel (3, 3, Cout, Cin) ->
    the stride-1 conv kernel K (3, 3, Cin, Cout) over the zero-inserted
    input: K[a, b, ci, co] = wt[2-a, 2-b, co, ci] (torch-exact
    ConvTranspose2d(k=3, s=2, p=1, op=1) semantics)."""
    return jnp.flip(wt, (0, 1)).transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def deconv_up(x: jnp.ndarray, wt: jnp.ndarray, h: int, w: int,
              relu: bool = True, interpret: bool = False):
    """Row-packed stride-2 3x3 transposed conv (+ReLU): natural input at
    (h, w) -> the (2h, 2w) output's even/odd column halves (merge with
    `merge_cols` where a natural layout is needed).  wt: (3, 3, Cout, Cin)
    — flax ConvTranspose(transpose_kernel=True) layout, torch-exact
    ConvTranspose2d(k=3, s=2, p=1, op=1) semantics (the RED decoder's
    DeconvBlock(norm="none"), nn/red.py, ref module.py:610-615)."""
    return _deconv_up_impl(x, wt, h, w, relu, interpret)


def _deconv_up_impl(x, wt, h, w, relu, interpret):
    d = x.shape[0]
    cout, cin = wt.shape[2], wt.shape[3]
    r_in, r_out = _up_geom(h, w)
    me, mo = _phase_mats(_up_zi_kernel(wt))
    kernel = functools.partial(
        _deconv_up_kernel, cin=cin, cout=cout, h=h, w=w,
        r_in=r_in, r_out=r_out, relu=relu,
    )
    out_blk = pl.BlockSpec((1, 2 * h // r_out, cout, r_out * w),
                           lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM)
    out_sh = jax.ShapeDtypeStruct((d, 2 * h // r_out, cout, r_out * w),
                                  jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec((1, h // r_in, cin, r_in * w),
                         lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out_blk, out_blk],
        out_shape=[out_sh, out_sh],
        scratch_shapes=[
            pltpu.VMEM((h + 2, cin, w + 2), jnp.float32),
            pltpu.VMEM((4 * cin, (r_out // 2) * w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interp(interpret),
    )(x, me, mo)


def _deconv_up_fwd(x, wt, h, w, relu, interpret):
    ye, yo = _deconv_up_impl(x, wt, h, w, relu, interpret)
    return (ye, yo), (x, ye, yo, wt)


def _deconv_up_bwd(h, w, relu, interpret, res, g):
    x, ye, yo, wt = res
    ge, go = g
    d = x.shape[0]
    cout, cin = wt.shape[2], wt.shape[3]
    r_in, r_out = _up_geom(h, w)
    mdx = wt.transpose(3, 0, 1, 2).reshape(cin, 9 * cout)
    kernel = functools.partial(
        _deconv_up_bwd_kernel, cin=cin, cout=cout, h=h, w=w,
        r_in=r_in, r_out=r_out, relu=relu,
    )
    in_blk = pl.BlockSpec((1, h // r_in, cin, r_in * w),
                          lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, 2 * h // r_out, cout, r_out * w),
                           lambda di: (di, 0, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx, dm = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[in_blk, out_blk, out_blk, out_blk, out_blk, full],
        out_specs=[
            in_blk,
            pl.BlockSpec((cin, 9 * cout), lambda di: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h // r_in, cin, r_in * w), jnp.float32),
            jax.ShapeDtypeStruct((cin, 9 * cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * h + 2, cout, w + 2), jnp.float32),  # dz even
            pltpu.VMEM((2 * h + 2, cout, w + 2), jnp.float32),  # dz odd
            pltpu.VMEM((9 * cout, r_in * w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interp(interpret),
    )(x, ye, yo, ge, go, mdx)
    # dM tap t' = (2-a, 2-b) of dK[a, b] lands exactly at wt's (α, β) =
    # (2-a, 2-b) — the two flips cancel; only the axis order changes
    dwt = dm.reshape(cin, 3, 3, cout).transpose(1, 2, 3, 0)
    return dx, dwt


deconv_up.defvjp(_deconv_up_fwd, _deconv_up_bwd)


# --------------------------------------------------------------------------
# conv_head: y = conv3x3 stride-1(x, w) + b  (1-channel logits, with bias)
# --------------------------------------------------------------------------

def _conv_head_kernel(x_ref, m_ref, b_ref, out_ref, pad_ref, rhs_ref,
                      *, cin, cout, h, w, r):
    p_cnt = h // r

    @pl.when(pl.program_id(0) == 0)
    def _():
        pad_ref[...] = jnp.zeros_like(pad_ref)

    _stage_pad(pad_ref, lambda p: x_ref[0, p], p_cnt, r, w)

    def body(p, _):
        _build_rhs(rhs_ref, pad_ref, p, cin, r, w)
        out_ref[0, p] = (
            jnp.dot(m_ref[...], rhs_ref[...],
                    preferred_element_type=jnp.float32)
            + b_ref[...]
        )
        return 0

    jax.lax.fori_loop(0, p_cnt, body, 0)


def _conv_head_bwd_kernel(x_ref, g_ref, mT_ref, out_ref, dm_ref, db_ref,
                          padx_ref, padg_ref, rhs_ref,
                          *, cin, cout, h, w, r):
    p_cnt = h // r

    @pl.when(pl.program_id(0) == 0)
    def _():
        padx_ref[...] = jnp.zeros_like(padx_ref)
        padg_ref[...] = jnp.zeros_like(padg_ref)
        dm_ref[...] = jnp.zeros_like(dm_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    _stage_pad(padx_ref, lambda p: x_ref[0, p], p_cnt, r, w)
    _stage_pad(padg_ref, lambda p: g_ref[0, p], p_cnt, r, w)

    def acc_body(p, _):
        dz = g_ref[0, p]
        _build_rhs(rhs_ref, padx_ref, p, cin, r, w)
        dm_ref[...] = dm_ref[...] + jax.lax.dot_general(
            dz, rhs_ref[: 9 * cin], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[...] = db_ref[...] + jnp.sum(dz, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, p_cnt, acc_body, 0)

    def in_body(p, _):
        _build_rhs(rhs_ref, padg_ref, p, cout, r, w)
        out_ref[0, p] = jnp.dot(mT_ref[...], rhs_ref[: 9 * cout],
                                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, p_cnt, in_body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_head(x: jnp.ndarray, w_hwio: jnp.ndarray, b: jnp.ndarray,
              h: int, w: int, interpret: bool = False) -> jnp.ndarray:
    """Row-packed stride-1 3x3 conv with bias, no activation — the RED logit
    head (nn/red.py `head`, ref module.py:648).  w_hwio: (3, 3, Cin, Cout),
    b: (Cout,).  Output (D, P, Cout, R*W) at the same (h, w)."""
    return _conv_head_impl(x, w_hwio, b, h, w, interpret)


def _conv_head_impl(x, w_hwio, b, h, w, interpret):
    d = x.shape[0]
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    r = _pack_rows(h, w)
    m = w_hwio.reshape(9 * cin, cout).T
    kernel = functools.partial(
        _conv_head_kernel, cin=cin, cout=cout, h=h, w=w, r=r
    )
    return pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec((1, h // r, cin, r * w), lambda di: (di, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // r, cout, r * w),
                               lambda di: (di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h // r, cout, r * w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2, cin, w + 2), jnp.float32),
            pltpu.VMEM((9 * cin, r * w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interp(interpret),
    )(x, m, b.reshape(cout, 1))


def _conv_head_fwd(x, w_hwio, b, h, w, interpret):
    y = _conv_head_impl(x, w_hwio, b, h, w, interpret)
    return y, (x, w_hwio)


def _conv_head_bwd(h, w, interpret, res, g):
    x, w_hwio = res
    d = x.shape[0]
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    r = _pack_rows(h, w)
    mT = _flipT(w_hwio)
    kernel = functools.partial(
        _conv_head_bwd_kernel, cin=cin, cout=cout, h=h, w=w, r=r
    )
    blk = lambda ch: pl.BlockSpec((1, h // r, ch, r * w),
                                  lambda di: (di, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    dx, dm, db = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            blk(cin),   # x
            blk(cout),  # g
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk(cin),
            pl.BlockSpec((cout, 9 * cin), lambda di: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda di: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h // r, cin, r * w), jnp.float32),
            jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, cin, w + 2), jnp.float32),
            pltpu.VMEM((h + 2, cout, w + 2), jnp.float32),
            pltpu.VMEM((9 * max(cin, cout), r * w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interp(interpret),
    )(x, g, mT)
    dw = dm.T.reshape(3, 3, cin, cout)
    return dx, dw, db.reshape(cout)


conv_head.defvjp(_conv_head_fwd, _conv_head_bwd)
