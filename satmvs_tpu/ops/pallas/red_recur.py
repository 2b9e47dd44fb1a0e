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


def _red_recur_bwd(interpret, res, g):
    xc, outs, wh, bh, wc, bc, gn = res
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
