#!/usr/bin/env python
"""Prototype + microbench: flat-pad im2col staging for the red_recur forward.

The shipped kernels stage conv inputs row-by-row into (H+2, C, W+2) pads and
assemble im2col patches from 9*r single-row slabs — VPU-copy bound (NOTES).
This prototype keeps every conv operand in a FLAT (C, (H+2)*W) buffer:

  * staging is one aligned (C, r*W) lane-slice copy per row-PACK;
  * an im2col tap (dy, dx) of a whole pack is ONE aligned dynamic slice
    [(p*r+dy)*W, r*W) (+1-row offset baked in), column-shifted by a STATIC
    pltpu.roll (dx-1) and border-masked (the roll wrap lands exactly on the
    zero border) — 9 slice+roll+mask ops per pack instead of 9*r row copies.

Run on TPU: compares numerics + isolated kernel time vs the shipped
red_recur at production RED scale geometries.
"""

import sys, os
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from satmvs_tpu import cache as _cache
_cache.enable()
import bench
from satmvs_tpu.ops.pallas.red_recur import (
    _pack_rows, _pack_nhwc, red_recur, cell_params_matrices,
)

_EPS = 1e-5


def _flat_kernel(x_ref, wx_ref, wg_ref, bg_ref, wc_ref, bc_ref, gn_ref,
                 h0_ref, out_ref,
                 hf_ref, mf_ref, xf_ref, g_ref, xc_ref, rhs_ref, msk_ref,
                 *, c, cin, height, width, r):
    d = pl.program_id(0)
    p_cnt = height // r
    aligned = width % 128 == 0

    def ploop(body):
        if aligned:
            jax.lax.fori_loop(0, p_cnt, body, 0)
        else:  # unaligned W: static offsets only (Mosaic dynamic-offset rule)
            for p in range(p_cnt):
                body(p, 0)

    def ploop_acc(body, init):
        if aligned:
            return jax.lax.fori_loop(0, p_cnt, body, init)
        acc = init
        for p in range(p_cnt):
            acc = body(p, acc)
        return acc
    rw = r * width
    inv_n = 1.0 / (height * width * c)
    zero = jnp.float32(0)

    @pl.when(d == 0)
    def _():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        mf_ref[...] = jnp.zeros_like(mf_ref)
        xf_ref[...] = jnp.zeros_like(xf_ref)
        # border masks: row 0 zeroes x==0 (dx=0 tap), row 1 zeroes x==W-1
        # float-arith masks (Mosaic can't lower bool i1 vectors):
        # row 0 zeroes x==0, row 1 zeroes x==width-1
        pos = (jax.lax.broadcasted_iota(jnp.int32, (2, rw), 1) % width
               ).astype(jnp.float32)
        m0 = jnp.minimum(pos[0:1], 1.0)
        m2 = jnp.minimum(jnp.float32(width - 1) - pos[1:2], 1.0)
        msk_ref[0:1] = m0
        msk_ref[1:2] = m2

        def h0_body(p, _):
            hf_ref[:, pl.ds((p * r + 1) * width, rw)] = h0_ref[p]
            return 0

        ploop(h0_body)

    def hslice(p):
        return hf_ref[:, pl.ds((p * r + 1) * width, rw)]

    def build_rhs(flat_ref, p, ch):
        for dy in range(3):
            base = flat_ref[:, pl.ds((p * r + dy) * width, rw)]
            left = pltpu.roll(base, 1, 1) * msk_ref[0:1]
            right = pltpu.roll(base, rw - 1, 1) * msk_ref[1:2]
            t = dy * 3
            rhs_ref[t * ch : (t + 1) * ch] = left
            rhs_ref[(t + 1) * ch : (t + 2) * ch] = base
            rhs_ref[(t + 2) * ch : (t + 3) * ch] = right

    # stage x (one aligned copy per pack)
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

    def gates_body(p, _):
        build_rhs(hf_ref, p, c)
        g = jnp.dot(wg_ref[...], rhs_ref[: 9 * c],
                    preferred_element_type=jnp.float32)
        g_ref[p] = g + xc_ref[p, : 2 * c, :] + bg_ref[...]
        return 0

    ploop(gates_body)

    def gate_sums(p, acc):
        g = g_ref[p]
        return acc[0] + jnp.sum(g[:c]), acc[1] + jnp.sum(g[c:])

    sr, su = ploop_acc(gate_sums, (zero, zero))
    mu_r, mu_u = sr * inv_n, su * inv_n

    def gate_vars(p, acc):
        g = g_ref[p]
        dr = g[:c] - mu_r
        du = g[c:] - mu_u
        return acc[0] + jnp.sum(dr * dr), acc[1] + jnp.sum(du * du)

    vr, vu = ploop_acc(gate_vars, (zero, zero))
    inv_r = jax.lax.rsqrt(vr * inv_n + _EPS)
    inv_u = jax.lax.rsqrt(vu * inv_n + _EPS)

    def gn_vec(k):
        return gn_ref[k].reshape(c, 1)

    def m_body(p, _):
        raw = g_ref[p, :c, :]
        rgate = jax.nn.sigmoid((raw - mu_r) * inv_r * gn_vec(0) + gn_vec(1))
        mf_ref[:, pl.ds((p * r + 1) * width, rw)] = rgate * hslice(p)
        return 0

    ploop(m_body)

    def cand_body(p, acc):
        build_rhs(mf_ref, p, c)
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

    def blend_body(p, _):
        g = g_ref[p]
        y = jnp.tanh((g[:c] - mu_y) * inv_y * gn_vec(4) + gn_vec(5))
        u = jax.nn.sigmoid((g[c:] - mu_u) * inv_u * gn_vec(2) + gn_vec(3))
        hn = u * hslice(p) + (1.0 - u) * y
        hf_ref[:, pl.ds((p * r + 1) * width, rw)] = hn
        out_ref[0, p] = hn
        return 0

    ploop(blend_body)


def flat_red_recur(x, wx, wh, bh, wc, bc, gn):
    d, height, width, cin = x.shape
    c = wx.shape[-1] // 3
    r = _pack_rows(height, width)
    p_cnt = height // r
    x_p = _pack_nhwc(x, cin, p_cnt, r, width)
    h0 = jnp.zeros((p_cnt, c, r * width), jnp.float32)
    wx_mat = wx.reshape(9 * cin, 3 * c).T
    wg_mat = wh.reshape(9 * c, 2 * c).T
    wc_mat = wc.reshape(9 * c, c).T
    kernel = functools.partial(_flat_kernel, c=c, cin=cin, height=height,
                               width=width, r=r)
    out = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec((1, p_cnt, cin, r * width), lambda di: (di, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((1, p_cnt, c, r * width),
                               lambda di: (di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, p_cnt, c, r * width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, (height + 2) * width), jnp.float32),    # h flat
            pltpu.VMEM((c, (height + 2) * width), jnp.float32),    # m flat
            pltpu.VMEM((cin, (height + 2) * width), jnp.float32),  # x flat
            pltpu.VMEM((p_cnt, 2 * c, r * width), jnp.float32),    # gates
            pltpu.VMEM((p_cnt, 3 * c, r * width), jnp.float32),    # xc
            pltpu.VMEM((9 * max(c, cin), r * width), jnp.float32),  # im2col
            pltpu.VMEM((2, r * width), jnp.float32),               # masks
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(x_p, wx_mat, wg_mat, bh.reshape(2 * c, 1), wc_mat,
      bc.reshape(c, 1), gn, h0)
    return (out.reshape(d, p_cnt, c, r, width)
            .transpose(0, 1, 3, 4, 2).reshape(d, height, width, c))


def run_case(dd, h, w, cin, c, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(dd, h, w, cin)).astype(np.float32))
    wx = jnp.asarray(rng.normal(size=(3, 3, cin, 3 * c)).astype(np.float32)) * 0.15
    wh = jnp.asarray(rng.normal(size=(3, 3, c, 2 * c)).astype(np.float32)) * 0.15
    bh = jnp.asarray(rng.normal(size=(2 * c,)).astype(np.float32)) * 0.1
    wc = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)) * 0.15
    bc = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1
    gn = jnp.asarray(rng.normal(size=(6, c)).astype(np.float32)) * 0.3 + 1.0
    args = (x, wx, wh, bh, wc, bc, gn)

    ref = jax.jit(red_recur)(*args)
    got = jax.jit(flat_red_recur)(*args)
    err = float(jnp.max(jnp.abs(got - ref)))
    t_old = bench._time_fn(
        lambda cc: red_recur(x + cc * 0, wx, wh, bh, wc, bc, gn).ravel()[0],
        iters=10)
    t_new = bench._time_fn(
        lambda cc: flat_red_recur(x + cc * 0, wx, wh, bh, wc, bc, gn).ravel()[0],
        iters=10)
    print(f"D={dd} {h}x{w} cin={cin} c={c} r={_pack_rows(h,w)}: err={err:.2e} "
          f"old={t_old*1e3:6.2f} ms new={t_new*1e3:6.2f} ms "
          f"({t_old/t_new:4.2f}x)")


if __name__ == "__main__":
    # stage-3 production scales (finest first), then stage-1 coarse scales
    run_case(8, 384, 768, 8, 8)     # stage3 scale1 (r=2)
    run_case(8, 192, 384, 16, 16)   # stage3 scale2 (r=4)
    run_case(64, 96, 192, 32, 8)    # stage1 scale1 (r=8)
    run_case(64, 48, 96, 16, 16)    # stage1 scale2 (r=16)
