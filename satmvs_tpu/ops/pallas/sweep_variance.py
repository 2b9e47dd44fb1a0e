"""Fully fused plane-sweep variance cost volume — Pallas TPU kernel.

One kernel = the entire hot loop of cost-volume construction
(/root/reference/networks/casred.py:38-53): for each (depth plane, row-tile)
program, warp EVERY source view with the stencil sampler of sweep_gather.py
and accumulate the across-view variance on the fly:

    var = (ref² + Σ_s warped_s²)/V − ((ref + Σ_s warped_s)/V)²

Only the (D, H, C, W) variance volume ever touches HBM — the per-view warped
volumes (2 × 150 MB at stage-1 geometry) never materialize.  Inherits the
per-tile base-offset + aligned-DMA + residual-roll machinery and the
coverage contract (`sweep_gather.count_misses`) from sweep_gather.py.

Differentiable: the custom VJP recomputes the warped views with the gather
kernel (cheap) and routes per-view cotangents through the exact-transpose
scatter kernel — so training gets the one-kernel cost volume too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_gather import (
    BLOCK_ROWS, PAD, VPAD, _MAX_D_PER_CALL, _TileGeom, _gather_taps_dyn,
    _gather_taps_static, _round_up, dispatch_taps, tile_bases, tile_spans,
)


def _sweep_variance_kernel(
    rs_ref, cs_ref, rc_ref, vs_ref, hs_ref, x_ref, y_ref, ref_tile, srcs_hbm,
    out_ref, patch_ref, warped_ref, sems,
    *, kv: int, ks: int, height: int, width: int, channels: int, n_src: int,
    n_d: int, n_tiles: int,
):
    bh = BLOCK_ROWS
    di = pl.program_id(0)
    t = pl.program_id(1)
    tile_row0 = t * bh
    kh = bh + kv
    wpp = _round_up(width + ks + 128, 128)

    # ---- double-buffered window DMA: program p's windows were launched by
    # program p−1 from the scalar-prefetched placements (tile_bases); this
    # program launches p+1's into the other slot before computing.
    p = di * n_tiles + t
    slot = jax.lax.rem(p, 2)

    def dma_for(slot_, s, dd, tt):
        rs = rs_ref[s, dd, tt]
        cs = pl.multiple_of(cs_ref[s, dd, tt], 128)
        return pltpu.make_async_copy(
            srcs_hbm.at[s, pl.ds(rs, kh), :, pl.ds(cs, wpp)],
            patch_ref.at[slot_, s],
            sems.at[slot_, s],
        )

    @pl.when(p == 0)
    def _():
        for s in range(n_src):
            dma_for(0, s, di, t).start()

    @pl.when(p + 1 < n_d * n_tiles)
    def _():
        nd = jax.lax.div(p + 1, n_tiles)
        nt = jax.lax.rem(p + 1, n_tiles)
        for s in range(n_src):
            dma_for(1 - slot, s, nd, nt).start()

    # ---- moments, seeded with the reference view's tile
    rt = ref_tile[:]                               # (BH, C, W)
    acc_sum = rt.astype(jnp.float32)
    acc_sq = (rt * rt).astype(jnp.float32)

    for s in range(n_src):
        geom = _TileGeom(x_ref[s, 0], y_ref[s, 0], tile_row0,
                         kv=kv, ks=ks, height=height, width=width,
                         bases=(rs_ref[s, di, t], cs_ref[s, di, t],
                                rc_ref[s, di, t]))
        dma_for(slot, s, di, t).wait()

        def patch_at(dv, slot=slot, s=s):
            return patch_ref[slot, s, pl.ds(dv, bh)]  # (bh, C, wpp)

        # span-driven tap dispatch (sweep_gather.dispatch_taps); branches
        # meet in the VMEM scratch (values can't cross pl.when)
        kw = dict(bh=bh, channels=channels, width=width, idx=...)
        dispatch_taps(
            lambda kv_, ks_, slot=slot, s=s: _gather_taps_static(
                geom, pltpu.roll(patch_ref[slot, s], wpp - geom.rc, 2),
                warped_ref, kv_=kv_, ks_=ks_, **kw),
            lambda ks_t: _gather_taps_dyn(
                geom, patch_at, warped_ref, vs_ref[s, di, t], geom.rc, wpp,
                ks_t=ks_t, **kw),
            vs_ref[s, di, t], hs_ref[s, di, t], kv, ks,
        )
        warped = warped_ref[...]
        acc_sum = acc_sum + warped
        acc_sq = acc_sq + warped * warped

    inv_v = 1.0 / (n_src + 1)
    mean = acc_sum * inv_v
    out_ref[0] = acc_sq * inv_v - mean * mean


@functools.partial(jax.jit, static_argnames=("kv", "ks", "interpret"))
def _sweep_variance_impl(ref: jnp.ndarray, srcs: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                   kv: int = 8, ks: int = 8, interpret: bool = False):
    """Fused variance cost volume over {ref, warped srcs}.

    Args:
      ref:  (H, W, C) reference features.
      srcs: (S, H, W, C) source features.
      xs, ys: (S, D, H, W) per-view plane-sweep sample coordinates.

    Returns (D, H, W, C) variance volume (same math as
    ops.cost_volume.variance_cost_volume over bilinear-warped views).
    """
    return jnp.swapaxes(
        _sweep_variance_impl_hcw(ref, srcs, xs, ys, kv, ks, interpret), 2, 3
    )


@functools.partial(jax.jit, static_argnames=("kv", "ks", "interpret"))
def _sweep_variance_impl_hcw(ref, srcs, xs, ys, kv=8, ks=8, interpret=False):
    """Native-layout core: returns (D, H, C, W) — see `_sweep_variance_impl`
    for semantics; layout="hcw" consumers skip the NHWC relayout."""
    h, w, c = ref.shape
    n_src, d = xs.shape[0], xs.shape[1]
    assert h % BLOCK_ROWS == 0
    if d > _MAX_D_PER_CALL:
        return jnp.concatenate([
            _sweep_variance_impl_hcw(ref, srcs,
                                     xs[:, i : i + _MAX_D_PER_CALL],
                                     ys[:, i : i + _MAX_D_PER_CALL],
                                     kv, ks, interpret)
            for i in range(0, d, _MAX_D_PER_CALL)
        ], axis=0)

    ref_hcw = jnp.swapaxes(ref, 1, 2)                         # (H, C, W)
    srcs_hcw = jnp.swapaxes(srcs, 2, 3)                       # (S, H, C, W)
    srcs_pad = jnp.pad(srcs_hcw, ((0, 0), (VPAD, VPAD), (0, 0), (PAD, PAD)))

    n_tiles = h // BLOCK_ROWS
    bases = [tile_bases(xs[s], ys[s], h, w, kv, ks) for s in range(n_src)]
    row_start = jnp.stack([b[0] for b in bases])              # (S, D, T)
    col_start128 = jnp.stack([b[1] for b in bases])
    rc = jnp.stack([b[2] for b in bases])
    spans = [tile_spans(xs[s], ys[s], h, w, kv, ks) for s in range(n_src)]
    vspan = jnp.stack([sp[0] for sp in spans])                # (S, D, T)
    hspan = jnp.stack([sp[1] for sp in spans])
    kernel = functools.partial(
        _sweep_variance_kernel, kv=kv, ks=ks, height=h, width=w, channels=c,
        n_src=n_src, n_d=d, n_tiles=n_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(d, n_tiles),
            in_specs=[
                pl.BlockSpec((n_src, 1, BLOCK_ROWS, w),
                             lambda di, ti, *_: (0, di, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_src, 1, BLOCK_ROWS, w),
                             lambda di, ti, *_: (0, di, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_ROWS, c, w), lambda di, ti, *_: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_ROWS, c, w),
                                   lambda di, ti, *_: (di, ti, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, n_src, BLOCK_ROWS + kv, c, _round_up(w + ks + 128, 128)),
                    jnp.float32,
                ),
                pltpu.VMEM((BLOCK_ROWS, c, w), jnp.float32),
                pltpu.SemaphoreType.DMA((2, n_src)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, c, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(row_start, col_start128, rc, vspan, hspan, xs, ys, ref_hcw, srcs_pad)
    return out                                                # (D, H, C, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def sweep_variance(ref: jnp.ndarray, srcs: jnp.ndarray, xs: jnp.ndarray,
                   ys: jnp.ndarray, kv: int = 8, ks: int = 8,
                   interpret: bool = False, layout: str = "nhwc"):
    """Differentiable fused variance cost volume (see `_sweep_variance_impl`).

    Backward: with f_v the per-view (warped) features and m the across-view
    mean, ∂var/∂f_v = (2/V)(f_v − m).  The VJP recomputes the warped views
    with the gather kernel (the fused forward deliberately never stored
    them), forms the per-view cotangents elementwise, and transposes the
    source-view ones back through the exact-adjoint scatter kernel; the ref
    view is unwarped, so its cotangent is just a sum over planes.
    Coordinates carry no gradient (plane-sweep geometry is non-differentiable
    by design, ref modules/warping.py torch.no_grad()).

    layout="hcw" returns (D, H, C, W) — the kernel's native layout — and
    takes its cotangent in the same layout (no volume-sized relayouts);
    ref/srcs and their cotangents stay (H, W, C) either way."""
    if layout == "hcw":
        return _sweep_variance_impl_hcw(ref, srcs, xs, ys, kv, ks, interpret)
    return _sweep_variance_impl(ref, srcs, xs, ys, kv, ks, interpret)


def _sweep_variance_fwd(ref, srcs, xs, ys, kv, ks, interpret, layout):
    out = sweep_variance(ref, srcs, xs, ys, kv, ks, interpret, layout)
    return out, (ref, srcs, xs, ys)


def _sweep_variance_bwd(kv, ks, interpret, layout, res, g):
    from .sweep_gather import _sweep_gather_impl_hcw, _sweep_scatter_impl_hcw

    ref, srcs, xs, ys = res
    h, w, _ = ref.shape
    n_src = srcs.shape[0]
    v = n_src + 1
    if layout != "hcw":
        g = jnp.swapaxes(g, 2, 3)                       # → (D, H, C, W)

    # everything below runs in the kernels' native (D, H, C, W) layout
    warped = [
        _sweep_gather_impl_hcw(srcs[s], xs[s], ys[s], kv, ks, interpret)
        for s in range(n_src)
    ]
    ref_hcw = jnp.swapaxes(ref, 1, 2)[None]             # (1, H, C, W)
    mean = ref_hcw
    for wv_ in warped:
        mean = mean + wv_
    mean = mean / v

    scale = 2.0 / v
    # (H, C, W) → (H, W, C)
    dref = jnp.swapaxes(jnp.sum(g * (scale * (ref_hcw - mean)), axis=0), 1, 2)
    dsrcs = jnp.stack([
        _sweep_scatter_impl_hcw(
            g * (scale * (warped[s] - mean)), xs[s], ys[s], h, w, kv, ks,
            interpret,
        )
        for s in range(n_src)
    ])
    return dref, dsrcs, None, None


sweep_variance.defvjp(_sweep_variance_fwd, _sweep_variance_bwd)
