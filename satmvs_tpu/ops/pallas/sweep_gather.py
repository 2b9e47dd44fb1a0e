"""Fused plane-sweep bilinear gather — Pallas TPU kernel.

Replaces the XLA gather in ops/sampling.bilinear_sample for the plane-sweep
warp (the reference's F.grid_sample hot spot, /root/reference/modules/
warping.py:358; 87% of sweep time on the XLA path).

Key idea: TPU has no fast random gather, but the plane-sweep coordinate field
is *smooth* — within a (BLOCK_ROWS x W) output row-tile of one depth plane,
the integer sample offsets (x_src − j, y_src − i) each span only a few
pixels.  So each program:

  1. reads its coordinate tile, computes per-tile integer base offsets
     (row_base, col_base) = min integer offsets;
  2. DMAs the (BLOCK_ROWS+KV, C, W+KS+128) source window at that base from
     HBM into VMEM.  The source is laid out (H, C, W) — the *leading* row
     dim is untiled so arbitrary dynamic row offsets are legal; the lane
     (column) offset is 128-aligned and the ≤127-px residual is rotated out
     with one dynamic lane roll.  The source is pre-padded (VPAD rows /
     PAD columns) so any disparity range stays in bounds;
  3. accumulates the (KV+1) x (KS+1) tap stencil: out += wv(dv)·wh(ds)·
     window[dv:dv+BH, :, ds:ds+W] — static slices and VPU multiply-adds,
     no gather.  Bilinear weights factor exactly into vertical/horizontal
     hat functions; taps whose absolute coordinate falls outside the image
     get weight 0 (zeros-padding semantics, identical to
     ops/sampling.bilinear_sample — kernel output is bit-exact vs that path).

Points whose offset deviates from the tile base by > KV/KS (non-smooth warp)
contribute zero; `count_misses` is the pure-XLA coverage mirror — validate a
camera geometry once and fall back to the XLA path if nonzero.

Gotcha captured in code: Mosaic's dynamic rotate silently miscomputes for
negative traced shifts — always roll by (size − r).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8   # output rows per program
PAD = 256        # column padding of the source (covers |col offset| ≲ PAD)
VPAD = 32        # row padding (covers |row offset| ≤ VPAD)
_MAX_D_PER_CALL = 128  # plane-axis chunk: 5 scalar-prefetch arrays x S·D·T
                       # int32 overflow the ~1 MB smem at D≳200 full-res


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _TileGeom:
    """Per-tile window geometry shared by the gather kernel and its exact
    transpose (the scatter kernel) — one implementation so forward taps and
    backward taps can never drift apart."""

    def __init__(self, x, y, tile_row0, *, kv, ks, height, width, bases=None):
        bh = BLOCK_ROWS
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        self.fx = x - x0f
        self.fy = y - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        jj = jax.lax.broadcasted_iota(jnp.int32, (bh, width), 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (bh, width), 0)

        rel_x = x0 - jj                      # horizontal offset field
        rel_y = y0 - (ii + tile_row0)        # vertical offset field

        valid_any = (x0 >= -1) & (x0 <= width - 1) & (y0 >= -1) & (y0 <= height - 1)
        self.valid_any = valid_any

        self.kh = bh + kv
        wp = width + ks
        self.wpp = _round_up(wp + 128, 128)
        h_tot = height + 2 * VPAD
        w_tot = width + 2 * PAD
        if bases is not None:
            # precomputed window placement (tile_bases, XLA side) — same
            # integer math, passed in via scalar prefetch so kernels can
            # prefetch the NEXT program's window and skip the reductions
            self.row_start, cs128, self.rc = bases
            self.col_start128 = pl.multiple_of(cs128, 128)
            col_start = self.col_start128 + self.rc
        else:
            # per-tile integer bases (ignore far-out-of-image samples when
            # choosing the base so border tiles still cover their valid points)
            big = jnp.int32(10**9)
            col_base = jnp.min(jnp.where(valid_any, rel_x, big))
            row_base = jnp.min(jnp.where(valid_any, rel_y, big))
            col_base = jnp.where(col_base == big, 0, col_base)
            row_base = jnp.where(row_base == big, 0, row_base)

            # window placement in the padded (H, C, W) source: row offset is
            # free (untiled leading dim); column offset must be 128-aligned
            # with the residual rolled out of the patch.
            self.row_start = jnp.clip(tile_row0 + row_base + VPAD, 0, h_tot - self.kh)
            col_start = jnp.clip(col_base + PAD, 0, w_tot - wp)
            self.col_start128 = pl.multiple_of(
                jnp.clip((col_start // 128) * 128, 0, w_tot - self.wpp), 128
            )
            self.rc = col_start - self.col_start128    # ∈ [0, 128]

        # effective bases after clamping (clamps only matter when the needed
        # window exceeds the image/pad range, where weights are 0 anyway)
        row_base_eff = self.row_start - VPAD - tile_row0
        col_base_eff = col_start - PAD

        self.dv_idx = rel_y - row_base_eff   # top-left corner tap ∈ [0, kv)
        self.ds_idx = rel_x - col_base_eff   # when covered

        # per-corner image-bounds validity (zeros-padding semantics)
        self.vx0 = (x0 >= 0) & (x0 <= width - 1)
        self.vx1 = (x0 + 1 >= 0) & (x0 + 1 <= width - 1)
        self.vy0 = (y0 >= 0) & (y0 <= height - 1)
        self.vy1 = (y0 + 1 >= 0) & (y0 + 1 <= height - 1)

    def wv(self, dv):
        """Vertical hat weight of tap row dv: corner y0 at tap dv → (1−fy);
        corner y0+1 at dv → fy."""
        return (
            jnp.where((self.dv_idx == dv) & self.vy0, 1.0 - self.fy, 0.0)
            + jnp.where((self.dv_idx + 1 == dv) & self.vy1, self.fy, 0.0)
        ).astype(jnp.float32)

    def wh(self, ds):
        return (
            jnp.where((self.ds_idx == ds) & self.vx0, 1.0 - self.fx, 0.0)
            + jnp.where((self.ds_idx + 1 == ds) & self.vx1, self.fx, 0.0)
        ).astype(jnp.float32)

    def covered_by(self, fkv: int, fks: int):
        """Scalar predicate: every in-image sample's taps fall inside the
        narrower (fkv+1)×(fks+1) grid — i.e. the fast tap loop is exact for
        this tile.  (Out-of-image points have zero weights either way.)"""
        z = jnp.int32(0)
        max_dv = jnp.max(jnp.where(self.valid_any, self.dv_idx, z))
        max_ds = jnp.max(jnp.where(self.valid_any, self.ds_idx, z))
        return (max_dv + 1 <= fkv) & (max_ds + 1 <= fks)

    def spans(self, kv: int, ks: int):
        """(vspan, hspan): tap counts needed by this tile per axis — a valid
        sample at offset idx touches taps idx and idx+1, so the count is
        max_idx + 2, clamped to the stencil's k+1 (taps beyond the stencil
        are dropped by EVERY path — the count_misses contract)."""
        z = jnp.int32(0)
        max_dv = jnp.max(jnp.where(self.valid_any, self.dv_idx, z))
        max_ds = jnp.max(jnp.where(self.valid_any, self.ds_idx, z))
        return (jnp.minimum(max_dv + 2, kv + 1),
                jnp.minimum(max_ds + 2, ks + 1))


FAST_STENCIL = 4   # horizontal tap tier of the dynamic-row path (5 taps/row)
MICRO_STENCIL = 2  # static fast-branch tap grid (3x3 taps)


def dispatch_taps(run_static, run_dyn, vs, hs, kv: int, ks: int) -> None:
    """Per-tile tap dispatch shared by the gather/scatter/variance kernels.

    vs/hs are the tile's needed tap counts per axis (`tile_spans` /
    `_TileGeom.spans`).  Three regimes, each bit-exact (the chosen loops
    cover every needed tap; taps beyond a span have zero weight):

      * micro (vs,hs ≤ 3): `run_static(MICRO, MICRO)` — fully static 3×3
        tap unroll over the whole pre-rolled patch, the cheapest form
        (measured faster than the dynamic-row loop at tiny spans: no
        per-row rolls, no fori overhead).  ≥90% of tiles at the coarse
        production stages.
      * dynamic rows (anything else): `run_dyn(ks_t)` — a dynamic-trip
        fori_loop over vs rows (rows live in the untiled leading dim, so a
        traced pl.ds offset is legal) with a static ks_t+1-tap unroll per
        row, ks_t the narrowest of (FAST, ks) covering hs.  Satellite warps
        are anisotropic (measured: vertical ≤3 taps everywhere, horizontal
        up to 8 along the epipolar direction at full-res stages), so this
        caps the worst tile at vs·(ks_t+1) taps instead of (ks+1)².

    `run_*` must WRITE results into a ref (values can't cross pl.when)."""
    m1 = MICRO_STENCIL + 1
    fast = jnp.logical_and(vs <= m1, hs <= m1)

    @pl.when(fast)
    def _():
        # clamp to the stencil so taps the full loop would drop (the
        # count_misses contract) stay dropped here too
        run_static(min(MICRO_STENCIL, kv), min(MICRO_STENCIL, ks))

    notfast = jnp.logical_not(fast)
    tiers = [t for t in (FAST_STENCIL,) if t < ks] + [ks]
    if len(tiers) == 1:
        @pl.when(notfast)
        def _():
            run_dyn(ks)
        return
    mid = jnp.logical_and(notfast, hs <= FAST_STENCIL + 1)

    @pl.when(mid)
    def _():
        run_dyn(FAST_STENCIL)

    @pl.when(jnp.logical_and(notfast, jnp.logical_not(hs <= FAST_STENCIL + 1)))
    def _():
        run_dyn(ks)


def tile_bases(xs: jnp.ndarray, ys: jnp.ndarray, height: int, width: int,
               kv: int, ks: int):
    """XLA mirror of `_TileGeom`'s window placement for every (plane, tile).

    Returns (row_start, col_start128, rc), each (D, n_tiles) int32 — pure
    integer math on floor() of the same fp32 coordinates, so the values are
    bit-identical to what `_TileGeom` would compute in-kernel.  Passed to the
    kernels via scalar prefetch, they let each program start the DMA of the
    NEXT program's source window while it computes (double-buffered pipeline)
    — the window placement must be known before the coordinate tile arrives
    in VMEM, hence this host/XLA-side precomputation.
    """
    d = xs.shape[0]
    bh = BLOCK_ROWS
    n_tiles = height // bh
    x0 = jnp.floor(xs).astype(jnp.int32).reshape(d, n_tiles, bh, width)
    y0 = jnp.floor(ys).astype(jnp.int32).reshape(d, n_tiles, bh, width)
    jj = jnp.arange(width, dtype=jnp.int32)[None, None, None, :]
    ii = (jnp.arange(height, dtype=jnp.int32).reshape(n_tiles, bh))[None, :, :, None]
    rel_x = x0 - jj
    rel_y = y0 - ii                              # ii is the absolute row
    valid = (x0 >= -1) & (x0 <= width - 1) & (y0 >= -1) & (y0 <= height - 1)
    big = jnp.int32(10**9)
    col_base = jnp.min(jnp.where(valid, rel_x, big), axis=(2, 3))
    row_base = jnp.min(jnp.where(valid, rel_y, big), axis=(2, 3))
    col_base = jnp.where(col_base == big, 0, col_base)
    row_base = jnp.where(row_base == big, 0, row_base)
    kh = bh + kv
    wp = width + ks
    wpp = _round_up(wp + 128, 128)
    h_tot = height + 2 * VPAD
    w_tot = width + 2 * PAD
    tile_row0 = (jnp.arange(n_tiles, dtype=jnp.int32) * bh)[None, :]
    row_start = jnp.clip(tile_row0 + row_base + VPAD, 0, h_tot - kh)
    col_start = jnp.clip(col_base + PAD, 0, w_tot - wp)
    col_start128 = jnp.clip((col_start // 128) * 128, 0, w_tot - wpp)
    rc = col_start - col_start128
    return row_start, col_start128, rc


def tile_spans(xs: jnp.ndarray, ys: jnp.ndarray, height: int, width: int,
               kv: int, ks: int):
    """XLA mirror of `_TileGeom.spans` for every (plane, tile): per-tile tap
    counts (vspan, hspan), each (D, n_tiles) int32 — scalar-prefetched so
    kernels can run a dynamic-trip row loop and pick the horizontal tap tier
    without in-kernel reductions.  Same integer math as `tile_bases` (shares
    its window placement)."""
    d = xs.shape[0]
    bh = BLOCK_ROWS
    n_tiles = height // bh
    row_start, col_start128, rc = tile_bases(xs, ys, height, width, kv, ks)
    x0 = jnp.floor(xs).astype(jnp.int32).reshape(d, n_tiles, bh, width)
    y0 = jnp.floor(ys).astype(jnp.int32).reshape(d, n_tiles, bh, width)
    jj = jnp.arange(width, dtype=jnp.int32)[None, None, None, :]
    ii = (jnp.arange(height, dtype=jnp.int32).reshape(n_tiles, bh))[None, :, :, None]
    rel_x = x0 - jj
    rel_y = y0 - ii
    valid = (x0 >= -1) & (x0 <= width - 1) & (y0 >= -1) & (y0 <= height - 1)
    tile_row0 = (jnp.arange(n_tiles, dtype=jnp.int32) * bh)[None, :, None, None]
    dv_idx = rel_y - (row_start[:, :, None, None] - VPAD - tile_row0)
    ds_idx = rel_x - ((col_start128 + rc)[:, :, None, None] - PAD)
    z = jnp.int32(0)
    max_dv = jnp.max(jnp.where(valid, dv_idx, z), axis=(2, 3))
    max_ds = jnp.max(jnp.where(valid, ds_idx, z), axis=(2, 3))
    return (jnp.minimum(max_dv + 2, kv + 1),
            jnp.minimum(max_ds + 2, ks + 1))


def _gather_taps_static(geom, patch, out_ref, *, kv_, ks_, bh, channels,
                        width, idx=0):
    """Fully static tap unroll over the whole pre-rolled patch — the fast
    branch of `dispatch_taps` (micro tiles)."""
    acc = jnp.zeros((bh, channels, width), jnp.float32)
    for dv in range(kv_ + 1):
        wv = geom.wv(dv)
        for ds in range(ks_ + 1):
            w = wv * geom.wh(ds)                      # (BH, W)
            acc = acc + w[:, None, :] * patch[dv : dv + bh, :, ds : ds + width]
    out_ref[idx] = acc


def _gather_taps_dyn(geom, patch_at, out_ref, vspan, rc, wpp,
                     *, ks_t, bh, channels, width, idx=0):
    """Row loop over the tile's measured vertical tap count (dynamic trip —
    rows live in the untiled leading dim, so pl.ds with a traced offset is
    legal), with a static ks_t+1-tap unroll per row.  `patch_at(dv)` yields
    the un-rolled (BH, C, wpp) window rows at tap dv; the rc residual roll
    is applied per row-slab here.  Accumulates into `out_ref[idx]`."""
    out_ref[idx] = jnp.zeros((bh, channels, width), jnp.float32)

    def body(dv, _):
        rows = patch_at(dv)                           # (bh, C, wpp)
        rows = pltpu.roll(rows, wpp - rc, 2)
        wv = geom.wv(dv)
        acc = jnp.zeros((bh, channels, width), jnp.float32)
        for ds in range(ks_t + 1):
            w = wv * geom.wh(ds)                      # (BH, W)
            acc = acc + w[:, None, :] * rows[:, :, ds : ds + width]
        out_ref[idx] = out_ref[idx] + acc
        return 0

    jax.lax.fori_loop(0, vspan, body, 0)


def _sweep_gather_kernel(
    rs_ref, cs_ref, rc_ref, vs_ref, hs_ref, x_ref, y_ref, src_hbm, out_ref,
    patch_ref, *scratch,
    kv: int, ks: int, height: int, width: int, channels: int,
    n_d: int, n_tiles: int,
):
    # the f32 tap accumulator scratch exists only for non-f32 outputs (bf16
    # volume transport) — the default f32 path never allocates it
    if len(scratch) == 2:
        acc_ref, sems = scratch
    else:
        acc_ref = None
        (sems,) = scratch
    """Double-buffered: program p computes its taps while the DMA of program
    p+1's source window (placement from the scalar-prefetched `tile_bases`)
    is in flight into the other buffer slot."""
    bh = BLOCK_ROWS
    di = pl.program_id(0)
    t = pl.program_id(1)
    tile_row0 = t * bh
    kh = bh + kv
    wpp = _round_up(width + ks + 128, 128)

    p = di * n_tiles + t
    slot = jax.lax.rem(p, 2)

    def dma_for(slot_, dd, tt):
        rs = rs_ref[dd, tt]
        cs = pl.multiple_of(cs_ref[dd, tt], 128)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(rs, kh), :, pl.ds(cs, wpp)],
            patch_ref.at[slot_],
            sems.at[slot_],
        )

    @pl.when(p == 0)
    def _():
        dma_for(0, di, t).start()

    @pl.when(p + 1 < n_d * n_tiles)
    def _():
        nd = jax.lax.div(p + 1, n_tiles)
        nt = jax.lax.rem(p + 1, n_tiles)
        dma_for(1 - slot, nd, nt).start()

    geom = _TileGeom(x_ref[0], y_ref[0], tile_row0,
                     kv=kv, ks=ks, height=height, width=width,
                     bases=(rs_ref[di, t], cs_ref[di, t], rc_ref[di, t]))
    rc = geom.rc

    dma_for(slot, di, t).wait()

    # dynamic roll shifts must be non-negative (negative traced shifts
    # miscompute silently) — roll left by rc via a right-roll of wpp − rc.
    def patch_at(dv):
        return patch_ref[slot, pl.ds(dv, bh)]         # (bh, C, wpp)

    # Non-f32 outputs (bf16 volume transport): accumulate taps in the f32
    # VMEM scratch and cast once at the store, so the result is exactly
    # f32_result.astype(dtype) — never a low-precision accumulation (the
    # dynamic-row path accumulates across its fori_loop through the ref).
    use_acc = acc_ref is not None
    dst = acc_ref if use_acc else out_ref
    kw = dict(bh=bh, channels=channels, width=width)
    dispatch_taps(
        lambda kv_, ks_: _gather_taps_static(
            geom, pltpu.roll(patch_ref[slot], wpp - rc, 2), dst,
            kv_=kv_, ks_=ks_, **kw),
        lambda ks_t: _gather_taps_dyn(
            geom, patch_at, dst, vs_ref[di, t], rc, wpp, ks_t=ks_t, **kw),
        vs_ref[di, t], hs_ref[di, t], kv, ks,
    )
    if use_acc:
        out_ref[0] = acc_ref[0].astype(out_ref.dtype)


def _sweep_gather_impl(src: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                       kv: int = 8, ks: int = 8, interpret: bool = False,
                       out_dtype=None):
    """NHWC wrapper over `_sweep_gather_impl_hcw`: (D, H, W, C)."""
    return jnp.swapaxes(
        _sweep_gather_impl_hcw(src, xs, ys, kv, ks, interpret, out_dtype), 2, 3
    )


def _sweep_gather_impl_hcw(src: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                           kv: int = 8, ks: int = 8, interpret: bool = False,
                           out_dtype=None):
    """Bilinear-sample `src` (H, W, C) at plane-sweep coords (D, H, W).

    Returns warped (D, H, C, W) — the kernel's NATIVE layout (W in lanes, C
    in sublanes); the cost-volume/regularizer pipeline consumes it directly
    (layout="hcw"), skipping the volume-sized NHWC relayout copies that XLA
    otherwise inserts on both sides of every kernel call (measured ~15-20 ms
    of a 188 ms train step).  H must be a multiple of BLOCK_ROWS; integer
    sample offsets within each row-tile must span ≤ kv/ks pixels (true for
    smooth RPC/homography warps — validate with `count_misses(...) == 0`,
    falling back to ops.sampling.bilinear_sample otherwise).
    """
    h, w, c = src.shape
    d = xs.shape[0]
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    assert h % BLOCK_ROWS == 0, f"height {h} not a multiple of {BLOCK_ROWS}"
    if d > _MAX_D_PER_CALL:  # scalar-prefetch smem cap (sweep_variance.py)
        return jnp.concatenate([
            _sweep_gather_impl_hcw(src, xs[i : i + _MAX_D_PER_CALL],
                                   ys[i : i + _MAX_D_PER_CALL],
                                   kv, ks, interpret, out_dtype)
            for i in range(0, d, _MAX_D_PER_CALL)
        ], axis=0)

    src_hcw = jnp.swapaxes(src, 1, 2)                       # (H, C, W)
    src_pad = jnp.pad(src_hcw, ((VPAD, VPAD), (0, 0), (PAD, PAD)))

    n_tiles = h // BLOCK_ROWS
    row_start, col_start128, rc = tile_bases(xs, ys, h, w, kv, ks)
    vspan, hspan = tile_spans(xs, ys, h, w, kv, ks)
    kernel = functools.partial(
        _sweep_gather_kernel, kv=kv, ks=ks, height=h, width=w, channels=c,
        n_d=d, n_tiles=n_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(d, n_tiles),
            in_specs=[
                pl.BlockSpec((1, BLOCK_ROWS, w), lambda di, ti, *_: (di, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, w), lambda di, ti, *_: (di, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_ROWS, c, w),
                                   lambda di, ti, *_: (di, ti, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, BLOCK_ROWS + kv, c, _round_up(w + ks + 128, 128)),
                    jnp.float32,
                ),
            ]
            + (
                # f32 tap accumulator, only for non-f32 (bf16-transport)
                # outputs — don't burn VMEM headroom on the default path
                [pltpu.VMEM((1, BLOCK_ROWS, c, w), jnp.float32)]
                if np.dtype(out_dtype) != np.dtype(np.float32)
                else []
            )
            + [pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, c, w), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(row_start, col_start128, rc, vspan, hspan, xs, ys, src_pad)
    return out                                              # (D, H, C, W)


def _sweep_scatter_kernel(
    x_ref, y_ref, g_ref, out_ref, win_ref,
    *, kv: int, ks: int, height: int, width: int, channels: int,
):
    """Exact transpose of `_sweep_gather_kernel`: accumulate tap-weighted
    cotangents into the padded source-cotangent buffer.

    The padded (H+2·VPAD, C, W+2·PAD) accumulator IS the kernel output — its
    BlockSpec index is constant, so Pallas keeps it resident in VMEM across
    every (plane, tile) grid step (output revisiting) and writes it to HBM
    once at the end: a scatter-add with zero HBM round-trips, instead of
    XLA's serialized scatter (measured 97-141 ms per corner-scatter at the
    384x768 stage).  Grid steps are sequential on a TPU core, so the
    read-modify-write accumulation is race-free.
    """
    bh = BLOCK_ROWS
    d = pl.program_id(0)
    t = pl.program_id(1)
    tile_row0 = t * bh

    @pl.when((d == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    geom = _TileGeom(x_ref[0], y_ref[0], tile_row0,
                     kv=kv, ks=ks, height=height, width=width)
    kh, wpp, rc = geom.kh, geom.wpp, geom.rc

    # upcast at read — bf16 cotangents (volume transport) cost half the HBM
    # read; all tap math and the accumulator stay f32
    g = g_ref[0].astype(jnp.float32)                  # (BH, C, W)

    # stage the tile's tap contributions in window coordinates
    win_ref[...] = jnp.zeros_like(win_ref)

    # same span-driven dispatch as the gather forward — the staged taps are
    # the exact transpose of whatever the forward ran (spans are a pure
    # function of the coordinates both share); no scalar prefetch here, so
    # the spans come from the in-kernel reductions
    vs, hs = geom.spans(kv, ks)

    def stage_static(kv_, ks_):
        for dv in range(kv_ + 1):
            wv = geom.wv(dv)
            for ds in range(ks_ + 1):
                w = wv * geom.wh(ds)                  # (BH, W)
                win_ref[dv : dv + bh, :, ds : ds + width] = (
                    win_ref[dv : dv + bh, :, ds : ds + width] + w[:, None, :] * g
                )

    def stage_dyn(ks_t):
        # per-tap ref RMW — .at[].add on a value would lower to scatter-add,
        # which Mosaic has no TPU lowering for (interpret mode hides this)
        def body(dv, _):
            wv = geom.wv(dv)
            for ds in range(ks_t + 1):
                w = wv * geom.wh(ds)                  # (BH, W)
                win_ref[pl.ds(dv, bh), :, ds : ds + width] = (
                    win_ref[pl.ds(dv, bh), :, ds : ds + width]
                    + w[:, None, :] * g
                )
            return 0

        jax.lax.fori_loop(0, vs, body, 0)

    dispatch_taps(stage_static, stage_dyn, vs, hs, kv, ks)

    # forward read the window left-rolled by rc; the transpose rolls the
    # contribution right by rc before adding at the 128-aligned base
    win = pltpu.roll(win_ref[:], rc, 2)
    cur = out_ref[pl.ds(geom.row_start, kh), :, pl.ds(geom.col_start128, wpp)]
    out_ref[pl.ds(geom.row_start, kh), :, pl.ds(geom.col_start128, wpp)] = cur + win


def _sweep_scatter_impl(g: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                        height: int, width: int,
                        kv: int = 8, ks: int = 8, interpret: bool = False):
    """NHWC wrapper over `_sweep_scatter_impl_hcw` (g (D, H, W, C))."""
    return _sweep_scatter_impl_hcw(
        jnp.swapaxes(g, 2, 3), xs, ys, height, width, kv, ks, interpret
    )


def _sweep_scatter_impl_hcw(g_hcw: jnp.ndarray, xs: jnp.ndarray,
                            ys: jnp.ndarray, height: int, width: int,
                            kv: int = 8, ks: int = 8,
                            interpret: bool = False):
    """Pallas transpose of the gather: cotangents g (D, H, C, W — the
    kernel's native layout) → source cotangent (H, W, C).  Same smooth-warp
    contract as the forward."""
    d, _, c, _ = g_hcw.shape
    assert height % BLOCK_ROWS == 0
    n_tiles = height // BLOCK_ROWS
    h_tot = height + 2 * VPAD
    w_tot = width + 2 * PAD
    wpp = _round_up(width + ks + 128, 128)

    kernel = functools.partial(
        _sweep_scatter_kernel, kv=kv, ks=ks, height=height, width=width,
        channels=c,
    )
    out_pad = pl.pallas_call(
        kernel,
        grid=(d, n_tiles),
        in_specs=[
            pl.BlockSpec((1, BLOCK_ROWS, width), lambda di, ti: (di, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS, width), lambda di, ti: (di, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS, c, width), lambda di, ti: (di, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h_tot, c, w_tot), lambda di, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_tot, c, w_tot), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_ROWS + kv, c, wpp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs, ys, g_hcw)
    dsrc = out_pad[VPAD : VPAD + height, :, PAD : PAD + width]
    return jnp.swapaxes(dsrc, 1, 2)                    # (H, W, C)


# accumulator + tile buffers must fit VMEM for the fused scatter backward
_SCATTER_VMEM_CAP = 96 * 1024 * 1024


def _bilinear_scatter(g: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                      height: int, width: int) -> jnp.ndarray:
    """Transpose of bilinear sampling: scatter-add cotangents g (D, H, W, C)
    into a (H, W, C) source cotangent (XLA scatter; used for the backward)."""
    c = g.shape[-1]
    x = xs.reshape(-1)
    y = ys.reshape(-1)
    gf = g.reshape(-1, c).astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = jnp.zeros((height * width, c), jnp.float32)
    for dy, dx, wgt in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        yy = y0i + dy
        xx = x0i + dx
        valid = (xx >= 0) & (xx < width) & (yy >= 0) & (yy < height)
        idx = jnp.clip(yy, 0, height - 1) * width + jnp.clip(xx, 0, width - 1)
        out = out.at[idx].add(gf * (wgt * valid)[:, None])
    return out.reshape(height, width, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def sweep_gather(src: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                 kv: int = 8, ks: int = 8, interpret: bool = False,
                 layout: str = "nhwc", out_dtype=None):
    """Differentiable fused plane-sweep bilinear sample (see module docs).

    Forward runs the Pallas stencil kernel; backward scatters cotangents into
    the source with the exact-transpose Pallas kernel (coordinates carry no
    gradient — the plane-sweep geometry is non-differentiable by design,
    matching the reference's torch.no_grad() warp).

    layout="hcw" returns (D, H, C, W) — the kernel's native layout — and
    takes the cotangent in the same layout, skipping the volume-sized
    relayout copies at both kernel boundaries; src and its cotangent stay
    (H, W, C) either way.

    out_dtype=bfloat16 stores the warped volume (and receives its cotangent)
    in bf16 — halving the sweep's HBM volume transport; tap accumulation in
    the forward, and all scatter math in the backward, stay f32 (the output
    is exactly the f32 result cast once).  The source cotangent is f32."""
    if layout == "hcw":
        return _sweep_gather_impl_hcw(src, xs, ys, kv, ks, interpret, out_dtype)
    return _sweep_gather_impl(src, xs, ys, kv, ks, interpret, out_dtype)


def _sweep_gather_fwd(src, xs, ys, kv, ks, interpret, layout, out_dtype):
    out = sweep_gather(src, xs, ys, kv, ks, interpret, layout, out_dtype)
    return out, (src.shape, xs, ys)


def _sweep_gather_bwd(kv, ks, interpret, layout, out_dtype, residuals, g):
    (h, w, c), xs, ys = residuals
    acc_bytes = (h + 2 * VPAD) * c * (w + 2 * PAD) * 4
    if h % BLOCK_ROWS == 0 and acc_bytes <= _SCATTER_VMEM_CAP:
        # fused Pallas transpose (same taps as the forward — exact adjoint
        # of what the forward computed, misses included)
        g_hcw = g if layout == "hcw" else jnp.swapaxes(g, 2, 3)
        dsrc = _sweep_scatter_impl_hcw(g_hcw, xs, ys, h, w, kv, ks, interpret)
    else:
        if layout == "hcw":
            g = jnp.swapaxes(g, 2, 3)
        dsrc = _bilinear_scatter(g, xs, ys, h, w)
    return dsrc, None, None


sweep_gather.defvjp(_sweep_gather_fwd, _sweep_gather_bwd)


def count_misses(xs: jnp.ndarray, ys: jnp.ndarray, height: int, width: int,
                 kv: int = 8, ks: int = 8) -> jnp.ndarray:
    """Number of valid sample points the kernel would drop (per depth plane).

    Pure XLA mirror of the kernel's per-tile base selection and clamping —
    use to validate a camera geometry once (or per batch in tests) before
    trusting `sweep_gather`; nonzero counts ⇒ use the XLA sampling path.
    """
    d = xs.shape[0]
    bh = BLOCK_ROWS
    n_tiles = height // bh
    # single source of truth for window placement: the same tile_bases the
    # kernels scalar-prefetch (col_start = col_start128 + rc)
    row_start, col_start128, rc = tile_bases(xs, ys, height, width, kv, ks)
    row_start = row_start[:, :, None, None]
    col_start = (col_start128 + rc)[:, :, None, None]
    x0 = jnp.floor(xs).astype(jnp.int32).reshape(d, n_tiles, bh, width)
    y0 = jnp.floor(ys).astype(jnp.int32).reshape(d, n_tiles, bh, width)
    jj = jnp.arange(width, dtype=jnp.int32)[None, None, None, :]
    ii = (jnp.arange(height, dtype=jnp.int32).reshape(n_tiles, bh))[None, :, :, None]
    rel_x = x0 - jj
    rel_y = y0 - ii
    valid = (x0 >= -1) & (x0 <= width - 1) & (y0 >= -1) & (y0 <= height - 1)
    tile_row0 = (jnp.arange(n_tiles, dtype=jnp.int32) * bh)[None, :, None, None]
    dv_idx = rel_y - (row_start - VPAD - tile_row0)
    ds_idx = rel_x - (col_start - PAD)
    covered = (dv_idx >= 0) & (dv_idx + 1 <= kv) & (ds_idx >= 0) & (ds_idx + 1 <= ks)
    return jnp.sum((valid & ~covered), axis=(1, 2, 3))
