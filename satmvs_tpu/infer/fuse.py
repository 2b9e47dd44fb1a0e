"""Multi-view fusion: geometric-consistency filtering + DSM rasterization.

TPU re-design of the reference's offline fusion stack
(/root/reference/tools/rpc_filter.py, tools/pinhole_filter.py + the DSM
writers of dataset/data_io.py:289-325).  The reprojection chain runs jitted
on device through the same fp32 normalized RPC core as the warp (one
implementation for warp/filter/tools — SURVEY.md §2.3); georeferencing
(lat/lon → UTM grid) stays host-side float64.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geo import rpc as rpclib
from ..geo.tmerc import TransverseMercator
from ..ops.sampling import bilinear_sample_scalar
from ..ops.warp import RpcWarpCams, build_rpc_warp_cams, rpc_transform_points

INVALID_DEPTH = -999.0


@partial(jax.jit, static_argnames=())
def _check_consistency_rpc(
    depth_ref: jnp.ndarray,
    depth_src: jnp.ndarray,
    cams_rs: RpcWarpCams,
    cams_sr: RpcWarpCams,
    p_ratio: jnp.ndarray,
    d_ratio: jnp.ndarray,
):
    """Forward-backward reprojection check for one (ref, src) pair.

    Mirrors reproject_with_depth + check_geometric_consistency
    (rpc_filter.py:9-68): ref pixel + ref height → src pixel; sample the src
    height there; project back with the sampled height; consistent iff the
    round trip lands < p_ratio px away AND the height gap is < d_ratio m.
    """
    h, w = depth_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    x_src, y_src = rpc_transform_points(cams_rs, 0, xs, ys, depth_ref)
    sampled = bilinear_sample_scalar(depth_src, x_src, y_src, fill=INVALID_DEPTH)
    x_re, y_re = rpc_transform_points(cams_sr, 0, x_src, y_src, sampled)

    dist = jnp.hypot(x_re - xs, y_re - ys)
    depth_diff = jnp.abs(sampled - depth_ref)
    mask = (dist < p_ratio) & (depth_diff < d_ratio)
    return mask, jnp.where(mask, sampled, 0.0)


def filter_depth_rpc(
    depths: np.ndarray,
    rpcs: np.ndarray,
    p_ratio: float = 1.0,
    d_ratio: float = 2.5,
    geo_consist_num: int = 1,
    prob: np.ndarray | None = None,
    confidence_ratio: float = 0.0,
):
    """Fuse per-view height maps of one scene into a filtered ref-view map.

    Args mirror filter_depth (rpc_filter.py:71-112): depths (V, H, W) with
    view 0 the reference, rpcs (V, 170) float64, photometric confidence map
    `prob` (H, W) for the reference view.

    Returns (final_mask (H, W) bool, fused_height (H, W)): heights averaged
    over consistent views + the reference (rpc_filter.py:106).
    """
    depths = np.asarray(depths, np.float32)
    vnum = depths.shape[0]
    ref_depth = jnp.asarray(depths[0])

    photo_mask = (
        jnp.asarray(prob) > confidence_ratio
        if prob is not None
        else jnp.ones_like(ref_depth, bool)
    )

    geo_count = jnp.zeros_like(ref_depth, jnp.int32)
    height_sum = jnp.array(ref_depth)
    for v in range(1, vnum):
        pair = np.stack([rpcs[0], rpcs[v]])
        cams_rs = build_rpc_warp_cams(pair, ref_index=0)
        cams_sr = build_rpc_warp_cams(pair[::-1], ref_index=0)
        mask, reproj = _check_consistency_rpc(
            ref_depth, jnp.asarray(depths[v]), cams_rs, cams_sr,
            jnp.float32(p_ratio), jnp.float32(d_ratio),
        )
        geo_count = geo_count + mask.astype(jnp.int32)
        height_sum = height_sum + reproj

    fused = height_sum / (geo_count + 1).astype(jnp.float32)
    final_mask = photo_mask & (geo_count >= geo_consist_num)
    return np.asarray(final_mask), np.asarray(fused)


# ---------------------------------------------------------------------------
# pinhole twin (relative depth threshold, ref pinhole_filter.py:49-66)
# ---------------------------------------------------------------------------
@jax.jit
def _check_consistency_pinhole(depth_ref, depth_src, proj_ref, proj_src,
                               p_thre, rel_d_thre):
    h, w = depth_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def project(proj_from, proj_to, x, y, d):
        hi = jax.lax.Precision.HIGHEST  # fp32-exact (geo/rpc._rational_pair)
        rel = jnp.matmul(proj_to, jnp.linalg.inv(proj_from), precision=hi)
        p = jnp.matmul(
            jnp.stack([x * d, y * d, d, jnp.ones_like(d)], axis=-1), rel.T,
            precision=hi,
        )
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
        return p[..., 0] / z, p[..., 1] / z, p[..., 2]

    x_src, y_src, _ = project(proj_ref, proj_src, xs, ys, depth_ref)
    sampled = bilinear_sample_scalar(depth_src, x_src, y_src, fill=INVALID_DEPTH)
    x_re, y_re, d_re = project(proj_src, proj_ref, x_src, y_src, sampled)

    dist = jnp.hypot(x_re - xs, y_re - ys)
    rel_diff = jnp.abs(d_re - depth_ref) / jnp.maximum(depth_ref, 1e-6)
    mask = (dist < p_thre) & (rel_diff < rel_d_thre)
    return mask, jnp.where(mask, d_re, 0.0)


def filter_depth_pinhole(depths, projs, p_thre=1.0, rel_d_thre=0.01,
                         geo_consist_num=1, prob=None, confidence_ratio=0.0):
    """Pinhole fusion twin; depths (V, H, W), projs (V, 4, 4) K·E matrices."""
    depths = np.asarray(depths, np.float32)
    ref_depth = jnp.asarray(depths[0])
    photo_mask = (
        jnp.asarray(prob) > confidence_ratio
        if prob is not None
        else jnp.ones_like(ref_depth, bool)
    )
    geo_count = jnp.zeros_like(ref_depth, jnp.int32)
    depth_sum = jnp.array(ref_depth)
    for v in range(1, depths.shape[0]):
        mask, reproj = _check_consistency_pinhole(
            ref_depth, jnp.asarray(depths[v]),
            jnp.asarray(projs[0], jnp.float32), jnp.asarray(projs[v], jnp.float32),
            jnp.float32(p_thre), jnp.float32(rel_d_thre),
        )
        geo_count = geo_count + mask.astype(jnp.int32)
        depth_sum = depth_sum + reproj
    fused = depth_sum / (geo_count + 1).astype(jnp.float32)
    final_mask = photo_mask & (geo_count >= geo_consist_num)
    return np.asarray(final_mask), np.asarray(fused)


# ---------------------------------------------------------------------------
# DSM rasterization (host float64 georeferencing)
# ---------------------------------------------------------------------------
def rasterize_dsm(
    lat: np.ndarray,
    lon: np.ndarray,
    height: np.ndarray,
    mask: np.ndarray,
    tm: TransverseMercator,
    grid_res: float = 5.0,
    invalid: float = INVALID_DEPTH,
):
    """Bin fused (lat, lon, h) points into a UTM-gridded DSM (cell mean).

    Returns (dsm (Hg, Wg) float32, e_ul, n_ul) — upper-left corner for the
    TFW sidecar (ref data_io.py:289-300 semantics: north-up, row 0 at n_ul).
    """
    m = np.asarray(mask, bool).reshape(-1)
    pts = np.stack([np.asarray(lat).reshape(-1)[m], np.asarray(lon).reshape(-1)[m]], -1)
    h = np.asarray(height, np.float64).reshape(-1)[m]
    if pts.shape[0] == 0:
        raise ValueError("no valid points to rasterize")
    en = tm.proj(pts)
    e, n = en[:, 0], en[:, 1]

    e_min, e_max = e.min(), e.max()
    n_min, n_max = n.min(), n.max()
    wg = int(np.ceil((e_max - e_min) / grid_res)) + 1
    hg = int(np.ceil((n_max - n_min) / grid_res)) + 1
    col = np.clip(((e - e_min) / grid_res).astype(np.int64), 0, wg - 1)
    row = np.clip(((n_max - n) / grid_res).astype(np.int64), 0, hg - 1)

    acc = np.zeros(hg * wg, np.float64)
    cnt = np.zeros(hg * wg, np.int64)
    idx = row * wg + col
    np.add.at(acc, idx, h)
    np.add.at(cnt, idx, 1)
    dsm = np.full(hg * wg, invalid, np.float64)
    filled = cnt > 0
    dsm[filled] = acc[filled] / cnt[filled]
    return dsm.reshape(hg, wg).astype(np.float32), float(e_min), float(n_max)


def fuse_scene_to_dsm(
    depths: np.ndarray,
    rpcs: np.ndarray,
    out_path: str,
    tm: TransverseMercator | None = None,
    grid_res: float = 5.0,
    prob: np.ndarray | None = None,
    **filter_kw,
):
    """End-to-end: filter one scene's height maps → fused ref-view heights →
    (lat, lon) via the reference RPC (host fp64) → UTM DSM raster on disk.

    Returns (raster_path, final_mask, fused_height)."""
    from ..data import formats

    # default: the UTM zone of the scene center (the WHU-TLC preset is only
    # valid near its -135° central meridian)
    tm = tm or TransverseMercator.utm_for(float(rpcs[0][rpclib.LON_OFF]))
    final_mask, fused = filter_depth_rpc(depths, rpcs, prob=prob, **filter_kw)
    h, w = fused.shape
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    lat, lon = rpclib.photo_to_obj(
        np.asarray(rpcs[0], np.float64), xs.ravel(), ys.ravel(),
        fused.astype(np.float64).ravel(),
    )
    dsm, e_ul, n_ul = rasterize_dsm(lat, lon, fused.ravel(), final_mask.ravel(), tm, grid_res)
    path = formats.write_dsm(out_path, dsm, e_ul, n_ul, grid_res, grid_res)
    return path, final_mask, fused
