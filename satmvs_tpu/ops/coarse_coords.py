"""Coarse-grid evaluation of plane-sweep coordinates.

The RPC sweep coordinate field is an analytic rational map — smooth at the
few-pixel scale — so evaluating the ~40-term polynomial chain per pixel
(≈25% of sweep time) is wasteful.  Here the exact projection runs on a
`factor`-subsampled grid (plus one boundary sample) and is bilinearly
upsampled with an exact separable lerp built from reshapes and broadcasts
(no gather).  Interpolation error is quadratic in the grid spacing times the
field curvature; for satellite RPCs at factor 4 it is < 1e-3 px (gated by
tests/test_coarse_coords.py against the exact path).

Per-pixel height hypotheses (cascade stages 2-3) make the field non-smooth
through the parallax term, so the height dependence is handled analytically:
the projection is evaluated at two reference heights per plane-set and
linearized, coords(x, y, h) ≈ a(x, y) + b(x, y)·h — exact to the (tiny)
nonlinearity of the rational polynomials in normalized height over the
stage's sampling window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geo import rpc as rpclib
from .warp import RpcWarpCams


def _lerp_upsample_axis(coarse: jnp.ndarray, factor: int, axis: int, out_size: int):
    """Exact linear upsample by integer `factor` along `axis`.

    coarse has n+1 samples at positions {0, f, 2f, ..., nf}; output sample j
    = lerp(coarse[j//f], coarse[j//f+1], (j mod f)/f), truncated to out_size.
    Implemented with slicing + broadcasting only.
    """
    coarse = jnp.moveaxis(coarse, axis, -1)
    left = coarse[..., :-1]                     # (..., n)
    right = coarse[..., 1:]
    w = (jnp.arange(factor, dtype=coarse.dtype) / factor)  # (f,)
    fine = left[..., None] * (1.0 - w) + right[..., None] * w  # (..., n, f)
    fine = fine.reshape(*fine.shape[:-2], -1)[..., :out_size]
    return jnp.moveaxis(fine, -1, axis)


def _coarse_grid(height: int, width: int, factor: int):
    hc = -(-height // factor)  # cells
    wc = -(-width // factor)
    ys = jnp.arange(hc + 1, dtype=jnp.float32) * factor
    xs = jnp.arange(wc + 1, dtype=jnp.float32) * factor
    return ys, xs


def rpc_sweep_coords_coarse(
    cams: RpcWarpCams,
    src_index,
    depth_values: jnp.ndarray,
    height: int,
    width: int,
    factor: int = 4,
):
    """Drop-in twin of ops.warp.rpc_sweep_coords via coarse-grid projection.

    depth_values: (D,) per-plane heights or (D, H, W) per-pixel hypotheses.
    Returns (x_src, y_src) each (D, H, W) float32.
    """
    rn = cams.ref_norm
    aff = cams.renorm[src_index]
    dn = cams.src_denorm[src_index]
    fwd = cams.src_fwd[src_index]

    ys, xs = _coarse_grid(height, width, factor)
    gx = xs[None, :]  # (1, Wc+1)
    gy = ys[:, None]  # (Hc+1, 1)
    xn = (gx - rn[0, 0]) * rn[0, 1]
    yn = (gy - rn[1, 0]) * rn[1, 1]
    xn, yn = jnp.broadcast_arrays(xn, yn)       # (Hc+1, Wc+1)

    def project(h_n_scalar):
        """Exact chain at one normalized ref height over the coarse grid."""
        hn = jnp.full_like(xn, h_n_scalar)
        lat_n, lon_n = rpclib.photo_to_obj_n(cams.ref_inv, xn, yn, hn)
        lat_s = lat_n * aff[0, 0] + aff[0, 1]
        lon_s = lon_n * aff[1, 0] + aff[1, 1]
        hei_s = hn * aff[2, 0] + aff[2, 1]
        samp_n, line_n = rpclib.obj_to_photo_n(fwd, lat_s, lon_s, hei_s)
        return samp_n * dn[0, 0] + dn[0, 1], line_n * dn[1, 0] + dn[1, 1]

    def upsample(c):
        c = _lerp_upsample_axis(c, factor, -2, height)
        return _lerp_upsample_axis(c, factor, -1, width)

    if depth_values.ndim == 1:
        # per-plane constant height: exact coarse evaluation per plane
        h_n = (depth_values.astype(jnp.float32) - rn[2, 0]) * rn[2, 1]
        cx, cy = jax.vmap(project)(h_n)          # (D, Hc+1, Wc+1)
        return upsample(cx), upsample(cy)

    # per-pixel hypotheses: central quadratic fit in height around the window
    # center — coords(h) is rational-cubic in normalized h, so a 3-point fit
    # over the sampling window leaves only the tiny cubic residual
    h = depth_values.astype(jnp.float32)
    h_n = (h - rn[2, 0]) * rn[2, 1]
    h0 = jnp.mean(h_n)
    delta = jnp.maximum(jnp.max(jnp.abs(h_n - h0)), 1e-3)
    xm, ym = project(h0 - delta)
    x0c, y0c = project(h0)
    xp, yp = project(h0 + delta)

    def fit(minus, mid, plus):
        a = upsample(mid)
        b = upsample((plus - minus) / (2.0 * delta))
        c = upsample((plus + minus - 2.0 * mid) / (2.0 * delta * delta))
        return a, b, c

    ax, bx, cx = fit(xm, x0c, xp)
    ay, by, cy = fit(ym, y0c, yp)
    dh = h_n - h0                                # (D, H, W)
    return (
        ax[None] + (bx[None] + cx[None] * dh) * dh,
        ay[None] + (by[None] + cy[None] * dh) * dh,
    )
