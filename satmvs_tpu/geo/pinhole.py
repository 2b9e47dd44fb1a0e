"""Pinhole camera fitting & projection (the "pinhole" geo_model path).

DLT-based perspective-matrix fit with RQ factorization, used to approximate an
RPC camera with K·[R|t] under a projected (UTM) coordinate frame
(reference: /root/reference/tools/solve_perspective.py, derived from VisSat).
Host-side NumPy/SciPy float64 — fitting happens at data-preparation time.

Also hosts the small projection helpers shared by the pinhole plane-sweep warp
and the pinhole fusion filter.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def factorize(p: np.ndarray):
    """Factor a 3x4 projection matrix into (K, R, t) with K upper-triangular,
    positive diagonal, det(R) = 1, K normalized by K[2,2]
    (ref /root/reference/tools/solve_perspective.py:36-78)."""
    k, r = linalg.rq(p[:, :3])
    t = linalg.lstsq(k, p[:, 3:4])[0]

    neg = int(k[0, 0] < 0) + int(k[1, 1] < 0) + int(k[2, 2] < 0)
    if neg in (1, 3):
        k = -k
    fix = np.diag((1.0, 1.0, 1.0))
    if k[0, 0] < 0 and k[1, 1] < 0:
        fix = np.diag((-1.0, -1.0, 1.0))
    elif k[0, 0] < 0 and k[2, 2] < 0:
        fix = np.diag((-1.0, 1.0, -1.0))
    elif k[1, 1] < 0 and k[2, 2] < 0:
        fix = np.diag((1.0, -1.0, -1.0))
    k = k @ fix
    r = fix @ r
    t = fix @ t
    assert linalg.det(r) > 0
    k /= k[2, 2]
    return k, r, t


def solve_perspective(xx, yy, zz, col, row, keep_mask=None):
    """Fit K, R, t from 3-D points (xx, yy, zz) and pixel observations
    (col, row) by SVD on the 2N x 12 DLT system
    (ref /root/reference/tools/solve_perspective.py:82-126).

    Returns (K, R, t) with t of shape (3, 1).
    """
    arrays = [np.asarray(a, dtype=np.float64).reshape(-1, 1) for a in (xx, yy, zz, col, row)]
    if keep_mask is not None:
        mask = np.asarray(keep_mask).reshape(-1)
        arrays = [a[mask].reshape(-1, 1) for a in arrays]
    xx, yy, zz, col, row = arrays

    n = xx.size
    ones = np.ones((n, 1))
    zeros = np.zeros((n, 4))
    a1 = np.hstack([xx, yy, zz, ones, zeros, -col * xx, -col * yy, -col * zz, -col])
    a2 = np.hstack([zeros, xx, yy, zz, ones, -row * xx, -row * yy, -row * zz, -row])
    a = np.vstack([a1, a2])
    _, _, vh = linalg.svd(a, full_matrices=False)
    p = np.real(vh[11, :]).reshape(3, 4)
    return factorize(p)


def check_perspective_error(xx, yy, zz, col, row, k, r, t, keep_mask=None):
    """Forward projection error (px) and inverse projection error (m) of a
    fitted camera (ref /root/reference/tools/solve_perspective.py:129-213).

    Returns (proj_err, inv_proj_err), each (N, 1).
    """
    arrays = [np.asarray(a, dtype=np.float64).reshape(-1, 1) for a in (xx, yy, zz, col, row)]
    if keep_mask is not None:
        mask = np.asarray(keep_mask).reshape(-1)
        arrays = [a[mask].reshape(-1, 1) for a in arrays]
    xx, yy, zz, col, row = arrays

    n = xx.size
    ones = np.ones((n, 1))
    pts = np.hstack([xx, yy, zz])

    cam = pts @ r.T + t.T  # camera-frame coordinates
    p_hat = k @ np.hstack([r, t])
    proj = np.hstack([pts, ones]) @ p_hat.T
    est_col = proj[:, 0:1] / proj[:, 2:3]
    est_row = proj[:, 1:2] / proj[:, 2:3]
    proj_err = np.hypot(est_row - row, est_col - col)

    # inverse: ray through the pixel, scaled to the least-squares depth
    rays = np.hstack([col, row, ones]) @ np.linalg.inv(k.T)
    scale = np.sum(cam * rays, axis=1, keepdims=True) / np.sum(rays * rays, axis=1, keepdims=True)
    est_cam = rays * scale
    inv_proj_err = np.sqrt(np.sum((est_cam - cam) ** 2, axis=1, keepdims=True))
    return proj_err, inv_proj_err


def remap_skew(image: np.ndarray, k: np.ndarray):
    """Resample an image to remove the intrinsic skew term K[0,1].

    The "Skew correction" applied to open_dataset_pinhole images
    (ref /root/reference/tools/tools.py:21-40; WHU_TLC/readme.md:90): maps the
    image through K_noskew · K⁻¹ and zeroes the skew in the returned
    intrinsics.  Bilinear sampling, host-side.
    Returns (image_noskew, K_noskew).
    """
    k = np.asarray(k, dtype=np.float64)
    k_ns = k.copy()
    k_ns[0, 1] = 0.0
    # target pixel (x, y) ← source pixel K · K_ns⁻¹ · (x, y, 1)
    m = k @ np.linalg.inv(k_ns)
    h, w = image.shape[:2]
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    src = np.stack([xs, ys, np.ones_like(xs)], axis=-1) @ m.T
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]

    from scipy.ndimage import map_coordinates

    if image.ndim == 2:
        out = map_coordinates(image.astype(np.float64), [sy, sx], order=1, mode="constant")
    else:
        out = np.stack(
            [
                map_coordinates(image[..., c].astype(np.float64), [sy, sx], order=1, mode="constant")
                for c in range(image.shape[2])
            ],
            axis=-1,
        )
    return out.astype(image.dtype), k_ns


def fit_pinhole_from_rpc(rpc, width: int, height: int, tm=None,
                         xy_samples: int = 20, z_samples: int = 10):
    """Fit a pinhole camera K·[R|t] approximating an RPC over its validity box.

    The open_dataset_pinhole generation path (WHU_TLC/readme.md:84-110,
    VisSat-style): sample a photo-space grid, invert the RPC to (lat, lon, h),
    project object points to a local metric frame (UTM East/North/height via
    the scene's Transverse-Mercator zone), and DLT-fit.

    Returns (K, R, t, proj_err_px, inv_err_m).
    """
    from . import rpc as rpclib
    from .tmerc import TransverseMercator

    rpc = np.asarray(rpc, dtype=np.float64)
    tm = tm or TransverseMercator.utm_for(float(rpc[rpclib.LON_OFF]))

    h_min, h_max = rpclib.height_range(rpc)
    x = np.linspace(0, width - 1, xy_samples)
    y = np.linspace(0, height - 1, xy_samples)
    z = np.linspace(h_min, h_max, z_samples)
    gx, gy, gz = (g.reshape(-1) for g in np.meshgrid(x, y, z))
    lat, lon = rpclib.photo_to_obj(rpc, gx, gy, gz)
    en = tm.proj(np.stack([lat, lon], axis=-1))
    xx, yy = en[:, 0], en[:, 1]

    k, r, t = solve_perspective(xx, yy, gz, gx, gy)
    proj_err, inv_err = check_perspective_error(xx, yy, gz, gx, gy, k, r, t)
    return k, r, t, proj_err, inv_err


def compose_proj_matrix(intrinsics: np.ndarray, extrinsics: np.ndarray) -> np.ndarray:
    """4x4 projection matrix [K·E[:3]; 0 0 0 1] as the warp consumes it
    (ref /root/reference/dataset/virdataset.py:67-70)."""
    proj = np.asarray(extrinsics, dtype=np.float64).copy()
    proj[:3, :4] = intrinsics @ proj[:3, :4]
    return proj


def scale_proj_matrix(proj: np.ndarray, scale: float) -> np.ndarray:
    """Projection matrix for an image resized by `scale`: rows 0-1 scale
    (ref virdataset.py:96-105 uses scale = 1/2, 1/4 for coarser stages)."""
    out = np.asarray(proj, dtype=np.float64).copy()
    out[..., :2, :] *= scale
    return out
