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
