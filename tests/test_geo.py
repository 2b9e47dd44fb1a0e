"""Geo-core unit tests: solver golden vectors, RPC round-trip oracle, fp32
normalized-path accuracy, QC equivalence, projections, pinhole fitting."""

import numpy as np
import jax.numpy as jnp
import pytest

from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.geo.solver import solve_iccv
from satmvs_tpu.geo.tmerc import TransverseMercator
from satmvs_tpu.geo import pinhole
from satmvs_tpu.data import synthetic


# ---------------------------------------------------------------- solver
def test_solve_iccv_golden_1():
    # golden vector from the reference's embedded self-check
    # (/root/reference/tools/iccv_solver.py:42-52)
    a = np.array(
        [
            [94.61, -22.11, -11.45, -6.96],
            [-22.11, 70.51, -6.95, -8.42],
            [-11.45, -6.95, 96.09, -20.21],
            [-6.96, -8.42, -20.21, 66.63],
        ]
    )
    l = np.array([-43.52, 178.81, -120.11, -30.07])
    x, _ = solve_iccv(a, l)
    np.testing.assert_allclose(x, [-0.1030, 2.3208, -1.2069, -0.5348], atol=1e-4)


def test_solve_iccv_golden_2():
    # (/root/reference/tools/iccv_solver.py:55-63)
    a = np.array([[5, -2, -1, -2], [-2, 5, -1, -2], [-1, -1, 3, -1], [-2, -2, -1, 5]], float)
    l = np.array([-11, 10, -2, 3], float)
    x, _ = solve_iccv(a, l)
    np.testing.assert_allclose(x, [-1.5, 1.5, -0.5, 0.5], atol=1e-8)


def test_solve_iccv_matches_direct_solve():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(30, 10))
    ata = m.T @ m + 5.0 * np.eye(10)
    atl = rng.normal(size=10)
    x, _ = solve_iccv(ata, atl)
    np.testing.assert_allclose(x, np.linalg.solve(ata, atl), atol=1e-8)


# ---------------------------------------------------------------- RPC fitting + oracle
@pytest.fixture(scope="module")
def rpc170():
    return synthetic.make_synthetic_rpc(width=256, height=256, off_nadir_deg=22.0, seed=3)


def test_check_rpc_subpixel(rpc170):
    # The reference's own correctness oracle (RPCCore.py:592-631): the fitted
    # inverse must round-trip to sub-pixel accuracy (WHU_TLC/readme.md:23).
    err = rpclib.check_rpc(rpc170, 256, 256, xy_samples=15, h_samples=8)
    assert err.max() < 0.5, err.max()
    assert np.mean(err) < 0.05


def test_refit_direct_rpc_roundtrip(rpc170):
    grid = rpclib.create_virtual_grid(rpc170, 20, 12)
    refit = rpclib.refit_direct_rpc(rpc170, grid)
    samp, line = rpclib.obj_to_photo(refit, grid[:, 2], grid[:, 3], grid[:, 4])
    np.testing.assert_allclose(samp, grid[:, 0], atol=1e-6)
    np.testing.assert_allclose(line, grid[:, 1], atol=1e-6)


def test_fp32_normalized_path_matches_fp64(rpc170):
    """The composed fp32 normalized-space projection chain must stay within
    0.01 px of the float64 absolute-coordinate path (the TPU numerics gate,
    SURVEY.md §7 step 6)."""
    src = synthetic.make_synthetic_rpc(width=256, height=256, off_nadir_deg=-22.0, seed=11)
    rng = np.random.default_rng(1)
    n = 4096
    x = rng.uniform(0, 255, n)
    y = rng.uniform(0, 255, n)
    h = rng.uniform(*rpclib.height_range(rpc170), n)

    # float64 oracle: absolute coordinates
    lat, lon = rpclib.photo_to_obj(rpc170, x, y, h)
    samp64, line64 = rpclib.obj_to_photo(src, lat, lon, h)

    # fp32 device path: normalized coords + host-computed renorm affine
    aff = rpclib.renorm_affine(rpc170, src).astype(np.float32)
    xn = ((x - rpc170[rpclib.SAMP_OFF]) / rpc170[rpclib.SAMP_SCALE]).astype(np.float32)
    yn = ((y - rpc170[rpclib.LINE_OFF]) / rpc170[rpclib.LINE_SCALE]).astype(np.float32)
    hn = ((h - rpc170[rpclib.HEI_OFF]) / rpc170[rpclib.HEI_SCALE]).astype(np.float32)
    inv_c = rpclib.inv_coef_matrix(rpc170).astype(np.float32)
    fwd_c = rpclib.fwd_coef_matrix(src).astype(np.float32)

    lat_n, lon_n = rpclib.photo_to_obj_n(jnp.asarray(inv_c), jnp.asarray(xn), jnp.asarray(yn), jnp.asarray(hn))
    lat_ns = lat_n * aff[0, 0] + aff[0, 1]
    lon_ns = lon_n * aff[1, 0] + aff[1, 1]
    h_ns = jnp.asarray(hn) * aff[2, 0] + aff[2, 1]
    samp_n, line_n = rpclib.obj_to_photo_n(jnp.asarray(fwd_c), lat_ns, lon_ns, h_ns)
    samp32 = np.asarray(samp_n, np.float64) * src[rpclib.SAMP_SCALE] + src[rpclib.SAMP_OFF]
    line32 = np.asarray(line_n, np.float64) * src[rpclib.LINE_SCALE] + src[rpclib.LINE_OFF]

    err = np.hypot(samp32 - samp64, line32 - line64)
    assert err.max() < 0.01, err.max()


def test_qc_tensor_equivalence(rpc170):
    """QC (4,4,4) symmetric-tensor evaluation == 20-term basis evaluation
    (ref data_io.py:95-150 / rpc_tensor.py:24-77)."""
    rng = np.random.default_rng(2)
    p, l, h = rng.uniform(-1, 1, (3, 100))
    for sl in (rpclib.SNUM, rpclib.LDEM, rpclib.LATNUM, rpclib.LONDEM):
        c20 = np.asarray(rpc170[sl])
        t = rpclib.to_qc_tensor(c20)
        x = np.stack([np.ones_like(l), l, p, h], axis=-1)
        got = rpclib.qc_eval(t, x)
        want = synthetic.rpclib.poly_basis(p, l, h) @ c20
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_scale_and_crop_rpc(rpc170):
    lat = rpc170[rpclib.LAT_OFF] + 0.3 * rpc170[rpclib.LAT_SCALE]
    lon = rpc170[rpclib.LON_OFF] - 0.2 * rpc170[rpclib.LON_SCALE]
    h = rpc170[rpclib.HEI_OFF]
    s, l = rpclib.obj_to_photo(rpc170, np.array([lat]), np.array([lon]), np.array([h]))

    half = rpclib.scale_rpc(rpc170, 0.5)
    s2, l2 = rpclib.obj_to_photo(half, np.array([lat]), np.array([lon]), np.array([h]))
    np.testing.assert_allclose([s2, l2], [s / 2, l / 2], rtol=1e-12)

    # jnp path must agree
    half_j = rpclib.scale_rpc(jnp.asarray(rpc170), 0.5)
    np.testing.assert_allclose(np.asarray(half_j), half, rtol=1e-6)

    cropped = rpclib.crop_rpc(rpc170, start_w=10.0, start_h=20.0)
    s3, l3 = rpclib.obj_to_photo(cropped, np.array([lat]), np.array([lon]), np.array([h]))
    np.testing.assert_allclose([s3, l3], [s - 10, l - 20], rtol=1e-9)


# ---------------------------------------------------------------- Transverse Mercator
def test_tmerc_roundtrip():
    tm = TransverseMercator.whu_tlc()
    rng = np.random.default_rng(0)
    lat = rng.uniform(25, 45, 100)
    lon = rng.uniform(-140, -130, 100)
    pts = np.stack([lat, lon], axis=-1)
    en = tm.proj(pts)
    back = tm.proj(en, reverse=True)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_tmerc_ground_distance():
    # the reference's __main__ check (Transverse_Mercator.py:229-247): two
    # points (3.6e-7 deg lat, 4.3e-7 deg lon) apart; great-circle separation
    # is hypot(0.0401 m, 0.0417 m) ≈ 0.0578 m and the projected distance must
    # match it to well under a millimeter at this scale.
    tm = TransverseMercator(lon_origin=123.0, false_easting=500000.0, scale_factor=1.0)
    pts = np.array([[29.267563, 120.653181], [29.26756264, 120.65318143]])
    en = tm.proj(pts)
    d = np.hypot(*(en[0] - en[1]))
    assert abs(d - 0.0578) < 5e-4, d


def test_tmerc_jnp_matches_numpy():
    tm = TransverseMercator.whu_tlc()
    pts = np.array([[30.0, -134.0], [31.5, -136.0]])
    en_np = tm.proj(pts)
    # fp32 on device: ulp ~0.4 m at N≈3.3e6 m — the device path is for
    # visualization/debug only; DSM georeferencing uses the host fp64 path.
    en_j = tm.proj(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(en_j), en_np, rtol=0, atol=1.5)


# ---------------------------------------------------------------- pinhole
def test_solve_perspective_recovers_camera():
    rng = np.random.default_rng(4)
    k = np.array([[1200.0, 0.0, 320.0], [0.0, 1200.0, 240.0], [0.0, 0.0, 1.0]])
    # small rotation + translation
    angle = 0.1
    r = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    t = np.array([[5.0], [-3.0], [50.0]])
    pts = rng.uniform(-10, 10, (200, 3)) + np.array([0, 0, 100.0])
    cam = pts @ r.T + t.T
    proj = cam @ k.T
    col = proj[:, 0] / proj[:, 2]
    row = proj[:, 1] / proj[:, 2]

    k2, r2, t2 = pinhole.solve_perspective(pts[:, 0], pts[:, 1], pts[:, 2], col, row)
    proj_err, inv_err = pinhole.check_perspective_error(
        pts[:, 0], pts[:, 1], pts[:, 2], col, row, k2, r2, t2
    )
    assert proj_err.max() < 1e-6
    assert inv_err.max() < 1e-6
    np.testing.assert_allclose(k2, k, rtol=1e-6, atol=1e-4)


def test_proj_matrix_helpers():
    k = np.array([[1000.0, 0.0, 100.0], [0.0, 1000.0, 100.0], [0.0, 0.0, 1.0]])
    e = np.eye(4)
    e[:3, 3] = [1.0, 2.0, 3.0]
    p = pinhole.compose_proj_matrix(k, e)
    assert p.shape == (4, 4)
    np.testing.assert_allclose(p[3], [0, 0, 0, 1])
    half = pinhole.scale_proj_matrix(p, 0.5)
    np.testing.assert_allclose(half[:2], p[:2] * 0.5)
    np.testing.assert_allclose(half[2:], p[2:])
