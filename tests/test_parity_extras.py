"""Parity extras: QC-form warp equivalence, skew-removal resample,
RPC→pinhole fitting pipeline."""

import numpy as np
import jax.numpy as jnp

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import pinhole, rpc as rpclib
from satmvs_tpu.ops import warp as warplib


def test_qc_sweep_matches_basis_sweep():
    """The QC-tensor formulation must agree with the 20-term basis path
    (they are the same polynomials; ref modules/warping.py:47-178)."""
    rpcs = synthetic.make_rpc_triplet(96, 96, seed=6)
    pair = np.stack([rpcs[2], rpcs[0]])
    cams = warplib.build_rpc_warp_cams(pair, 0)
    qc = warplib.build_qc_warp_cams(pair, 0)
    h0 = rpcs[2][rpclib.HEI_OFF]
    depths = jnp.asarray([h0 - 100, h0, h0 + 150], jnp.float32)
    x1, y1 = warplib.rpc_sweep_coords(cams, 0, depths, 96, 96)
    x2, y2 = warplib.rpc_sweep_coords_qc(qc, 0, depths, 96, 96)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-2)


def test_remap_skew():
    k = np.array([[500.0, 25.0, 64.0], [0.0, 500.0, 64.0], [0.0, 0.0, 1.0]])
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (128, 128)).astype(np.float32)
    out, k_ns = pinhole.remap_skew(img, k)
    assert k_ns[0, 1] == 0.0
    assert out.shape == img.shape
    # a point projected by K maps to the same object ray as K_ns in the
    # corrected image: check center pixel consistency (skew-free at cx, cy)
    assert abs(float(out[64, 64]) - float(img[64, 64])) < 30.0
    # with zero skew the resample is identity
    k0 = k.copy()
    k0[0, 1] = 0.0
    out0, _ = pinhole.remap_skew(img, k0)
    np.testing.assert_allclose(out0, img, atol=1e-3)


def test_fit_pinhole_from_rpc():
    """The open_dataset_pinhole generation path: a pinhole camera fitted from
    an RPC must reproject the control grid with small pixel error
    (WHU_TLC/readme.md:84-110)."""
    rpc = synthetic.make_synthetic_rpc(128, 128, off_nadir_deg=22.0, seed=8)
    k, r, t, proj_err, inv_err = pinhole.fit_pinhole_from_rpc(rpc, 128, 128)
    assert np.median(proj_err) < 1.0, np.median(proj_err)
    assert k[0, 0] > 0 and k[1, 1] > 0
    assert abs(np.linalg.det(r) - 1) < 1e-6
