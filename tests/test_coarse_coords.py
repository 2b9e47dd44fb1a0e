"""Coarse-grid projection accuracy gates vs the exact per-pixel chain."""

import numpy as np
import jax.numpy as jnp

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.ops import warp as warplib
from satmvs_tpu.ops.coarse_coords import rpc_sweep_coords_coarse, _lerp_upsample_axis


def test_lerp_upsample_exact_on_linear():
    # linear fields upsample exactly
    c = jnp.asarray(np.arange(0, 36, 4, dtype=np.float32))[None]  # samples at 0,4,...
    fine = _lerp_upsample_axis(c, 4, -1, 32)
    np.testing.assert_allclose(np.asarray(fine[0]), np.arange(32, dtype=np.float32), atol=1e-5)


def _cams(h=96, w=96, seed=0):
    rpcs = synthetic.make_rpc_triplet(4 * w, 4 * h, seed=seed)
    return warplib.build_stage_cams(np.stack([rpcs[2], rpcs[0]]), 0, 3)[0], rpcs[2]


def test_coarse_matches_exact_per_plane():
    cams, ref = _cams()
    h_min, h_max = rpclib.height_range(ref)
    depths = jnp.linspace(h_min, h_max, 8, dtype=jnp.float32)
    xe, ye = warplib.rpc_sweep_coords(cams, 0, depths, 96, 96)
    xc, yc = rpc_sweep_coords_coarse(cams, 0, depths, 96, 96, factor=4)
    err = np.hypot(np.asarray(xc - xe), np.asarray(yc - ye))
    assert err.max() < 5e-3, err.max()


def test_coarse_matches_exact_per_pixel_window():
    """Stage-2/3 style per-pixel hypotheses (terrain ± window)."""
    cams, ref = _cams(seed=3)
    rng = np.random.default_rng(0)
    h0 = ref[rpclib.HEI_OFF]
    terrain = h0 + 80.0 * rng.standard_normal((96, 96)).astype(np.float32)
    from satmvs_tpu.ops.depth_range import window_samples

    hyps = window_samples(jnp.asarray(terrain), 8, 5.0)  # (8, 96, 96)
    xe, ye = warplib.rpc_sweep_coords(cams, 0, hyps, 96, 96)
    xc, yc = rpc_sweep_coords_coarse(cams, 0, hyps, 96, 96, factor=4)
    err = np.hypot(np.asarray(xc - xe), np.asarray(yc - ye))
    assert err.max() < 2e-2, err.max()


def test_coarse_non_multiple_size():
    cams, ref = _cams()
    depths = jnp.asarray([ref[rpclib.HEI_OFF]], jnp.float32)
    xc, yc = rpc_sweep_coords_coarse(cams, 0, depths, 90, 93, factor=4)
    xe, ye = warplib.rpc_sweep_coords(cams, 0, depths, 90, 93)
    err = np.hypot(np.asarray(xc - xe), np.asarray(yc - ye))
    assert err.max() < 5e-3, err.max()
