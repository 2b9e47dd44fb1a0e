"""Ops-layer tests: bilinear sampling semantics, RPC/homography warp geometry,
variance cost volume (incl. the view-sharded psum golden test), samplers,
regression."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.data import synthetic
from satmvs_tpu.ops import sampling, warp, cost_volume, depth_range, regression


# ---------------------------------------------------------------- sampling
def test_bilinear_sample_exact_and_interp():
    feat = jnp.arange(12.0).reshape(3, 4, 1)
    # integer coordinates hit pixels exactly
    out = sampling.bilinear_sample(feat, jnp.array([0.0, 3.0]), jnp.array([0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out)[:, 0], [0.0, 11.0])
    # halfway between columns
    out = sampling.bilinear_sample(feat, jnp.array([0.5]), jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], 0.5)
    # halfway between rows
    out = sampling.bilinear_sample(feat, jnp.array([0.0]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], 2.0)


def test_bilinear_sample_zero_padding():
    feat = jnp.ones((4, 4, 2))
    # fully outside → 0; half outside → 0.5 (blend with zeros)
    out = sampling.bilinear_sample(feat, jnp.array([-2.0, -0.5]), jnp.array([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out)[0], [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out)[1], [0.5, 0.5])


def test_bilinear_sample_scalar_fill():
    img = jnp.ones((4, 4))
    out = sampling.bilinear_sample_scalar(img, jnp.array([-3.0, 1.0]), jnp.array([0.0, 1.0]), fill=-999.0)
    np.testing.assert_allclose(np.asarray(out), [-999.0, 1.0])


def test_bilinear_matches_scipy():
    from scipy.ndimage import map_coordinates

    rng = np.random.default_rng(0)
    img = rng.normal(size=(17, 23)).astype(np.float32)
    x = rng.uniform(0, 22, 200)
    y = rng.uniform(0, 16, 200)
    got = sampling.bilinear_sample(jnp.asarray(img)[..., None], jnp.asarray(x), jnp.asarray(y))[:, 0]
    want = map_coordinates(img, [y, x], order=1, mode="constant")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


# ---------------------------------------------------------------- RPC warp
def test_rpc_warp_identity():
    """Warping the reference view through its own RPC must reproduce it
    (round-trip of the full normalized fp32 chain through the sampler)."""
    rpc = synthetic.make_synthetic_rpc(width=64, height=64, off_nadir_deg=22.0, seed=5)
    cams = warp.build_rpc_warp_cams(np.stack([rpc, rpc]), ref_index=0)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(64, 64, 8)).astype(np.float32))
    h0 = rpc[rpclib.HEI_OFF]
    depths = jnp.asarray(np.array([h0 - 200, h0, h0 + 200], np.float32))
    out = warp.rpc_warp(feat, cams, 0, depths)
    assert out.shape == (3, 64, 64, 8)
    # interior pixels must match the original features (borders blend zeros)
    err = np.abs(np.asarray(out)[:, 2:-2, 2:-2] - np.asarray(feat)[None, 2:-2, 2:-2])
    assert err.max() < 1e-2, err.max()


def test_rpc_sweep_coords_match_fp64():
    """Device sweep coords vs float64 absolute-coordinate composition."""
    rpcs = synthetic.make_rpc_triplet(96, 96, seed=2)
    cams = warp.build_rpc_warp_cams(np.stack([rpcs[2], rpcs[0]]), ref_index=0)
    ref, src = rpcs[2], rpcs[0]
    h = np.float64(ref[rpclib.HEI_OFF] + 137.0)
    xg, yg = np.meshgrid(np.arange(96, dtype=np.float64), np.arange(96, dtype=np.float64))
    lat, lon = rpclib.photo_to_obj(ref, xg.ravel(), yg.ravel(), np.full(96 * 96, h))
    sx64, sy64 = rpclib.obj_to_photo(src, lat, lon, np.full(96 * 96, h))

    xs, ys = warp.rpc_sweep_coords(cams, 0, jnp.asarray([h], jnp.float32), 96, 96)
    err = np.hypot(np.asarray(xs[0], np.float64).ravel() - sx64, np.asarray(ys[0], np.float64).ravel() - sy64)
    assert err.max() < 0.01, err.max()


def test_rpc_warp_stage_scaling_consistency():
    """A half-resolution stage warp must land at half the full-res coords."""
    rpcs = synthetic.make_rpc_triplet(128, 128, seed=4)
    full = warp.build_rpc_warp_cams(np.stack([rpcs[2], rpcs[0]]), 0, stage_scale=1.0)
    half = warp.build_rpc_warp_cams(np.stack([rpcs[2], rpcs[0]]), 0, stage_scale=0.5)
    h = jnp.asarray([rpcs[2][rpclib.HEI_OFF]], jnp.float32)
    xf, yf = warp.rpc_sweep_coords(full, 0, h, 128, 128)
    xh, yh = warp.rpc_sweep_coords(half, 0, h, 64, 64)
    np.testing.assert_allclose(np.asarray(xh[0]), np.asarray(xf[0, ::2, ::2]) / 2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(yh[0]), np.asarray(yf[0, ::2, ::2]) / 2, atol=5e-2)


# ---------------------------------------------------------------- homography warp
def _simple_cam(f, cx, cy, tx):
    k = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    e = np.eye(4)
    e[0, 3] = tx
    p = np.eye(4)
    p[:3, :4] = k @ e[:3, :4]
    return p


def test_homo_warp_identity_and_shift():
    h = w = 32
    ref = _simple_cam(100.0, w / 2, h / 2, 0.0)
    # identical camera → identity warp at any depth
    xs, ys = warp.homo_sweep_coords(jnp.asarray(ref, jnp.float32), jnp.asarray(ref, jnp.float32),
                                    jnp.asarray([10.0, 50.0], jnp.float32), h, w)
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(xs[0]), gx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ys[1]), gy, atol=1e-3)

    # translated camera → disparity = f * baseline / depth
    src = _simple_cam(100.0, w / 2, h / 2, 2.0)
    xs, ys = warp.homo_sweep_coords(jnp.asarray(src, jnp.float32), jnp.asarray(ref, jnp.float32),
                                    jnp.asarray([40.0], jnp.float32), h, w)
    np.testing.assert_allclose(np.asarray(xs[0]) - gx, 100.0 * 2.0 / 40.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ys[0]), gy, atol=1e-3)


# ---------------------------------------------------------------- cost volume
def test_variance_volume_matches_direct():
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.normal(size=(8, 8, 4)).astype(np.float32))
    srcs = [jnp.asarray(rng.normal(size=(5, 8, 8, 4)).astype(np.float32)) for _ in range(2)]
    got = cost_volume.variance_cost_volume(ref, srcs)
    stack = np.stack([np.broadcast_to(np.asarray(ref)[None], (5, 8, 8, 4))] + [np.asarray(s) for s in srcs])
    want = stack.var(axis=0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_variance_volume_view_sharded_psum():
    """Golden test from SURVEY §4: per-chip (Σf, Σf²) view-sharded variance
    equals the serial loop."""
    if len(jax.devices()) < 2:
        return
    rng = np.random.default_rng(2)
    ref = jnp.asarray(rng.normal(size=(8, 8, 4)).astype(np.float32))
    srcs = jnp.asarray(rng.normal(size=(2, 5, 8, 8, 4)).astype(np.float32))

    serial = cost_volume.variance_cost_volume(ref, [srcs[0], srcs[1]])

    mesh = Mesh(np.array(jax.devices()[:2]), ("view",))

    def sharded(ref_feat, src_block):
        # each shard sees 1 source view; shard 0 also owns the reference view
        own_ref = jax.lax.axis_index("view") == 0
        r = jnp.where(own_ref, 1.0, 0.0) * ref_feat
        vol_sum = jnp.sum(src_block, axis=0) + r[None] * jnp.ones((5, 1, 1, 1))
        vol_sq = jnp.sum(src_block**2, axis=0) + (r * r)[None] * jnp.ones((5, 1, 1, 1))
        vol_sum = jax.lax.psum(vol_sum, "view")
        vol_sq = jax.lax.psum(vol_sq, "view")
        return cost_volume.variance_from_moments(vol_sum, vol_sq, 3)

    f = shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P("view")),
        out_specs=P(),
    )
    got = f(ref, srcs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(serial), atol=1e-5)


# ---------------------------------------------------------------- samplers
def test_uniform_samples_endpoints():
    s = depth_range.uniform_samples(100.0, 200.0, 5, 3, 4)
    assert s.shape == (5, 3, 4)
    np.testing.assert_allclose(np.asarray(s[0]), 100.0)
    np.testing.assert_allclose(np.asarray(s[-1]), 200.0)
    np.testing.assert_allclose(np.asarray(s[1, 0, 0]), 125.0)


def test_window_samples_centered():
    cur = jnp.full((4, 4), 500.0)
    s = depth_range.window_samples(cur, 8, 2.5)
    assert s.shape == (8, 4, 4)
    np.testing.assert_allclose(np.asarray(s[0]), 500.0 - 10.0)   # −(8/2)·2.5
    np.testing.assert_allclose(np.asarray(s[-1]), 500.0 + 10.0)
    # mean of symmetric window = center
    np.testing.assert_allclose(np.asarray(s.mean(0)), 500.0, rtol=1e-6)


def test_uncertainty_samples_clamped():
    cur = jnp.full((2, 2), 500.0)
    var = jnp.full((2, 2), 1000.0)  # window exceeds range → clamps
    s = depth_range.uncertainty_samples(cur, var, 4, 0.0, 600.0)
    np.testing.assert_allclose(np.asarray(s[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s[-1]), 600.0, atol=1e-5)


# ---------------------------------------------------------------- regression
def test_depth_regression_onehot_and_uniform():
    d, h, w = 6, 3, 3
    vals = jnp.arange(d, dtype=jnp.float32) * 10
    onehot = jnp.zeros((d, h, w)).at[2].set(1.0)
    np.testing.assert_allclose(np.asarray(regression.depth_regression(onehot, vals)), 20.0)
    uniform = jnp.full((d, h, w), 1.0 / d)
    np.testing.assert_allclose(np.asarray(regression.depth_regression(uniform, vals)), 25.0, rtol=1e-6)


def test_window_confidence_brute_force():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(16, 5, 5)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(0, keepdims=True)
    got = np.asarray(regression.window_prob_confidence(jnp.asarray(prob), window=4))

    # brute force: pad 1 front / 2 back, sum 4 planes at the regressed index
    padded = np.pad(prob, ((1, 2), (0, 0), (0, 0)))
    idx = np.clip(
        (prob * np.arange(16)[:, None, None]).sum(0).astype(np.int32), 0, 15
    )
    want = np.zeros((5, 5), np.float32)
    for i in range(5):
        for j in range(5):
            want[i, j] = padded[idx[i, j] : idx[i, j] + 4, i, j].sum()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_expected_variance():
    d = 8
    vals = jnp.arange(d, dtype=jnp.float32)
    prob = jnp.full((d, 2, 2), 1.0 / d)
    depth = regression.depth_regression(prob, vals)
    ev = regression.expected_variance(prob, vals, depth, lamb=1.5)
    want = 1.5 * np.sqrt(np.mean((np.arange(d) - 3.5) ** 2))
    np.testing.assert_allclose(np.asarray(ev), want, rtol=1e-5)


def test_sweep_coverage_validator():
    """The coverage gate reports zero for a sane synthetic triplet and
    nonzero when the stencil is too small for the geometry."""
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.ops.warp import sweep_coverage_misses

    rpcs = np.stack(synthetic.make_rpc_triplet(256, 256, seed=3))
    misses = sweep_coverage_misses(rpcs[[2, 0, 1]], 0, 128, 128, num_stage=3)
    assert set(misses) == {1, 2, 3}
    assert all(v == 0 for v in misses.values()), misses

    # a 0-tap stencil cannot cover bilinear corners → must report drops
    tight = sweep_coverage_misses(rpcs[[2, 0, 1]], 0, 128, 128, num_stage=3,
                                  stencil=0)
    assert sum(tight.values()) > 0
