"""Inference-layer tests: streaming-scan == full-volume golden equivalence,
geometric-consistency fusion on a true-geometry synthetic scene, DSM
rasterization, tiling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.geo.tmerc import TransverseMercator
from satmvs_tpu.infer import fuse, tiling
from satmvs_tpu.infer.predict import streaming_red_forward
from satmvs_tpu.models import CascadeREDNet
from satmvs_tpu.train.loop import numeric_batch


def test_streaming_matches_full_volume():
    """The online-softmax plane scan must reproduce the full-volume softmax
    forward exactly (the mathematical spec of the reference's streaming
    inference, casred.py:219-236 / SURVEY §4)."""
    batch = numeric_batch(synthetic.make_batch(batch_size=1, width=32, height=32))
    ndepths = (8, 4, 4)
    model = CascadeREDNet(geo_model="rpc", ndepths=ndepths)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"], batch["cams"], batch["depth_values"], train=False,
    )
    full = model.apply(variables, batch["imgs"], batch["cams"], batch["depth_values"], train=False)
    stream = streaming_red_forward(
        variables, batch["imgs"], batch["cams"], batch["depth_values"],
        geo_model="rpc", ndepths=ndepths,
    )
    for k in ("stage1", "stage2", "stage3"):
        np.testing.assert_allclose(
            np.asarray(stream[k]["depth"]), np.asarray(full[k]["depth"]),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(stream[k]["photometric_confidence"]),
            np.asarray(full[k]["photometric_confidence"]),
            rtol=1e-4, atol=1e-4,
        )


def test_streaming_slab_matches_plane_streaming():
    """Slab streaming (k planes per scan step, GRU state handed between
    slabs) must equal the plane-at-a-time stream — same math, kernel-shaped
    steps."""
    batch = numeric_batch(synthetic.make_batch(batch_size=1, width=32, height=32))
    ndepths = (8, 4, 4)
    model = CascadeREDNet(geo_model="rpc", ndepths=ndepths)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"], batch["cams"], batch["depth_values"], train=False,
    )
    args = (variables, batch["imgs"], batch["cams"], batch["depth_values"])
    plane = streaming_red_forward(*args, geo_model="rpc", ndepths=ndepths)
    for k in (2, 4):
        slabbed = streaming_red_forward(*args, geo_model="rpc",
                                        ndepths=ndepths, slab=k)
        for st in ("stage1", "stage2", "stage3"):
            np.testing.assert_allclose(
                np.asarray(slabbed[st]["depth"]), np.asarray(plane[st]["depth"]),
                rtol=1e-4, atol=1e-3, err_msg=f"slab={k} {st}",
            )
            np.testing.assert_allclose(
                np.asarray(slabbed[st]["photometric_confidence"]),
                np.asarray(plane[st]["photometric_confidence"]),
                rtol=1e-4, atol=1e-4,
            )


def test_filter_depth_rpc_consistent_scene():
    """True-geometry multi-view heights must pass the consistency check and
    fuse to ~the reference-view ground truth."""
    scene = synthetic.make_scene(64, 64, seed=3, h_amp=60.0)
    order = [2, 0, 1]
    depths = scene["gt_heights"][order]
    rpcs = scene["rpcs"][order]
    mask, fused = fuse.filter_depth_rpc(depths, rpcs, p_ratio=1.0, d_ratio=2.5,
                                        geo_consist_num=2)
    interior = mask[8:-8, 8:-8]
    assert interior.mean() > 0.9, interior.mean()
    err = np.abs(fused - depths[0])[8:-8, 8:-8][interior]
    assert np.median(err) < 1.0, np.median(err)


def test_filter_depth_rpc_rejects_inconsistent():
    scene = synthetic.make_scene(64, 64, seed=3, h_amp=60.0)
    order = [2, 0, 1]
    depths = scene["gt_heights"][order].copy()
    depths[1] += 100.0  # corrupt one source view
    depths[2] += 100.0
    mask, _ = fuse.filter_depth_rpc(depths, scene["rpcs"][order],
                                    p_ratio=1.0, d_ratio=2.5, geo_consist_num=1)
    assert mask.mean() < 0.1, mask.mean()


def test_filter_depth_photometric_gate():
    scene = synthetic.make_scene(48, 48, seed=5, h_amp=40.0)
    order = [2, 0, 1]
    depths = scene["gt_heights"][order]
    prob = np.zeros(depths[0].shape, np.float32)
    prob[:24] = 0.9
    mask, _ = fuse.filter_depth_rpc(depths, scene["rpcs"][order],
                                    p_ratio=1.0, d_ratio=2.5, geo_consist_num=1,
                                    prob=prob, confidence_ratio=0.5)
    assert mask[28:].sum() == 0  # low-confidence half gated out


def test_filter_depth_pinhole_identity():
    rng = np.random.default_rng(0)
    depth = rng.uniform(40, 60, (32, 32)).astype(np.float32)
    k = np.array([[100.0, 0, 16.0], [0, 100.0, 16.0], [0, 0, 1]])
    p = np.eye(4)
    p[:3, :4] = k @ np.eye(4)[:3, :4]
    projs = np.stack([p, p])
    mask, fused = fuse.filter_depth_pinhole(np.stack([depth, depth]), projs,
                                            p_thre=1.0, rel_d_thre=0.01)
    assert mask[1:-1, 1:-1].all()
    np.testing.assert_allclose(fused[1:-1, 1:-1], depth[1:-1, 1:-1], rtol=1e-4)


def test_rasterize_dsm_grid_means():
    tm = TransverseMercator.whu_tlc()
    # two clusters of points at known lat/lon with known heights
    lat = np.array([30.0, 30.0, 30.001])
    lon = np.array([-134.0, -134.0, -134.0])
    h = np.array([100.0, 200.0, 50.0])
    mask = np.ones(3, bool)
    dsm, e_ul, n_ul = fuse.rasterize_dsm(lat, lon, h, mask, tm, grid_res=5.0)
    vals = dsm[dsm != fuse.INVALID_DEPTH]
    assert 150.0 in vals  # co-located pair averaged
    assert 50.0 in vals


def test_fuse_scene_to_dsm(tmp_path):
    scene = synthetic.make_scene(48, 48, seed=7, h_amp=50.0)
    order = [2, 0, 1]
    path, mask, fused = fuse.fuse_scene_to_dsm(
        scene["gt_heights"][order], scene["rpcs"][order],
        str(tmp_path / "dsm.tif"), grid_res=5.0, geo_consist_num=1,
    )
    from satmvs_tpu.data import formats

    dsm, tfw = formats.read_dsm(path)
    assert np.isfinite(dsm).all()
    valid = dsm != fuse.INVALID_DEPTH
    assert valid.mean() > 0.3
    # fused heights should be in the scene's height range
    hr = scene["h_range"]
    assert dsm[valid].min() > hr[0] - 10 and dsm[valid].max() < hr[1] + 10


def test_tiling_partition_and_stitch():
    rng = np.random.default_rng(0)
    scene = rng.normal(size=(200, 300)).astype(np.float32)
    tiles = tiling.plan_tiles(200, 300, tile=96, halo=32, multiple=32)
    # interiors partition the scene
    cover = np.zeros((200, 300), np.int32)
    for t in tiles:
        cover[t.core_row0 : t.core_row0 + t.core_height,
              t.core_col0 : t.core_col0 + t.core_width] += 1
        assert t.row0 <= t.core_row0 and t.col0 <= t.core_col0
        assert t.row0 + t.height >= t.core_row0 + t.core_height
    assert (cover == 1).all()
    # identity "prediction" stitches back exactly
    outs = [tiling.extract(scene, t) for t in tiles]
    np.testing.assert_array_equal(tiling.stitch(tiles, outs, 200, 300), scene)
    # uniform tile extents: ragged edge cores must NOT produce extra tile
    # shapes — every distinct shape costs a full jit/Mosaic recompile of the
    # tile forward (~3 min at production geometry; NOTES round-4)
    assert len({(t.height, t.width) for t in tiles}) == 1
    for sh, sw in ((2560, 2560), (2000, 1500)):
        big = tiling.plan_tiles(sh, sw, tile=384, halo=32)
        assert {(t.height, t.width) for t in big} == {(448, 448)}, (sh, sw)


@pytest.mark.parametrize("batch_size", [1, 2])
def test_streaming_fused_slab_matches_plane_streaming(batch_size):
    """The TPU fused slab path (row-packed pipeline + state-seeded fused
    recurrence, exercised on CPU via auto-interpret) must equal the
    plane-at-a-time stream.  batch_size=2 covers the batched grid=(B, D)
    pipeline (per-element state reseeding in one kernel —
    packed_red_pipeline_batched)."""
    batch = numeric_batch(
        synthetic.make_batch(batch_size=batch_size, width=32, height=32)
    )
    ndepths = (8, 4, 4)
    model = CascadeREDNet(geo_model="rpc", ndepths=ndepths)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"], batch["cams"], batch["depth_values"], train=False,
    )
    args = (variables, batch["imgs"], batch["cams"], batch["depth_values"])
    plane = streaming_red_forward(*args, geo_model="rpc", ndepths=ndepths)
    fused = streaming_red_forward(*args, geo_model="rpc", ndepths=ndepths,
                                  slab=4, fused=True)
    for k in ("stage1", "stage2", "stage3"):
        np.testing.assert_allclose(
            np.asarray(fused[k]["depth"]), np.asarray(plane[k]["depth"]),
            rtol=1e-4, atol=1e-3,
        )
