"""Whole-scene tiled prediction tests: seam consistency and geometry of the
per-tile RPC cropping."""

import numpy as np
import jax
import jax.numpy as jnp

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.infer.scene import predict_scene
from satmvs_tpu.models import CascadeREDNet
from satmvs_tpu.ops import warp as warplib


def test_crop_rpc_tile_geometry():
    """A tile's cropped RPC must project scene points to tile-local pixels."""
    rpc = synthetic.make_synthetic_rpc(128, 128, off_nadir_deg=22.0, seed=2)
    cropped = rpclib.crop_rpc(rpc, start_w=32.0, start_h=48.0)
    lat = rpc[rpclib.LAT_OFF] + 0.2 * rpc[rpclib.LAT_SCALE]
    lon = rpc[rpclib.LON_OFF] - 0.1 * rpc[rpclib.LON_SCALE]
    h = rpc[rpclib.HEI_OFF]
    s0, l0 = rpclib.obj_to_photo(rpc, np.array([lat]), np.array([lon]), np.array([h]))
    s1, l1 = rpclib.obj_to_photo(cropped, np.array([lat]), np.array([lon]), np.array([h]))
    np.testing.assert_allclose(s1, s0 - 32.0, rtol=1e-10)
    np.testing.assert_allclose(l1, l0 - 48.0, rtol=1e-10)


def test_predict_scene_seamless():
    """Tiled whole-scene prediction must agree with a single full-scene
    forward away from image borders (same model, same weights)."""
    size = 96
    scene = synthetic.make_scene(size, size, seed=9, h_amp=50.0)
    order = [2, 0, 1]
    images = scene["images"][order]
    rpcs = scene["rpcs"][order]

    model = CascadeREDNet(geo_model="rpc", ndepths=(8, 4, 4))
    # init on the tile shape (64x64 incl. halo)
    from satmvs_tpu.data.preprocess import center_image

    imgs0 = np.stack([center_image(np.repeat(im[..., None], 3, -1)) for im in images])[None]
    cams0 = tuple(
        warplib.stack_cams([c]) for c in warplib.build_stage_cams(rpcs, 0, 3)
    )
    h_min, h_max = rpclib.height_range(rpcs[0])
    dvals = jnp.asarray([[h_min, h_max]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0), cams0, dvals, train=False)

    def forward(imgs, cams, dv):
        return model.apply(variables, imgs, cams, dv, train=False)

    # full-scene single forward (96x96 fits)
    full = forward(jnp.asarray(imgs0), cams0, dvals)
    full_depth = np.asarray(full["depth"][0])

    depth, conf = predict_scene(
        forward, images, rpcs, tile=64, halo=32, num_stage=3, ref_index=0,
    )
    assert depth.shape == (size, size)
    assert np.isfinite(depth).all()
    assert conf.min() >= 0

    # interior agreement: tiles see slightly different normalization +
    # borders, so compare medians / correlation rather than exact equality
    inner = np.s_[16:-16, 16:-16]
    d_t = depth[inner]
    d_f = full_depth[inner]
    # both must land in the scene height range and correlate strongly
    assert d_t.min() > h_min - 1 and d_t.max() < h_max + 1
    cc = np.corrcoef(d_t.ravel(), d_f.ravel())[0, 1]
    assert cc > 0.95, cc

    # ---- tile-parallel: 4 tiles per forward, batch sharded over a 4-chip
    # mesh's data axis, must reproduce the serial tile loop
    from satmvs_tpu.dist.mesh import make_mesh

    mesh = make_mesh(data=4)
    depth_p, conf_p = predict_scene(
        forward, images, rpcs, tile=64, halo=32, num_stage=3, ref_index=0,
        batch_tiles=4, mesh=mesh,
    )
    np.testing.assert_allclose(depth_p, depth, atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(conf_p, conf, atol=1e-4)


def test_streaming_shard_map_matches_serial():
    """The slab-streaming tile forward has no GSPMD partitioning rule for
    its pallas_calls, so predict_scene wraps it in shard_map over the data
    axis (scripts/predict_scene.py) — each device traces its LOCAL tile
    sub-batch.  Sharded 4-tile batches must reproduce the serial loop."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from satmvs_tpu.dist.mesh import make_mesh
    from satmvs_tpu.infer.predict import streaming_red_forward

    size = 96
    scene = synthetic.make_scene(size, size, seed=9, h_amp=50.0)
    order = [2, 0, 1]
    images = scene["images"][order]
    rpcs = scene["rpcs"][order]

    ndepths = (8, 4, 4)
    model = CascadeREDNet(geo_model="rpc", ndepths=ndepths)
    from satmvs_tpu.data.preprocess import center_image

    imgs0 = np.stack([center_image(np.repeat(im[..., None], 3, -1))
                      for im in images])[None]
    cams0 = tuple(
        warplib.stack_cams([c]) for c in warplib.build_stage_cams(rpcs, 0, 3)
    )
    h_min, h_max = rpclib.height_range(rpcs[0])
    dvals = jnp.asarray([[h_min, h_max]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0), cams0,
                           dvals, train=False)

    inner = partial(streaming_red_forward, variables, geo_model="rpc",
                    ndepths=ndepths, slab=4)
    depth_s, conf_s = predict_scene(
        inner, images, rpcs, tile=64, halo=32, num_stage=3, ref_index=0,
    )

    mesh = make_mesh(data=4)
    sharded = jax.jit(shard_map(
        inner, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    ))
    depth_p, conf_p = predict_scene(
        sharded, images, rpcs, tile=64, halo=32, num_stage=3, ref_index=0,
        batch_tiles=4, mesh=mesh,
    )
    np.testing.assert_allclose(depth_p, depth_s, atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(conf_p, conf_s, atol=1e-4)


def test_source_window_covers_offset_views():
    """Per-view tile windows: source views deliberately NOT co-registered
    with the reference (pixel grids shifted by ~40-50 px — beyond the halo).
    The projected-footprint window must keep essentially every plane-sweep
    sample inside the source crop; the old shared-window choice loses most
    of them (it assumed a shared scene pixel grid)."""
    from satmvs_tpu.infer.scene import source_window

    size = 192
    # h_scale=100 keeps full-range parallax (~±16 px) well inside a 96-px
    # tile — the real-data regime (WHU-TLC height ranges are narrow relative
    # to tile size); the huge default synthetic range would exceed ANY window
    rpcs = np.stack(
        synthetic.make_rpc_triplet(size, size, seed=13, h_scale=100.0)
    )[[2, 0, 1]]
    # de-register the source views: shift their pixel grids
    rpcs[1] = rpclib.crop_rpc(rpcs[1], 41, 27)
    rpcs[2] = rpclib.crop_rpc(rpcs[2], -38, -45)
    h_min, h_max = rpclib.height_range(rpcs[0])

    halo = 32

    def coverage(row0, col0, tile, src, src_r0, src_c0):
        """Fraction of the tile INTERIOR's sweep samples (the region kept
        after halo trimming — what stitching actually uses) landing inside
        the chosen source window."""
        ref_c = rpclib.crop_rpc(rpcs[0], col0, row0)
        src_c = rpclib.crop_rpc(rpcs[src], src_c0, src_r0)
        cams = warplib.build_rpc_warp_cams(np.stack([ref_c, src_c]), 0)
        depths = jnp.asarray([h_min, h_max], jnp.float32)
        xs, ys = warplib.rpc_sweep_coords(cams, 0, depths, tile, tile)
        keep = np.s_[:, halo:tile - halo, halo:tile - halo]
        xs = np.asarray(xs)[keep]
        ys = np.asarray(ys)[keep]
        inside = (xs >= 0) & (xs <= tile - 1) & (ys >= 0) & (ys <= tile - 1)
        return inside.mean()

    tile = 96
    # interior tile: full interior coverage; edge tiles: strict improvement
    # (their shifted sources genuinely lack part of the ground)
    for row0, col0 in [(48, 48), (0, 96), (96, 0)]:
        for src in (1, 2):
            r0, c0 = source_window(rpcs, 0, src, row0, col0, tile, tile,
                                   h_min, h_max, size, size)
            cov_new = coverage(row0, col0, tile, src, r0, c0)
            cov_old = coverage(row0, col0, tile, src, row0, col0)
            if (row0, col0) == (48, 48):
                assert cov_new > 0.995, (src, cov_new)
                assert cov_new > cov_old + 0.15, (src, cov_new, cov_old)
            else:
                # window clamped at the scene edge: the shifted source may
                # genuinely lack the ground — never worse than shared-window
                assert cov_new >= cov_old - 1e-9, (row0, col0, src)


def test_predict_scene_scene_norm_radiometry():
    """norm='scene' must normalize every tile crop with ONE set of per-view
    whole-scene statistics: a probe forward that echoes its (normalized)
    reference-view input back as depth must stitch to exactly the
    scene-normalized image — no per-tile gain/offset jumps.  norm='tile'
    (the reference's per-block behavior) re-centers each crop and must
    therefore differ on a radiometric-gradient scene."""
    size = 96
    scene = synthetic.make_scene(size, size, seed=4, h_amp=50.0)
    images = scene["images"]
    # strong horizontal radiometric gradient → per-tile stats differ
    grad = np.linspace(0.0, 60.0, size, dtype=np.float32)[None, :]
    images = images + grad
    rpcs = scene["rpcs"]

    def probe(imgs, cams, dv):
        d = imgs[:, 0, :, :, 0]
        return {"depth": d, "photometric_confidence": jnp.ones_like(d)}

    # tile=32, halo=0: 9 distinct 32^2 crops, so per-tile stats really
    # differ along the gradient (tile+2*halo >= scene would degenerate
    # every crop to the full scene and make the two modes coincide)
    d_scene, _ = predict_scene(
        probe, images, rpcs, tile=32, halo=0, num_stage=3, ref_index=0,
        norm="scene",
    )
    img0 = np.repeat(np.asarray(images[0], np.float32)[..., None], 3, -1)
    mean = img0.astype(np.float64).mean(axis=(0, 1))
    std = np.sqrt(img0.astype(np.float64).var(axis=(0, 1))) + 1e-8
    oracle = ((img0[..., 0] - mean[0]) / std[0]).astype(np.float32)
    np.testing.assert_allclose(d_scene, oracle, atol=1e-5)

    d_tile, _ = predict_scene(
        probe, images, rpcs, tile=32, halo=0, num_stage=3, ref_index=0,
        norm="tile",
    )
    assert np.max(np.abs(d_tile - d_scene)) > 0.1
