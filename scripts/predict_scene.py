#!/usr/bin/env python
"""Whole-scene prediction CLI: one large satellite scene (the "Open" dataset
variant — full images + RPCs, WHU_TLC/readme.md:48) → tiled inference →
stitched height/confidence maps (→ optional fused DSM with other views).

The reference required offline pre-cutting into network-sized blocks; this
driver tiles on the fly with halo interiors (satmvs_tpu.infer.scene).

Usage:
  python scripts/predict_scene.py \
      --images v0.png v1.png v2.png --rpcs v0.rpc v1.rpc v2.rpc \
      --loadckpt checkpoints/red/rpc --out scene_height.pfm \
      [--ref_index 2] [--tile 384] [--halo 32] [--dsm scene_dsm.tif]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])

# persistent XLA/Mosaic compile cache: without it EVERY process pays the full
# jit compile (~3 min at production tile shapes — measured; NOTES round-4)
from satmvs_tpu import cache as _cache

_cache.enable()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--rpcs", nargs="+", required=True)
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--out", required=True, help="output height PFM path")
    p.add_argument("--model", default="red", choices=["red", "casmvs", "ucs"])
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--min_interval", type=float, default=2.5)
    p.add_argument("--ref_index", type=int, default=0)
    p.add_argument("--tile", type=int, default=384)
    p.add_argument("--halo", type=int, default=32)
    p.add_argument("--dsm", default=None, help="also fuse all views to a DSM raster")
    # fusion filter thresholds (ref tools/rpc_filter.py:71-112 knobs; the
    # operating-point curve lives in BASELINE.md — scripts/fusion_sweep.py
    # re-sweeps them over the saved per-view maps in seconds)
    p.add_argument("--p_ratio", type=float, default=2.0,
                   help="reprojection round-trip px threshold")
    p.add_argument("--d_ratio", type=float, default=7.5,
                   help="height-gap threshold (m)")
    p.add_argument("--geo_consist_num", type=int, default=1)
    p.add_argument("--confidence_ratio", type=float, default=0.0)
    p.add_argument("--norm", default="tile", choices=["tile", "scene"],
                   help="tile radiometry: 'tile' center_images each crop "
                        "(reference block-pipeline behavior), 'scene' uses "
                        "whole-scene per-view stats (seam-free radiometry)")
    p.add_argument("--grid_res", type=float, default=5.0)
    p.add_argument("--batch_tiles", type=int, default=0,
                   help="tiles per forward (0 = one per device; batch is "
                        "sharded across all devices' data axis)")
    p.add_argument("--streaming", action="store_true",
                   help="slab-streaming per-tile forward (red model only): "
                        "O(slab) memory in D; with --batch_tiles the whole "
                        "tile batch runs the batched grid=(B, D) fused "
                        "pipeline")
    p.add_argument("--fused_sweep", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused sweep+variance kernel (auto = TPU backend)")
    p.add_argument("--slab", type=int, default=8,
                   help="planes per streaming scan step (0 = one plane at a "
                        "time through the unfused step)")
    a = p.parse_args()
    assert len(a.images) == len(a.rpcs)

    import numpy as np
    import jax

    from satmvs_tpu.data import formats, synthetic  # noqa: F401
    from satmvs_tpu.infer.scene import predict_scene
    from satmvs_tpu.models import build_model
    from satmvs_tpu.train.checkpoints import restore_checkpoint
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import create_model_and_state

    # windowed GeoTIFF/PNG scene ingestion with tone mapping for raw
    # radiometry (ref data_io.py:181-261; GDAL when present, PIL fallback)
    images = np.stack([formats.read_scene_image(pth) for pth in a.images])
    rpcs = np.stack([formats.load_rpc(pth)[0] for pth in a.rpcs])

    # fused-sweep coverage contract: validate this scene's cameras once (at
    # tile geometry — per-tile RPC crops only shift offsets, coverage is
    # scale/offset-invariant)
    from satmvs_tpu.ops import warp as _warplib

    tile_hw = a.tile + 2 * a.halo
    misses = _warplib.sweep_coverage_misses(
        rpcs, a.ref_index, tile_hw, tile_hw, num_stage=3
    )
    if any(misses.values()):
        print(f"WARNING: fused-sweep stencil drops samples {misses}; "
              "pass --fused_sweep off or raise sweep_stencil", file=sys.stderr)

    cfg = Config(model=a.model, geo_model="rpc",
                 ndepths=tuple(int(x) for x in a.ndepths.split(",")),
                 min_interval=a.min_interval, view_num=len(a.images),
                 fused_sweep={"auto": None, "on": True,
                              "off": False}[a.fused_sweep])

    # init the model on one tile shape to build the state template
    from satmvs_tpu.data.loader import collate
    from satmvs_tpu.data.preprocess import center_image
    from satmvs_tpu.geo import rpc as rpclib
    from satmvs_tpu.ops import warp as warplib
    import jax.numpy as jnp

    th = tw = a.tile + 2 * a.halo
    v = len(a.images)
    order = [a.ref_index] + [i for i in range(v) if i != a.ref_index]
    dummy = {
        "imgs": np.zeros((v, th, tw, 3), np.float32),
        "cams": warplib.build_stage_cams(rpcs[order], 0, cfg.num_stage),
        "depth_values": np.array(rpclib.height_range(rpcs[a.ref_index]), np.float32),
        "out_view": "0", "out_name": "x",
    }
    batch = collate([dummy])
    model, state, _ = create_model_and_state(cfg, batch, steps_per_epoch=1, abstract_init=True)
    restored, ep = restore_checkpoint(a.loadckpt, state)
    if restored is None:
        raise SystemExit(f"no checkpoint at {a.loadckpt}")
    print(f"loaded checkpoint epoch {ep}")
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}

    # tile-parallel: one tile per device by default (mesh over all devices)
    from satmvs_tpu.dist.mesh import make_mesh

    n_dev = len(jax.devices())
    batch_tiles = a.batch_tiles or n_dev
    mesh = make_mesh(data=n_dev) if n_dev > 1 else None

    if a.streaming and a.model == "red":
        # slab-streaming tile forward (infer/predict.py): O(slab)-memory in
        # D; a >1 tile batch takes the batched grid=(B, D) fused pipeline
        from functools import partial

        from satmvs_tpu.infer.predict import streaming_red_forward

        inner = partial(
            streaming_red_forward, variables, geo_model="rpc",
            ndepths=cfg.ndepths, depth_intervals_ratio=cfg.depth_inter_r,
            min_interval=cfg.min_interval, cr_base_chs=cfg.cr_base_chs,
            slab=a.slab,
        )
        if mesh is not None:
            # GSPMD has no partitioning rule for the batched grid=(B, D)
            # pallas_calls — shard_map the data axis instead so each device
            # traces its LOCAL tile sub-batch (sharded==serial:
            # tests/test_scene.py::test_streaming_shard_map_matches_serial)
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            inner = shard_map(
                inner, mesh=mesh,
                in_specs=(P("data"), P("data"), P("data")),
                out_specs=P("data"), check_vma=False,
            )
        forward = jax.jit(inner)
    else:
        if a.streaming:
            print("WARNING: --streaming is red-only; using the full-volume "
                  "forward", file=sys.stderr)

        @jax.jit
        def forward(imgs, cams, dvals):
            return model.apply(variables, imgs, cams, dvals, train=False)

    t0 = time.time()
    stats: dict = {}
    depth, conf = predict_scene(
        forward, images, rpcs, tile=a.tile, halo=a.halo,
        num_stage=cfg.num_stage, ref_index=a.ref_index,
        batch_tiles=batch_tiles, mesh=mesh,
        progress=lambda i, n: print(f"tile {i}/{n}", end="\r"),
        stats=stats, norm=a.norm,
    )
    print(f"\nscene predicted in {time.time() - t0:.1f}s → {a.out}")
    if stats:
        share = stats["host_prep_s"] / max(stats["wall_s"], 1e-9)
        print(f"[scene] {stats['n_tiles']} tiles / {stats['n_chunks']} chunks; "
              f"wall {stats['wall_s']:.1f}s, host prep {stats['host_prep_s']:.1f}s "
              f"({share:.0%} of wall; overlapped with device compute), "
              f"readback {stats['readback_s']:.1f}s")
        cm = stats.get("chunk_s") or []
        if len(cm) > 1:
            import numpy as _np

            steady = _np.median(cm[1:])
            # per-tile divisor = the dispatched chunk size (every steady
            # chunk runs batch_tiles forwards; a ragged tail is padded)
            print(f"[scene] first chunk {cm[0]:.1f}s (incl. jit compile), "
                  f"steady-state {steady:.2f}s/chunk "
                  f"({steady / max(batch_tiles, 1):.2f}s/tile)")
    formats.save_pfm(a.out, depth.astype(np.float32))
    formats.save_pfm(os.path.splitext(a.out)[0] + "_prob.pfm", conf.astype(np.float32))

    if a.dsm:
        # fuse: predict each view as reference, then geometric-consistency
        from satmvs_tpu.infer.fuse import fuse_scene_to_dsm

        depths = [depth]
        for ref_i in [i for i in range(v) if i != a.ref_index]:
            d_i, _ = predict_scene(
                forward, images, rpcs, tile=a.tile, halo=a.halo,
                num_stage=cfg.num_stage, ref_index=ref_i,
                batch_tiles=batch_tiles, mesh=mesh, norm=a.norm,
            )
            depths.append(d_i)
        fuse_order = [a.ref_index] + [i for i in range(v) if i != a.ref_index]
        # save the per-view maps: scripts/fusion_sweep.py re-runs the filter
        # over them at any thresholds in seconds (no re-prediction)
        base = os.path.splitext(a.out)[0]
        for vi, d_i in zip(fuse_order, depths):
            formats.save_pfm(f"{base}_view{vi}.pfm", d_i.astype(np.float32))
        path, mask, _ = fuse_scene_to_dsm(
            np.stack(depths), rpcs[fuse_order], a.dsm, grid_res=a.grid_res,
            prob=conf, p_ratio=a.p_ratio, d_ratio=a.d_ratio,
            geo_consist_num=a.geo_consist_num,
            confidence_ratio=a.confidence_ratio,
        )
        print(f"DSM written: {path} (valid {mask.mean():.1%}, "
              f"p_ratio {a.p_ratio}, d_ratio {a.d_ratio}, "
              f"geo_consist {a.geo_consist_num}, conf {a.confidence_ratio})")


if __name__ == "__main__":
    main()
