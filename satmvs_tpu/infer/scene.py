"""Whole-scene prediction: tile the scene, predict every tile, stitch.

The reference handles 5120x5120 scenes by *offline* pre-cutting block images
+ per-block RPC files and stitching PFMs in an external pipeline
(ref predict.py:117-135, tools/rpc_tensor.py:174-181, WHU_TLC/readme.md:48).
Here whole-scene inference is a first-class API: `predict_scene` plans
overlapping tiles (infer/tiling.py), shifts each view's RPC to the tile crop
(geo.rpc.crop_rpc — the validity-per-patch subtlety of SURVEY §7), runs the
jitted per-tile forward (one compile: all tiles share a shape), and stitches
interiors into seamless scene-sized height/confidence maps.

Tiles are embarrassingly parallel — `batch_tiles`/`mesh` run N tiles per
forward as ONE SPMD program with the tile batch sharded over the mesh's
`data` axis, so a whole scene rides every chip of a slice at once (the
`tile` axis of SURVEY §2.2).  Seamlessness comes from the redundant-halo
design: each chip predicts its tile plus `halo` context and only the
interior is kept, so no inter-chip feature communication is needed at all —
the TPU-native alternative to stitching seams with explicit halo exchange.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..data.preprocess import center_image
from ..geo import rpc as rpclib
from ..ops import warp as warplib
from . import tiling


def source_window(rpcs: np.ndarray, ref_index: int, view: int,
                  row0: int, col0: int, height: int, width: int,
                  h_min: float, h_max: float, scene_h: int, scene_w: int):
    """Source-view crop window for a reference tile: project the tile's
    footprint (4 corners × height extremes) into the view and center a
    same-size window on it, clamped to the scene.  Real TLC triplets are NOT
    co-registered in pixel space — a fixed shared window would sample zeros
    beyond the halo for any cross-view offset (ref triplets share only the
    ground footprint, not the pixel grid)."""
    if view == ref_index:
        return row0, col0
    cx = np.array([col0, col0 + width - 1.0] * 4)
    cy = np.array([row0] * 2 + [row0 + height - 1.0] * 2, np.float64)
    cy = np.concatenate([cy, cy])
    ch = np.array([h_min] * 4 + [h_max] * 4, np.float64)
    lat, lon = rpclib.photo_to_obj(rpcs[ref_index], cx, cy, ch)
    s, l = rpclib.obj_to_photo(rpcs[view], lat, lon, ch)
    c0 = int(round((s.min() + s.max()) / 2 - width / 2))
    r0 = int(round((l.min() + l.max()) / 2 - height / 2))
    c0 = max(0, min(c0, scene_w - width))
    r0 = max(0, min(r0, scene_h - height))
    return r0, c0


def predict_scene(
    forward: Callable,
    images: np.ndarray,
    rpcs: np.ndarray,
    tile: int = 384,
    halo: int = 32,
    num_stage: int = 3,
    ref_index: int = 0,
    depth_range: Optional[tuple[float, float]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    batch_tiles: int = 1,
    mesh=None,
    stats: Optional[dict] = None,
    norm: str = "tile",
):
    """Predict a full scene's reference-view height map by tiling.

    Args:
      forward: jit-compatible callable (imgs (1,V,th,tw,3), cams, dvals (1,2))
        → dict with "depth"/"photometric_confidence" (1, th, tw) — e.g. a
        partial of model.apply or streaming_red_forward with bound variables.
      images: (V, H, W) or (V, H, W, 3) raw scene images, view `ref_index`
        is the reference.
      rpcs: (V, 170) float64 scene RPCs.
      tile/halo: interior tile size and overlap (multiples of 32).
      depth_range: (h_min, h_max); default from the reference RPC.
      batch_tiles: tiles per forward call (the tile-parallel batch).  With a
        `mesh`, the batch is sharded over the mesh's `data` axis so each chip
        predicts its own tile — set batch_tiles = data-axis size (or a
        multiple).  Without a mesh it is plain on-chip batching.
      mesh: optional jax.sharding.Mesh with a `data` axis for multi-chip
        tile parallelism.
      stats: optional dict — filled with wall/host-prep/readback seconds so
        callers can verify host prep stays off the critical path.
      norm: tile radiometric normalization.  "tile" (default) center_images
        every tile crop independently — the reference's block-pipeline
        behavior (ref predict.py:117-135 consumes pre-cut blocks whose
        normalization is per-block).  "scene" normalizes every crop with
        per-view statistics computed ONCE over the whole scene, so adjacent
        tiles see identical radiometry — removes the per-tile gain/offset
        jumps that show up as seams in the stitched height map.

    Host/device overlap: JAX dispatch is asynchronous, so the loop preps and
    dispatches chunk i+1 while the device still runs chunk i, and only then
    blocks on chunk i's outputs (double-buffered readback).  Pad tiles of a
    ragged final chunk reuse the already-built inputs instead of recomputing
    them.

    Returns (depth (H, W) float32, confidence (H, W) float32).
    """
    import jax
    import jax.numpy as jnp

    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = np.repeat(images[..., None], 3, axis=-1)
    v, scene_h, scene_w, _ = images.shape
    rpcs = np.asarray(rpcs, np.float64)

    if depth_range is None:
        h_min, h_max = rpclib.height_range(rpcs[ref_index])
    else:
        h_min, h_max = depth_range
    dvals = jnp.asarray([[h_min, h_max]], jnp.float32)

    tiles = tiling.plan_tiles(scene_h, scene_w, tile=tile, halo=halo, multiple=32)
    order = [ref_index] + [i for i in range(v) if i != ref_index]

    if norm not in ("tile", "scene"):
        raise ValueError(f"norm must be 'tile' or 'scene', got {norm!r}")
    if norm == "scene":
        # one per-view, per-channel (mean, std) over the WHOLE scene — every
        # tile crop is normalized with the same constants (fp64 reduction;
        # matches center_image's per-channel semantics)
        sc_mean = images.mean(axis=(1, 2), dtype=np.float64, keepdims=True)
        sc_std = np.sqrt(
            images.var(axis=(1, 2), dtype=np.float64, keepdims=True)
        )
        sc_mean = sc_mean.astype(np.float32)
        sc_std = (sc_std + 1e-8).astype(np.float32)

    def tile_inputs(t: tiling.Tile):
        # per-view windows; each view's RPC shifts by its OWN crop so the
        # warp geometry stays exact (geo.rpc.crop_rpc semantics)
        imgs_t, rpcs_t = [], []
        for view in range(v):
            row0, col0 = source_window(
                rpcs, ref_index, view, t.row0, t.col0, t.height, t.width,
                h_min, h_max, scene_h, scene_w,
            )
            crop = images[view][row0:row0 + t.height, col0:col0 + t.width]
            if norm == "scene":
                imgs_t.append((crop - sc_mean[view]) / sc_std[view])
            else:
                imgs_t.append(center_image(crop))
            rpcs_t.append(rpclib.crop_rpc(rpcs[view], start_w=col0, start_h=row0))
        imgs_t = np.stack(imgs_t)
        rpcs_t = np.stack(rpcs_t)
        return imgs_t[order], warplib.build_stage_cams(rpcs_t[order], 0, num_stage)

    place = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # sharded batch dims must divide the data axis — round up (the pad
        # tiles are repeats whose outputs are dropped)
        dsz = mesh.shape["data"]
        batch_tiles = -(-batch_tiles // dsz) * dsz
        sh = NamedSharding(mesh, P("data"))
        place = lambda x: jax.device_put(x, sh)

    # one compile per tile shape x batch size: group same-shape tiles, run
    # `batch_tiles` of them per forward (the tile-parallel batch; the last
    # chunk of a group is padded by repeating its final tile)
    groups: dict[tuple[int, int], list[int]] = {}
    for idx, t in enumerate(tiles):
        groups.setdefault((t.height, t.width), []).append(idx)

    depth_outs: list[np.ndarray] = [None] * len(tiles)
    conf_outs: list[np.ndarray] = [None] * len(tiles)
    done = 0
    import time as _time

    t_wall0 = _time.perf_counter()
    t_prep = 0.0
    t_read = 0.0

    chunks = []
    for members in groups.values():
        for i0 in range(0, len(members), batch_tiles):
            chunks.append(members[i0 : i0 + batch_tiles])

    def dispatch(chunk):
        """Host-prep + async device dispatch of one chunk (returns the
        not-yet-materialized outputs)."""
        nonlocal t_prep
        t0 = _time.perf_counter()
        ins = [tile_inputs(tiles[k]) for k in chunk]
        # pad a ragged final chunk by REUSING the last tile's built inputs
        ins = ins + [ins[-1]] * (batch_tiles - len(chunk))
        imgs_b = np.stack([im for im, _ in ins])
        cams_b = tuple(
            warplib.stack_cams([c[s] for _, c in ins])
            for s in range(num_stage)
        )
        dvals_b = jnp.tile(dvals, (len(ins), 1))
        imgs_b = jnp.asarray(imgs_b)
        if place is not None:
            imgs_b, cams_b, dvals_b = jax.tree.map(
                place, (imgs_b, cams_b, dvals_b)
            )
        t_prep += _time.perf_counter() - t0
        return forward(imgs_b, cams_b, dvals_b)  # async dispatch

    def collect(chunk, out):
        nonlocal done, t_read
        t0 = _time.perf_counter()
        for j, k in enumerate(chunk):
            depth_outs[k] = np.asarray(out["depth"][j], np.float32)
            conf_outs[k] = np.asarray(
                out["photometric_confidence"][j], np.float32
            )
        t_read += _time.perf_counter() - t0
        done += len(chunk)
        if progress:
            progress(done, len(tiles))

    # double-buffered: prep+dispatch chunk i+1 while the device runs chunk i.
    # chunk_marks records per-chunk wall deltas at collect completion — the
    # first entry carries the jit compile, the rest are steady-state
    # (separating compile from execution in the stats record).
    pending = None
    chunk_marks: list[float] = []
    t_mark = _time.perf_counter()
    for chunk in chunks:
        out = dispatch(chunk)
        if pending is not None:
            collect(*pending)
            chunk_marks.append(_time.perf_counter() - t_mark)
            t_mark = _time.perf_counter()
        pending = (chunk, out)
    if pending is not None:
        collect(*pending)
        chunk_marks.append(_time.perf_counter() - t_mark)

    if stats is not None:
        stats.update(
            wall_s=_time.perf_counter() - t_wall0,
            host_prep_s=t_prep,
            readback_s=t_read,
            n_tiles=len(tiles),
            n_chunks=len(chunks),
            chunk_s=chunk_marks,
        )

    depth = tiling.stitch(tiles, depth_outs, scene_h, scene_w)
    conf = tiling.stitch(tiles, conf_outs, scene_h, scene_w)
    return depth, conf
