"""Whole-scene prediction: tile the scene, predict every tile, stitch.

The reference handles 5120x5120 scenes by *offline* pre-cutting block images
+ per-block RPC files and stitching PFMs in an external pipeline
(ref predict.py:117-135, tools/rpc_tensor.py:174-181, WHU_TLC/readme.md:48).
Here whole-scene inference is a first-class API: `predict_scene` plans
overlapping tiles (infer/tiling.py), shifts each view's RPC to the tile crop
(geo.rpc.crop_rpc — the validity-per-patch subtlety of SURVEY §7), runs the
jitted per-tile forward (one compile: all tiles share a shape), and stitches
interiors into seamless scene-sized height/confidence maps.

Tiles are embarrassingly parallel: shard the tile list across
hosts/processes for pod-scale scenes (the `tile` axis of SURVEY §2.2).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..data.preprocess import center_image
from ..geo import rpc as rpclib
from ..ops import warp as warplib
from . import tiling


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

    Returns (depth (H, W) float32, confidence (H, W) float32).
    """
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
    # one compile: group tiles by shape
    depth_outs: list[np.ndarray] = []
    conf_outs: list[np.ndarray] = []
    for idx, t in enumerate(tiles):
        imgs_t = np.stack(
            [center_image(tiling.extract(images[view], t)) for view in range(v)]
        )[None]
        # shift every view's RPC to the tile crop of the *reference* image;
        # source images are cropped at the same scene window, so their RPCs
        # shift identically (all views share the scene pixel grid here)
        rpcs_t = np.stack(
            [rpclib.crop_rpc(r, start_w=t.col0, start_h=t.row0) for r in rpcs]
        )
        order = [ref_index] + [i for i in range(v) if i != ref_index]
        cams = tuple(
            warplib.stack_cams([c])
            for c in warplib.build_stage_cams(rpcs_t[order], 0, num_stage)
        )
        out = forward(jnp.asarray(imgs_t[:, order]), cams, dvals)
        depth_outs.append(np.asarray(out["depth"][0], np.float32))
        conf_outs.append(np.asarray(out["photometric_confidence"][0], np.float32))
        if progress:
            progress(idx + 1, len(tiles))

    depth = tiling.stitch(tiles, depth_outs, scene_h, scene_w)
    conf = tiling.stitch(tiles, conf_outs, scene_h, scene_w)
    return depth, conf
