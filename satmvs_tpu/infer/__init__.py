"""Inference layer (reference L6): streaming predict, fusion, tiling, DSM."""

from .fuse import filter_depth_pinhole, filter_depth_rpc, fuse_scene_to_dsm  # noqa: F401
from .predict import streaming_red_forward  # noqa: F401
from .scene import predict_scene  # noqa: F401
from .tiling import Tile, extract, plan_tiles, stitch  # noqa: F401
