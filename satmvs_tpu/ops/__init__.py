"""Geometry ops: warping, sampling, cost volumes, samplers (reference L2)."""

from . import cost_volume, depth_range, regression, sampling, warp  # noqa: F401
