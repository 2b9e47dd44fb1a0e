"""Depth (terrain-height) hypothesis samplers for the cascade.

TPU re-design of /root/reference/modules/depth_range.py.  Unbatched: all maps
(H, W); sample volumes (D, H, W); vmap supplies the batch axis.

Stage flow (ref networks/casred.py:125-149): stage 1 sweeps the full scene
height range uniformly; later stages sweep a per-pixel window around the
(upsampled) previous estimate.  We compute samples directly at the stage's
resolution instead of the reference's full-res-then-trilinear-resize detour —
mathematically the same sweep, one resize fewer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_samples(d_min, d_max, ndepth: int, height: int, width: int) -> jnp.ndarray:
    """Uniform sweep of [d_min, d_max]: (D, H, W)
    (ref depth_range.py:27-37, dim-2 branch)."""
    steps = jnp.arange(ndepth, dtype=jnp.float32)
    vals = d_min + steps * ((d_max - d_min) / (ndepth - 1))
    return jnp.broadcast_to(vals[:, None, None], (ndepth, height, width))


def window_samples(cur_depth: jnp.ndarray, ndepth: int, interval) -> jnp.ndarray:
    """Per-pixel window of ±(ndepth/2)·interval around cur_depth: (D, H, W)
    (ref depth_range.py:4-20; the effective step is ndepth·interval/(ndepth−1))."""
    low = cur_depth - (ndepth / 2.0) * interval
    high = cur_depth + (ndepth / 2.0) * interval
    step = (high - low) / (ndepth - 1)
    steps = jnp.arange(ndepth, dtype=cur_depth.dtype)
    return low[None] + steps[:, None, None] * step[None]


def uncertainty_samples(cur_depth, exp_var, ndepth: int, d_min, d_max) -> jnp.ndarray:
    """UCS-Net window: cur_depth ± predicted std, clamped to the scene range
    (ref depth_range.py:45-86): (D, H, W)."""
    eps = 1e-12
    low = jnp.maximum(cur_depth - exp_var, d_min)
    high = jnp.minimum(cur_depth + exp_var, d_max)
    step = (high - low) / (float(ndepth) - 1.0)
    steps = jnp.arange(ndepth, dtype=cur_depth.dtype)
    return low[None] + steps[:, None, None] * step[None] + eps


def upsample_map(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize of an (H, W) map to (height, width) — the inter-stage
    depth/variance upsampling (ref casred.py:133-137)."""
    return jax.image.resize(x, (height, width), method="bilinear")
