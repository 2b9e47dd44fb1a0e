"""Variance cost-volume construction from per-view feature moments.

The reference accumulates Σf and Σf² over views in a Python loop and forms
var = E[f²] − E[f]² (/root/reference/networks/casred.py:38-53).  Formulating
the aggregation as per-view *moments* makes it exactly shardable: when source
views live on different chips, each chip contributes its partial (Σf, Σf²)
and a `psum` over the mesh's view axis reproduces the serial result
bit-for-bit in math (SURVEY.md §2.2 "view parallel").

All shapes channels-last: features (H, W, C), volume (D, H, W, C).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def variance_from_moments(vol_sum, vol_sq_sum, num_views):
    """var = Σf²/V − (Σf/V)²."""
    mean = vol_sum / num_views
    return vol_sq_sum / num_views - mean * mean


def variance_cost_volume(
    ref_feat: jnp.ndarray,
    warped_srcs: Sequence[jnp.ndarray] | jnp.ndarray,
    num_views: Optional[int] = None,
    view_axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Variance volume over {ref, warped srcs}.

    Args:
      ref_feat: (H, W, C) reference features (broadcast over D).
      warped_srcs: list of (D, H, W, C) warped source volumes, or one stacked
        (S, D, H, W, C) array.
      num_views: total view count incl. ref across ALL shards; defaults to
        local count (required when view-sharded).
      view_axis_name: if set, `psum` partial moments over this mesh axis —
        the ref contribution must then only be added by the shard that owns
        the reference view (pass ref_feat=None on the others).

    Returns (D, H, W, C) variance volume.
    """
    if isinstance(warped_srcs, (list, tuple)):
        local = list(warped_srcs)
    else:
        local = [warped_srcs[i] for i in range(warped_srcs.shape[0])]

    vol_sum = 0.0
    vol_sq = 0.0
    local_count = 0
    for wv in local:
        # upcast at read: with bf16 volume transport (ops/warp.rpc_warp
        # out_dtype) the warped volumes arrive half-width; moments always
        # accumulate f32 (a no-op cast for the default f32 path)
        w32 = wv.astype(jnp.float32)
        vol_sum = vol_sum + w32
        vol_sq = vol_sq + w32 * w32
        local_count += 1
    if ref_feat is not None:
        vol_sum = vol_sum + ref_feat[None]
        vol_sq = vol_sq + (ref_feat * ref_feat)[None]
        local_count += 1

    if view_axis_name is not None:
        vol_sum = jax.lax.psum(vol_sum, view_axis_name)
        vol_sq = jax.lax.psum(vol_sq, view_axis_name)
        if num_views is None:
            raise ValueError("num_views is required when view-sharded")
    v = num_views if num_views is not None else local_count
    return variance_from_moments(vol_sum, vol_sq, v)


def sweep_variance_volume(
    ref_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    warp_one: Callable[[jnp.ndarray, int], jnp.ndarray],
    view_axis_name: Optional[str] = None,
    num_views: Optional[int] = None,
) -> jnp.ndarray:
    """Warp every source view and aggregate by variance in one pass.

    Args:
      ref_feat: (H, W, C).
      src_feats: (S, H, W, C) source-view features.
      warp_one: (src_feat, src_index) → (D, H, W, C) warped volume.

    The view loop is a statically unrolled Python loop (S is small — 2 for
    WHU-TLC triplets) so XLA can fuse each warp's gather with the moment
    accumulation and no (S, D, H, W, C) tensor ever materializes.
    """
    warped = [warp_one(src_feats[s], s) for s in range(src_feats.shape[0])]
    return variance_cost_volume(
        ref_feat, warped, num_views=num_views, view_axis_name=view_axis_name
    )
