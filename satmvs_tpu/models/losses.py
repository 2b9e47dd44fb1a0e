"""Multi-stage masked smooth-L1 loss.

Counterpart of cas_mvsnet_loss (/root/reference/networks/loss.py:5-25):
per-stage smooth-L1 over valid pixels, weighted by dlossw (default
0.5/1.0/2.0 coarse→fine, ref train.py:46).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Huber with delta=1 (torch F.smooth_l1_loss elementwise)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def cascade_loss(
    outputs: Mapping[str, Mapping[str, jnp.ndarray]],
    depth_gt_stages: Sequence[jnp.ndarray],
    mask_stages: Sequence[jnp.ndarray],
    dlossw: Sequence[float] = (0.5, 1.0, 2.0),
):
    """Total weighted loss + final-stage depth loss.

    depth_gt_stages / mask_stages: per-stage (B, h, w) maps, coarsest first
    (index i pairs with outputs["stage{i+1}"]).
    """
    total = 0.0
    depth_loss = 0.0
    for i, (gt, mask) in enumerate(zip(depth_gt_stages, mask_stages)):
        est = outputs[f"stage{i + 1}"]["depth"]
        depth_loss = masked_mean(smooth_l1(est, gt), mask > 0.5)
        w = dlossw[i] if dlossw is not None else 1.0
        total = total + w * depth_loss
    return total, depth_loss
