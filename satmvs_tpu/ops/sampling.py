"""Bilinear image sampling (the TPU replacement for `F.grid_sample`).

The reference's single most performance-critical primitive is the CUDA
grid_sample kernel (/root/reference/modules/warping.py:40,174,358).  Here it
is a pure-XLA gather + lerp over a channels-last feature map; a fused
Pallas projection+gather kernel builds on the same contract (ops/pallas/).

Coordinate convention (deliberate simplification of a reference quirk):
  samples are taken at *exact pixel coordinates* — x=0 is the center of the
  first column, x=W-1 the center of the last.  The reference normalizes to
  [-1, 1] with (W-1)/2 and then calls grid_sample(align_corners=False), which
  effectively samples at x·W/(W-1) − 0.5 — a sub-pixel stretch inherited from
  MVSNet.  We sample at the geometrically correct location instead
  (SURVEY.md §7 "quirks to decide on deliberately").

Out-of-bounds samples blend with zeros per corner, matching
padding_mode='zeros' semantics exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample a channels-last feature map at fractional pixel coordinates.

    Args:
      feat: (H, W, C) feature map.
      x, y: sample coordinates of any common shape S (x: column, y: row).

    Returns:
      (S..., C) bilinearly interpolated features, 0 outside the image.
    """
    h, w, c = feat.shape
    shape = x.shape
    x = x.reshape(-1)
    y = y.reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = feat.reshape(h * w, c)

    def corner(yi, xi, weight):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx, axis=0)  # (N, C)
        return vals * (weight * valid.astype(feat.dtype))[:, None]

    out = (
        corner(y0i, x0i, (1 - wy) * (1 - wx))
        + corner(y0i, x1i, (1 - wy) * wx)
        + corner(y1i, x0i, wy * (1 - wx))
        + corner(y1i, x1i, wy * wx)
    )
    return out.reshape(*shape, c)


def torch_grid_coords(x: jnp.ndarray, y: jnp.ndarray, height: int, width: int):
    """Map exact pixel coordinates to the positions the reference actually
    samples: it normalizes by (W−1)/2 and calls
    `grid_sample(align_corners=False)` (/root/reference/modules/warping.py:
    350-358), which reads the input at x·W/(W−1) − 0.5.  Used by the
    `torch_compat` model mode so converted reference checkpoints see the
    sampling geometry they were trained under."""
    return (
        x * (width / (width - 1.0)) - 0.5,
        y * (height / (height - 1.0)) - 0.5,
    )


def bilinear_sample_scalar(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, fill: float = 0.0):
    """Bilinear sample of a single-channel (H, W) image with constant fill
    outside (the `cv2.remap(..., borderValue=fill)` of the fusion filter,
    ref /root/reference/tools/rpc_filter.py:30)."""
    sampled = bilinear_sample(img[..., None], x, y)[..., 0]
    h, w = img.shape
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return jnp.where(inside, sampled, jnp.asarray(fill, img.dtype))
