"""Probability-volume → depth-map regression and confidence measures.

TPU forms of depth_regression (/root/reference/modules/module.py:431-439) and
the two photometric-confidence variants (casred.py:62; casmvs.py:69-74).
Unbatched: prob (D, H, W); vmap supplies batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax Σ_d p·depth over (D, H, W) → (H, W).

    depth_values: (D,) or (D, H, W).
    """
    if depth_values.ndim == 1:
        depth_values = depth_values[:, None, None]
    return jnp.sum(prob * depth_values, axis=0)


def max_prob_confidence(prob: jnp.ndarray) -> jnp.ndarray:
    """Confidence = max probability over depth (RED models, ref casred.py:62)."""
    return jnp.max(prob, axis=0)


def window_prob_confidence(prob: jnp.ndarray, window: int = 4) -> jnp.ndarray:
    """Confidence = probability mass in a `window`-plane band around the
    regressed depth index (CasMVS/UCS variant, ref casmvs.py:69-74).

    The reference implements this as avg_pool3d on a front/back-padded volume
    (pad 1 before, 2 after for window 4) and gathers at the rounded soft-argmax
    index.  Same math here via cumulative sums along D.
    """
    d = prob.shape[0]
    pad_front, pad_back = window // 2 - 1, window - window // 2 + 1
    padded = jnp.pad(prob, ((pad_front, pad_back), (0, 0), (0, 0)))
    csum = jnp.cumsum(padded, axis=0)
    csum = jnp.pad(csum, ((1, 0), (0, 0), (0, 0)))
    # band_sum[i] = sum of padded[i : i + window] = csum[i+window] - csum[i]
    band = csum[window:] - csum[:-window]  # (D + pad_front + pad_back - window + 1, H, W)

    idx_f = depth_regression(prob, jnp.arange(d, dtype=prob.dtype))
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, d - 1)
    return jnp.take_along_axis(band, idx[None], axis=0)[0]


def entropy_confidence(prob: jnp.ndarray) -> jnp.ndarray:
    """Normalized-entropy confidence 1 − H(p)/log D — an extra observability
    signal not in the reference (useful for fusion thresholds)."""
    d = prob.shape[0]
    h = -jnp.sum(prob * jnp.log(jnp.clip(prob, 1e-12, None)), axis=0)
    return 1.0 - h / jnp.log(float(d))


def expected_variance(prob: jnp.ndarray, depth_values: jnp.ndarray, depth: jnp.ndarray, lamb: float):
    """UCS-Net uncertainty: λ·sqrt(Σ p·(d − d̂)²) (ref networks/ucs.py:73-74)."""
    if depth_values.ndim == 1:
        depth_values = depth_values[:, None, None]
    var = jnp.sum(prob * (depth_values - depth[None]) ** 2, axis=0)
    return lamb * jnp.sqrt(var)
