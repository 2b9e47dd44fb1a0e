"""Evaluation metrics (jit-friendly masked forms).

Counterparts of /root/reference/tools/utils.py:150-206, computed per image
then averaged over the batch (the reference's compute_metrics_for_each_image
wrapper).  Masked selections are mask-weighted means, not boolean indexing —
static shapes under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def threshold_accuracy(depth_est, depth_gt, mask, thres: float):
    """Fraction of valid pixels with |err| < thres (Thres_metrics,
    utils.py:176-183).  Batched (B, H, W) → scalar."""

    def one(est, gt, m):
        err = jnp.abs(est - gt)
        return _masked_mean((err < thres).astype(jnp.float32), m)

    return jnp.mean(jax.vmap(one)(depth_est, depth_gt, mask))


def abs_depth_error(depth_est, depth_gt, mask, outlier_cut: float = 250.0):
    """MAE over valid pixels with |err| ≥ outlier_cut excluded
    (AbsDepthError_metrics, utils.py:198-206)."""

    def one(est, gt, m):
        err = jnp.abs(est - gt)
        keep = m.astype(jnp.float32) * (err < outlier_cut).astype(jnp.float32)
        return _masked_mean(err, keep)

    return jnp.mean(jax.vmap(one)(depth_est, depth_gt, mask))


def interval_accuracy(depth_est, depth_gt, interval, mask, thres: float):
    """Fraction of valid pixels with |err|/interval < thres (Inter_metrics,
    utils.py:186-193); interval is per-image (B,) or scalar."""

    def one(est, gt, itv, m):
        err = jnp.abs(est - gt) / itv
        return _masked_mean((err < thres).astype(jnp.float32), m)

    interval = jnp.broadcast_to(jnp.asarray(interval), (depth_est.shape[0],))
    return jnp.mean(jax.vmap(one)(depth_est, depth_gt, interval, mask))


def standard_metrics(depth_est, depth_gt, mask, min_interval: float = 2.5):
    """The reference's evaluation bundle (train.py:333-336) plus the
    interval-normalized <3-interval accuracy used by BASELINE."""
    m = mask > 0.5
    return {
        "abs_depth_acc": abs_depth_error(depth_est, depth_gt, m, 250.0),
        "1.0m_acc": threshold_accuracy(depth_est, depth_gt, m, 1.0),
        "2.5m_acc": threshold_accuracy(depth_est, depth_gt, m, 2.5),
        "7.5m_acc": threshold_accuracy(depth_est, depth_gt, m, 7.5),
        "3interval_acc": interval_accuracy(depth_est, depth_gt, min_interval, m, 3.0),
    }


class DictAverageMeter:
    """Running mean of scalar dicts (ref utils.py:127-146)."""

    def __init__(self):
        self.data: dict[str, float] = {}
        self.count = 0

    def update(self, new: dict):
        self.count += 1
        for k, v in new.items():
            self.data[k] = self.data.get(k, 0.0) + float(v)

    def mean(self) -> dict:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}
