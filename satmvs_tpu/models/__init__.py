"""Model families (reference L4): CascadeRED, CascadeMVS, UCS + losses.

All three are configurations of the shared cascade engine (cascade.py),
re-exported here as constructors with the reference's defaults:

  CascadeREDNet  — recurrent encoder-decoder regularization, unet features,
                   max-prob confidence          (ref networks/casred.py:68)
  CascadeMVSNet  — 3-D conv CostRegNet, fpn features, 4-window confidence,
                   detached inter-stage depth   (ref networks/casmvs.py:79)
  UCSNet         — CostRegNet + uncertainty-aware sampling (λ·std windows)
                                                (ref networks/ucs.py:79)
"""

from __future__ import annotations

from .cascade import CascadeModel
from .losses import cascade_loss  # noqa: F401

MODEL_NAMES = ("red", "casmvs", "ucs")


def CascadeREDNet(geo_model="rpc", min_interval=2.5, ndepths=(64, 32, 8),
                  depth_intervals_ratio=(4.0, 2.0, 1.0), cr_base_chs=(8, 8, 8),
                  **kw) -> CascadeModel:
    return CascadeModel(
        geo_model=geo_model, min_interval=min_interval, ndepths=tuple(ndepths),
        depth_intervals_ratio=tuple(depth_intervals_ratio),
        cr_base_chs=tuple(cr_base_chs), arch_mode="unet", regularizer="red",
        sampler="window", confidence="max", grad_method="through", **kw,
    )


def CascadeMVSNet(geo_model="rpc", min_interval=2.5, ndepths=(64, 32, 8),
                  depth_intervals_ratio=(4.0, 2.0, 1.0), cr_base_chs=(8, 8, 8),
                  share_cr=False, grad_method="detach", arch_mode="fpn", **kw) -> CascadeModel:
    return CascadeModel(
        geo_model=geo_model, min_interval=min_interval, ndepths=tuple(ndepths),
        depth_intervals_ratio=tuple(depth_intervals_ratio),
        cr_base_chs=tuple(cr_base_chs), arch_mode=arch_mode, regularizer="costreg",
        sampler="window", confidence="window4", grad_method=grad_method,
        share_cr=share_cr, **kw,
    )


def UCSNet(geo_model="rpc", lamb=1.5, ndepths=(64, 32, 8), cr_base_chs=(8, 8, 8),
           feat_base_chs=8, grad_method="detach", **kw) -> CascadeModel:
    return CascadeModel(
        geo_model=geo_model, ndepths=tuple(ndepths), cr_base_chs=tuple(cr_base_chs),
        feat_base_chs=feat_base_chs, arch_mode="unet", regularizer="costreg",
        sampler="uncertainty", confidence="window4", grad_method=grad_method,
        lamb=lamb, **kw,
    )


def build_model(name: str, geo_model: str, **kw) -> CascadeModel:
    """Model dispatch by CLI name (ref train.py:104-125).

    Reads SATMVS_FUSED_RED / SATMVS_FUSED_SWEEP ONCE here (build time, never
    inside traced code) as legacy A/B overrides for the ``fused_red`` /
    ``fused_sweep`` fields when the caller didn't set them explicitly.
    """
    import os

    if kw.get("fused_red") is None and "SATMVS_FUSED_RED" in os.environ:
        kw["fused_red"] = os.environ["SATMVS_FUSED_RED"] != "0"
    if kw.get("fused_sweep") is None and "SATMVS_FUSED_SWEEP" in os.environ:
        kw["fused_sweep"] = os.environ["SATMVS_FUSED_SWEEP"] != "0"
    if name == "red":
        return CascadeREDNet(geo_model, **kw)
    if name == "casmvs":
        return CascadeMVSNet(geo_model, **kw)
    if name == "ucs":
        return UCSNet(geo_model, **kw)
    raise ValueError(f"unknown model {name!r}; expected one of {MODEL_NAMES}")
