"""Streaming whole-tile inference: depth-plane scan with online softmax.

TPU re-design of the reference's plane-streaming predictor
(Infer_CascadeREDNet + compute_depth_when_pred,
/root/reference/networks/casred.py:161-332): per cascade stage, a `lax.scan`
over depth planes carries the 4 RED GRU states and *numerically stable*
online-softmax accumulators — so memory stays O(H·W) regardless of D and a
whole scene tile fits on chip.

Stability note (deliberate improvement): the reference accumulates raw
exp(logit) in float64 (casred.py:219-236).  Emulated float64 is slow on TPU;
instead the scan carries a running max `m` and max-shifted sums
(s = Σ exp(l − m), ds = Σ d·exp(l − m)), the standard online softmax — exact
in float32 for any logit range.  Final depth = ds/s; confidence
(= max-plane probability) = 1/s since exp(m − m) = 1.

Parameter compatibility: consumes CascadeREDNet *training* checkpoints
directly — the nn.scan'd RED parameters live under
params["REDRegularizer_i"]["ScanREDStep_0"] with exactly the bare REDStep
structure (verified by tests/test_infer.py golden equivalence).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..models.cascade import STAGE_SCALES, build_stage_volume, stage_hypotheses
from ..nn.featurenet import FeatureNet
from ..nn.red import REDStep, init_red_states


def extract_submodules(variables: dict):
    """Split CascadeREDNet variables into (featurenet vars, [REDStep params])."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    feat_vars = {"params": params["FeatureNet_0"]}
    if "FeatureNet_0" in batch_stats:
        feat_vars["batch_stats"] = batch_stats["FeatureNet_0"]
    red_params = []
    i = 0
    while f"REDRegularizer_{i}" in params:
        red_params.append(params[f"REDRegularizer_{i}"]["ScanREDStep_0"])
        i += 1
    return feat_vars, red_params


def streaming_red_forward(
    variables: dict,
    imgs: jnp.ndarray,
    cams: Any,
    depth_values: jnp.ndarray,
    geo_model: str = "rpc",
    ndepths=(64, 32, 8),
    depth_intervals_ratio=(4.0, 2.0, 1.0),
    min_interval: float = 2.5,
    feat_base_chs: int = 8,
    cr_base_chs=(8, 8, 8),
):
    """Full cascade forward with plane streaming.  Same input contract as
    CascadeModel.__call__; jit-friendly (wrap in jax.jit with static config
    via functools.partial)."""
    num_stage = len(ndepths)
    scales = STAGE_SCALES[num_stage]
    b, v, height, width, _ = imgs.shape

    feat_vars, red_params = extract_submodules(variables)
    feat_net = FeatureNet(feat_base_chs, num_stage, "unet")
    flat = imgs.reshape(b * v, height, width, imgs.shape[-1])
    stage_feats = [
        f.reshape(b, v, f.shape[1], f.shape[2], f.shape[3])
        for f in feat_net.apply(feat_vars, flat, False)
    ]

    outputs = {}
    depth = None
    d_min, d_max = depth_values[:, 0], depth_values[:, -1]

    for i in range(num_stage):
        scale = scales[i]
        sh, sw = height // scale, width // scale
        nd = ndepths[i]
        interval = depth_intervals_ratio[i] * min_interval
        hyps = stage_hypotheses(nd, sh, sw, d_min, d_max, interval, depth=depth)

        feats_i = stage_feats[i]
        cams_i = cams[i]
        step_mod = REDStep(cr_base_chs[i])
        step_params = {"params": red_params[i]}

        states0 = init_red_states(b, sh, sw, cr_base_chs[i], imgs.dtype)
        # online-softmax carry: running max m, s = Σ exp(l−m), ds = Σ d·exp(l−m)
        m0 = jnp.full((b, sh, sw), -jnp.inf, imgs.dtype)
        s0 = jnp.zeros((b, sh, sw), imgs.dtype)
        ds0 = jnp.zeros((b, sh, sw), imgs.dtype)

        def plane_step(carry, hyp_plane, feats_i=feats_i, cams_i=cams_i,
                       step_mod=step_mod, step_params=step_params):
            states, m, s, ds = carry
            # hyp_plane: (B, sh, sw) — warp a single depth plane (D=1)
            vol = build_stage_volume(geo_model, feats_i, cams_i, hyp_plane[:, None])
            cost = vol[:, 0]  # (B, sh, sw, C)
            states, logit = step_mod.apply(step_params, states, cost)
            new_m = jnp.maximum(m, logit)
            rescale = jnp.exp(m - new_m)
            p = jnp.exp(logit - new_m)
            s = s * rescale + p
            ds = ds * rescale + hyp_plane * p
            return (states, new_m, s, ds), None

        (_, _, s, ds), _ = jax.lax.scan(
            plane_step,
            (states0, m0, s0, ds0),
            jnp.moveaxis(hyps, 1, 0),  # (D, B, sh, sw)
        )
        depth = ds / jnp.maximum(s, 1e-10)
        conf = 1.0 / jnp.maximum(s, 1e-10)  # prob of the argmax plane
        outputs[f"stage{i + 1}"] = {"depth": depth, "photometric_confidence": conf}

    outputs.update(outputs[f"stage{num_stage}"])
    return outputs
