"""Shared coarse-to-fine cascade engine for all three model families.

The reference duplicates the cascade driver across CascadeREDNet /
CascadeMVSNet / UCSNet (/root/reference/networks/{casred,casmvs,ucs}.py);
SURVEY.md §7 calls for centralizing it.  `CascadeModel` owns:

  * per-view feature extraction (views folded into the batch axis),
  * per-stage depth-hypothesis generation (uniform → window → uncertainty),
  * plane-sweep cost-volume construction under either geo model,
  * regularization via a stage-indexed submodule list,
  * soft-argmax regression + the model family's confidence measure.

Input contract (channels-last, view 0 = reference view):
  imgs:          (B, V, H, W, 3)
  cams:          per-stage tuple, coarsest first —
                   geo_model="rpc":     RpcWarpCams with leading batch axis
                   geo_model="pinhole": (B, V, 4, 4) projection matrices
  depth_values:  (B, 2) = [h_min, h_max] scene height range
                 (ref satmvsdataset.py:67 passes exactly this)

Output: {"stage{i}": {"depth", "photometric_confidence", ...}} (stage1 =
coarsest, like the reference's outputs) plus top-level final-stage aliases.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.costreg import CostRegNet
from ..nn.featurenet import FeatureNet
from ..nn.red import REDRegularizer
from ..ops import depth_range, regression
from ..ops.cost_volume import sweep_variance_volume
from ..ops.warp import QcWarpCams, RpcWarpCams, homo_warp, rpc_warp

STAGE_SCALES = {3: (4, 2, 1), 2: (4, 1), 1: (4,)}



def stage_hypotheses(
    nd: int,
    sh: int,
    sw: int,
    d_min,
    d_max,
    interval: float,
    depth=None,
    exp_var=None,
    sampler: str = "window",
    detach: bool = False,
):
    """Depth hypotheses (B, D, sh, sw) for one cascade stage.

    First stage (depth=None): uniform sweep of the scene range; later stages:
    per-pixel window (or uncertainty window) around the upsampled previous
    estimate.  Shared by the training cascade and streaming inference.
    """
    if depth is None:
        return jax.vmap(
            lambda lo, hi: depth_range.uniform_samples(lo, hi, nd, sh, sw)
        )(d_min, d_max)
    prev = jax.lax.stop_gradient(depth) if detach else depth
    cur = jax.vmap(lambda x: depth_range.upsample_map(x, sh, sw))(prev)
    if sampler == "uncertainty":
        ev = jax.lax.stop_gradient(exp_var) if detach else exp_var
        ev = jax.vmap(lambda x: depth_range.upsample_map(x, sh, sw))(ev)
        return jax.vmap(
            lambda c, e, lo, hi: depth_range.uncertainty_samples(c, e, nd, lo, hi)
        )(cur, ev, d_min, d_max)
    return jax.vmap(lambda c: depth_range.window_samples(c, nd, interval))(cur)


def build_stage_volume(geo_model: str, feats, cams, hyps, fused: bool = False,
                       stencil: int = 8, convention: str = "exact",
                       layout: str = "nhwc", volume_dtype=None):
    """(B, V, h, w, C) features + cameras + (B, D, h, w) hypotheses →
    variance cost volume (batch via vmap): (B, D, h, w, C), or (B, D, h, C, w)
    with layout="hcw" — the Pallas kernels' native layout, which the
    row-packed RED pipeline consumes directly (saves the volume-sized
    relayout copies XLA otherwise inserts at every kernel boundary).

    fused=True (TPU): ONE Pallas kernel warps all source views and
    accumulates the variance moments — per-view warped volumes never touch
    HBM (ops/pallas/sweep_variance.py).  Differentiable (custom VJP), so
    training uses it too; it samples at the coarse-grid projected coords
    (≤0.02 px vs exact — test-gated), a deliberate trade accepted for both
    train and inference.
    """
    is_qc = geo_model == "rpc" and isinstance(cams, QcWarpCams)
    if geo_model == "rpc" and fused and jax.default_backend() == "tpu":
        from ..ops.coarse_coords import rpc_sweep_coords_coarse
        from ..ops.pallas.sweep_variance import sweep_variance
        from ..ops.warp import rpc_sweep_coords_qc

        b, v, sh, sw, _ = feats.shape

        def one(feats_b, cams_b, hyps_b):
            proj = rpc_sweep_coords_qc if is_qc else rpc_sweep_coords_coarse
            coords = [
                proj(cams_b, s, hyps_b, sh, sw)
                for s in range(v - 1)
            ]
            xs = jnp.stack([c[0] for c in coords])
            ys = jnp.stack([c[1] for c in coords])
            if convention == "torch":
                from ..ops.sampling import torch_grid_coords

                xs, ys = torch_grid_coords(xs, ys, sh, sw)
            return sweep_variance(feats_b[0], feats_b[1:], xs, ys,
                                  kv=stencil, ks=stencil, layout=layout)

        # static python loop over batch (pallas under vmap is fragile)
        vols = [
            one(feats[i], jax.tree.map(lambda x: x[i], cams), hyps[i])
            for i in range(b)
        ]
        return jnp.stack(vols)

    if geo_model == "rpc":

        def one(feats_b, cams_b, hyps_b):  # RpcWarpCams or QcWarpCams
            ref = feats_b[0]
            if layout == "hcw":
                ref = jnp.swapaxes(ref, 1, 2)  # (h, C, w) to match moments
            return sweep_variance_volume(
                ref,
                feats_b[1:],
                lambda sf, s: rpc_warp(sf, cams_b, s, hyps_b, stencil=stencil,
                                       convention=convention, layout=layout,
                                       out_dtype=volume_dtype),
            )

    else:

        def one(feats_b, projs_b, hyps_b):
            vol = sweep_variance_volume(
                feats_b[0],
                feats_b[1:],
                lambda sf, s: homo_warp(sf, projs_b[s + 1], projs_b[0], hyps_b,
                                        stencil=stencil, convention=convention,
                                        out_dtype=volume_dtype),
            )
            # pinhole warp has no native-hcw path; transpose for consumers
            return jnp.swapaxes(vol, 2, 3) if layout == "hcw" else vol

    return jax.vmap(one)(feats, cams, hyps)


class CascadeModel(nn.Module):
    """Base cascade MVS model; families differ via the knobs below."""

    geo_model: str = "rpc"                       # "rpc" | "pinhole"
    ndepths: Sequence[int] = (64, 32, 8)
    depth_intervals_ratio: Sequence[float] = (4.0, 2.0, 1.0)
    min_interval: float = 2.5                    # = image GSD (ref readme.md:39)
    cr_base_chs: Sequence[int] = (8, 8, 8)
    feat_base_chs: int = 8
    arch_mode: str = "unet"                      # feature decoder mode
    regularizer: str = "red"                     # "red" | "costreg"
    sampler: str = "window"                      # "window" | "uncertainty"
    confidence: str = "max"                      # "max" | "window4"
    grad_method: str = "through"                 # "through" | "detach"
    share_cr: bool = False                       # share one regularizer across stages
    lamb: float = 1.5                            # uncertainty width (UCS)
    # Optional PartitionSpec for (B, D, h, w, C) cost volumes — one spec for
    # all stages, or a per-stage sequence (dist.mesh.stage_volume_specs,
    # which guards the depth axis against too-shallow stages); when set (and
    # running under a mesh context) XLA keeps volumes sharded over the named
    # axes and inserts conv halo exchanges — see dist/mesh.py.
    volume_partition: object = None
    # Compute dtype of the conv stacks (FeatureNet, the RED hoisted
    # encoder/decoder/x-contrib convs, CostRegNet) — e.g. jnp.bfloat16 for
    # fewer MXU passes + half the HBM traffic.  Params, the GRU recurrence,
    # the variance moments, and all Pallas kernels stay fp32.
    compute_dtype: object = None
    # HBM storage dtype of the per-view warped volumes on the gather-path
    # sweep (the training path) — jnp.bfloat16 halves the sweep's volume
    # transport: the gather kernel stores bf16 (f32 tap accumulation, one
    # cast at the store), the variance moments upcast at read and accumulate
    # f32, and the backward's volume cotangents travel bf16 into the f32
    # scatter.  Sampling math, moments, the variance volume, and all
    # gradients stay f32.  None = f32 (the fp32-exact default).
    # NOTE: the FUSED sweep (fused_sweep / train_fused_sweep) never
    # materializes per-view volumes in HBM, so this knob is a no-op there —
    # combining the two is legal but bf16 transport then changes nothing.
    volume_dtype: object = None
    # Fused one-kernel sweep+variance volume for the INFERENCE path (the
    # training path is governed by train_fused_sweep below).  None = auto
    # (on when the backend is TPU — build_stage_volume's own gate); False
    # forces the per-view XLA/gather sampling path.  A real config field,
    # visible to checkpoint/config metadata — replaces the old import-time
    # SATMVS_FUSED_SWEEP env kill-switch (models.build_model still seeds this
    # from that env var once at build, as a legacy A/B override).
    fused_sweep: Optional[bool] = None
    # Tap-stencil half-width of the Pallas sweep kernels (the fused inference
    # sweep AND the per-view training gathers + their scatter adjoints); 8 is
    # safe for any plausible satellite geometry, 4 is ~2x faster and exact
    # when ops.warp.sweep_coverage_misses(..., stencil=4) is all-zero for the
    # scene's cameras (the train/predict CLIs check this).
    sweep_stencil: int = 8
    # Use the fused one-kernel sweep+variance volume in TRAINING too (its
    # custom-VJP backward re-gathers the warped views it never stored —
    # measured net slower at batch 1 pre-dual-path, but the right trade when
    # cost-volume memory binds).  A real config field (not an env read at
    # trace time — a jitted step would silently cache the first-seen value);
    # train/loop.create_model_and_state seeds it from SATMVS_TRAIN_FUSED_SWEEP
    # once at model build for A/B runs.
    train_fused_sweep: bool = False
    # Use the fused Pallas RED pipeline (row-packed recurrence kernels) for
    # the "red" regularizer.  None = auto (on when the backend is TPU, where
    # the kernels exist); True/False forces.  A real config field, same
    # rationale as train_fused_sweep above — the old SATMVS_FUSED_RED env
    # read inside __call__ was a trace-time read a jitted step would cache;
    # build_model seeds this from that env var once at build for A/B runs.
    fused_red: Optional[bool] = None
    # Rematerialize the regularizers during backprop (jax.checkpoint): trades
    # recompute for activation memory — enables training larger tiles / depth
    # counts (the memory-frugality analog of the reference's streaming trick,
    # on the training side).
    remat: bool = False
    # Reference-compat numerics for converted checkpoints: (a) sample warped
    # features at the positions the reference's grid_sample(align_corners=
    # False) actually reads (a x·W/(W−1)−0.5 stretch, warping.py:350-358),
    # (b) reproduce its full-res-then-trilinear-downsample hypothesis chain
    # for the window sampler (casred.py:133-145).  Default off — the native
    # mode samples at the geometrically correct location instead.
    torch_compat: bool = False

    @nn.compact
    def __call__(self, imgs, cams, depth_values, train: bool = False):
        assert self.geo_model in ("rpc", "pinhole")
        num_stage = len(self.ndepths)
        scales = STAGE_SCALES[num_stage]
        b, v, height, width, _ = imgs.shape

        # ---- feature extraction: fold views into batch (shared weights)
        feat_net = FeatureNet(self.feat_base_chs, num_stage, self.arch_mode,
                              dtype=self.compute_dtype)
        flat = imgs.reshape(b * v, height, width, imgs.shape[-1])
        stage_feats = feat_net(flat, train)  # list coarsest-first
        stage_feats = [
            f.reshape(b, v, f.shape[1], f.shape[2], f.shape[3]) for f in stage_feats
        ]

        # ---- stage regularizers
        def make_reg(i):
            if self.regularizer == "red":
                return REDRegularizer(self.cr_base_chs[i], dtype=self.compute_dtype)
            return CostRegNet(self.cr_base_chs[i], dtype=self.compute_dtype)

        if self.share_cr:
            shared = make_reg(0)
            regs = [shared] * num_stage
        else:
            regs = [make_reg(i) for i in range(num_stage)]

        outputs = {}
        depth = None
        exp_var = None
        d_min, d_max = depth_values[:, 0], depth_values[:, -1]

        for i in range(num_stage):
            scale = scales[i]
            sh, sw = height // scale, width // scale
            nd = self.ndepths[i]
            interval = self.depth_intervals_ratio[i] * self.min_interval

            # ---- hypothesis generation (at stage resolution)
            if (self.torch_compat and self.sampler == "window"
                    and depth is not None):
                # reference chain: prev depth → bilinear up to FULL res →
                # per-pixel window → trilinear down to stage res
                # (casred.py:133-145, casmvs.py:146-165); the up-then-down
                # detour slightly smooths vs our direct-at-stage-res path.
                prev = (jax.lax.stop_gradient(depth)
                        if self.grad_method == "detach" else depth)
                cur_full = jax.vmap(
                    lambda x: depth_range.upsample_map(x, height, width)
                )(prev)
                hyps_full = jax.vmap(
                    lambda c: depth_range.window_samples(c, nd, interval)
                )(cur_full)
                hyps = jax.vmap(
                    lambda v: jax.image.resize(v, (nd, sh, sw),
                                               method="trilinear",
                                               antialias=False)
                )(hyps_full)
            else:
                hyps = stage_hypotheses(
                    nd, sh, sw, d_min, d_max, interval,
                    depth=depth, exp_var=exp_var, sampler=self.sampler,
                    detach=(self.grad_method == "detach"),
                )

            # ---- cost volume + regularization
            # fused one-kernel volume at inference; training keeps the
            # per-view gather path unless train_fused_sweep (field above).
            # TPU + fused RED: the volume is built AND consumed in the
            # Pallas kernels' native (..., h, C, w) layout — the NHWC
            # round-trips at the kernel boundaries were ~15-20 ms of the
            # train step (relayout copies, NOTES round-3 cost map).
            fused_red = (jax.default_backend() == "tpu"
                         if self.fused_red is None else bool(self.fused_red))
            vol_layout = ("hcw" if self.regularizer == "red" and fused_red
                          and not self.remat else "nhwc")
            fused_sweep = (True if self.fused_sweep is None
                           else bool(self.fused_sweep))
            volume = build_stage_volume(
                self.geo_model, stage_feats[i], cams[i], hyps,
                fused=((not train) or self.train_fused_sweep) and fused_sweep,
                stencil=self.sweep_stencil,
                convention="torch" if self.torch_compat else "exact",
                layout=vol_layout,
                volume_dtype=self.volume_dtype,
            )
            if self.volume_partition is not None:
                # specs name axes (B, D, H, ...) — H is index 2 in BOTH
                # layouts, so the same spec applies
                vp = (self.volume_partition[i]
                      if isinstance(self.volume_partition, (tuple, list))
                      else self.volume_partition)
                volume = jax.lax.with_sharding_constraint(volume, vp)
            if self.remat:
                # rematerialize through the regularizer (train stays static)
                if self.regularizer == "red":
                    logits = nn.remat(lambda mdl, v: mdl(v))(regs[i], volume)
                else:
                    logits = nn.remat(lambda mdl, v: mdl(v, train))(regs[i], volume)
            elif self.regularizer == "red":
                logits = regs[i](volume, fused_red, layout=vol_layout)
            else:
                logits = regs[i](volume, train)
            prob = jax.nn.softmax(logits, axis=1)  # (B, D, h, w)

            # ---- regression + confidence
            depth = jnp.sum(prob * hyps, axis=1)
            if self.confidence == "window4":
                conf = jax.vmap(lambda p: regression.window_prob_confidence(p, 4))(prob)
            else:
                conf = jnp.max(prob, axis=1)

            stage_out = {"depth": depth, "photometric_confidence": conf}
            if self.sampler == "uncertainty":
                exp_var = jax.vmap(
                    lambda p, hv, dd: regression.expected_variance(p, hv, dd, self.lamb)
                )(prob, hyps, depth)
                stage_out["variance"] = exp_var
            outputs[f"stage{i + 1}"] = stage_out

        outputs.update(outputs[f"stage{num_stage}"])
        return outputs
