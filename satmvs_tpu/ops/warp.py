"""Plane-sweep warping under RPC and pinhole camera models.

TPU re-design of /root/reference/modules/warping.py.  Differences that matter:

  * channels-last: features are (H, W, C); warped volumes are (D, H, W, C).
  * float32 throughout.  The RPC chain runs in normalized coordinates with
    host-precomputed float64 cross-view renormalization (see geo/rpc.py
    docstring); validated < 0.01 px against the reference's float64 math.
  * the 8 rational polynomials per warp are two (N, 20) @ (20, 4) matmuls
    (MXU) instead of 8 broadcast-multiply reductions.
  * unbatched core functions; batch is `jax.vmap` at the model layer;
    geometry gets no gradient (lax.stop_gradient), matching the reference's
    torch.no_grad() design (gradients flow through sampled feature values).

Host-side preparation: `build_rpc_warp_cams` turns (V, 170) float64 RPC
vectors into the fp32 `RpcWarpCams` pytree the jitted warp consumes.  This is
the only place float64 appears, and it runs in the input pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geo import rpc as rpclib
from .sampling import bilinear_sample


class RpcWarpCams(NamedTuple):
    """fp32 camera bundle for one (ref, srcs...) plane-sweep configuration.

    Leading axis of src_* is the source-view axis (V-1 views).
    """

    ref_inv: jnp.ndarray     # (20, 4)  inverse RPC of the reference view
    ref_norm: jnp.ndarray    # (3, 2)   [[off, inv_scale] x (samp, line, hei)]
    src_fwd: jnp.ndarray     # (S, 20, 4) direct RPCs of source views
    src_denorm: jnp.ndarray  # (S, 2, 2) [[scale, off] x (samp, line)]
    renorm: jnp.ndarray      # (S, 3, 2) [[scale, shift] x (lat, lon, hei)] ref_n → src_n


def build_rpc_warp_cams(rpcs: np.ndarray, ref_index: int = 0, stage_scale: float = 1.0):
    """Build `RpcWarpCams` from raw (V, 170) float64 RPCs (host side).

    Args:
      rpcs: (V, 170) float64; row `ref_index` is the reference view.
      stage_scale: image-space scale of this cascade stage (1, 1/2, 1/4) —
        replaces the reference's per-stage dict of divided RPC vectors
        (/root/reference/dataset/satmvsdataset.py:83-99).
    """
    rpcs = np.asarray(rpcs, dtype=np.float64)
    scaled = np.stack([rpclib.scale_rpc(r.copy(), stage_scale) for r in rpcs])
    ref = scaled[ref_index]
    srcs = [scaled[v] for v in range(len(scaled)) if v != ref_index]

    ref_norm = np.array(
        [
            [ref[rpclib.SAMP_OFF], 1.0 / ref[rpclib.SAMP_SCALE]],
            [ref[rpclib.LINE_OFF], 1.0 / ref[rpclib.LINE_SCALE]],
            [ref[rpclib.HEI_OFF], 1.0 / ref[rpclib.HEI_SCALE]],
        ]
    )
    src_denorm = np.stack(
        [
            np.array(
                [
                    [s[rpclib.SAMP_SCALE], s[rpclib.SAMP_OFF]],
                    [s[rpclib.LINE_SCALE], s[rpclib.LINE_OFF]],
                ]
            )
            for s in srcs
        ]
    )
    return RpcWarpCams(
        ref_inv=jnp.asarray(rpclib.inv_coef_matrix(ref), jnp.float32),
        ref_norm=jnp.asarray(ref_norm, jnp.float32),
        src_fwd=jnp.asarray(
            np.stack([rpclib.fwd_coef_matrix(s) for s in srcs]), jnp.float32
        ),
        src_denorm=jnp.asarray(src_denorm, jnp.float32),
        renorm=jnp.asarray(
            np.stack([rpclib.renorm_affine(ref, s) for s in srcs]), jnp.float32
        ),
    )


def build_stage_cams(rpcs: np.ndarray, ref_index: int = 0, num_stage: int = 3):
    """Per-cascade-stage camera bundles, coarsest first (host side).

    Stage scales follow the reference convention (casred.py:86-106):
    3 stages → 1/4, 1/2, 1; 2 stages → 1/4, 1.  Replaces the reference
    dataset's inverted stage-keyed dict of divided RPC vectors.
    """
    scales = {3: (0.25, 0.5, 1.0), 2: (0.25, 1.0), 1: (0.25,)}[num_stage]
    return tuple(build_rpc_warp_cams(rpcs, ref_index, s) for s in scales)


def stack_cams(cams_list):
    """Stack per-sample camera bundles into one batched pytree (leading B)."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams_list)


def rpc_transform_points(cams: RpcWarpCams, src_index, x, y, h):
    """Map arbitrary ref photo coords + heights to src photo coords.

    The fp32 normalized-space chain: ref photo → (inverse RPC) → ref-normalized
    object → (host-fp64 renorm affine) → src-normalized object → (direct RPC)
    → src photo.  Shapes broadcast; returns (x_src, y_src) like x.
    """
    rn = cams.ref_norm
    xn = (x - rn[0, 0]) * rn[0, 1]
    yn = (y - rn[1, 0]) * rn[1, 1]
    hn = (h - rn[2, 0]) * rn[2, 1]

    lat_n, lon_n = rpclib.photo_to_obj_n(cams.ref_inv, xn, yn, hn)

    aff = cams.renorm[src_index]  # (3, 2)
    lat_s = lat_n * aff[0, 0] + aff[0, 1]
    lon_s = lon_n * aff[1, 0] + aff[1, 1]
    hei_s = hn * aff[2, 0] + aff[2, 1]

    samp_n, line_n = rpclib.obj_to_photo_n(cams.src_fwd[src_index], lat_s, lon_s, hei_s)

    dn = cams.src_denorm[src_index]
    x_src = samp_n * dn[0, 0] + dn[0, 1]
    y_src = line_n * dn[1, 0] + dn[1, 1]
    return x_src, y_src


def rpc_sweep_coords(cams: RpcWarpCams, src_index, depth_values: jnp.ndarray, height: int, width: int):
    """Source-view pixel coordinates of the RPC plane sweep.

    Args:
      cams: fp32 camera bundle.
      src_index: which source view (int or traced scalar).
      depth_values: (D, H, W) or (D,) height hypotheses in meters.
      height, width: reference grid size.

    Returns:
      (x_src, y_src) each (D, H, W), float32.
    """
    d = depth_values.shape[0]
    if depth_values.ndim == 1:
        depth_values = depth_values.reshape(d, 1, 1) * jnp.ones((1, height, width), depth_values.dtype)

    xs = jax.lax.broadcasted_iota(jnp.float32, (d, height, width), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (d, height, width), 1)
    return rpc_transform_points(cams, src_index, xs, ys, depth_values.astype(jnp.float32))


def _use_pallas_gather(height: int) -> bool:
    return jax.default_backend() == "tpu" and height % 8 == 0


def rpc_warp(src_feat: jnp.ndarray, cams: RpcWarpCams, src_index, depth_values: jnp.ndarray,
             method: str = "auto", coords: str = "auto", stencil: int = 8,
             convention: str = "exact", layout: str = "nhwc", out_dtype=None):
    """RPC plane-sweep warp of one source feature map.

    src_feat: (H, W, C) — the source view's features at this stage's scale.
    depth_values: (D, H, W) or (D,) height hypotheses.
    method: "auto" (fused Pallas stencil kernel on TPU, XLA gather elsewhere),
            "pallas", or "xla".
    coords: "auto" (coarse-grid projection on TPU — < 0.02 px vs exact, see
            ops/coarse_coords.py — exact elsewhere), "coarse", or "exact".
    stencil: tap half-width of the Pallas gather (and its scatter adjoint);
            4 is ~2x faster than 8 and exact whenever
            `sweep_coverage_misses(..., stencil=4)` is all-zero.
    convention: "exact" samples at the true projected pixel location; "torch"
            reproduces the reference's grid_sample(align_corners=False)
            stretch (see ops/sampling.torch_grid_coords) for checkpoint-exact
            behavior.
    layout: "nhwc" returns (D, H, W, C); "hcw" returns (D, H, C, W) — the
            Pallas kernels' native layout, sparing the volume-sized relayout
            copies when the consumer (the row-packed RED pipeline) accepts it.
    out_dtype: storage dtype of the warped volume (None = f32).  bfloat16
            halves the sweep's HBM volume transport (forward store and the
            backward cotangent read); all sampling/scatter math stays f32
            (ops/pallas/sweep_gather.py) and the moment consumers accumulate
            f32 (ops/cost_volume.py).
    Returns the warped volume.  TPU analog of /root/reference/modules/warping.py:310-365.
    """
    h, w, _ = src_feat.shape
    if isinstance(cams, QcWarpCams):
        # the use_qc variant evaluates the packed (4,4,4) tensors exactly
        # (no coarse grid — the dot_general chain IS its fast form)
        x_src, y_src = jax.lax.stop_gradient(
            rpc_sweep_coords_qc(cams, src_index, depth_values, h, w)
        )
    elif coords == "coarse" or (coords == "auto" and jax.default_backend() == "tpu"):
        from .coarse_coords import rpc_sweep_coords_coarse

        x_src, y_src = jax.lax.stop_gradient(
            rpc_sweep_coords_coarse(cams, src_index, depth_values, h, w)
        )
    else:
        x_src, y_src = jax.lax.stop_gradient(
            rpc_sweep_coords(cams, src_index, depth_values, h, w)
        )
    if convention == "torch":
        from .sampling import torch_grid_coords

        x_src, y_src = torch_grid_coords(x_src, y_src, h, w)
    if method == "pallas" or (method == "auto" and _use_pallas_gather(h)):
        from .pallas.sweep_gather import sweep_gather

        return sweep_gather(src_feat, x_src, y_src, kv=stencil, ks=stencil,
                            layout=layout, out_dtype=out_dtype)
    out = bilinear_sample(src_feat, x_src, y_src)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return jnp.swapaxes(out, 2, 3) if layout == "hcw" else out


# ---------------------------------------------------------------------------
# quaternary-cubic (QC) form variant — the reference's `use_qc` path
# ---------------------------------------------------------------------------
class QcWarpCams(NamedTuple):
    """Camera bundle for the QC-form RPC sweep (ref modules/warping.py:47-178).

    Same normalization/renorm scalars as RpcWarpCams; polynomials are packed
    as symmetric (4, 4, 4) tensors evaluated by an einsum (a dot_general
    chain on TPU).  Functionally identical to the 20-term basis path — kept
    for feature parity with `--use_qc` and as a cross-validation path.
    """

    ref_inv_qc: jnp.ndarray   # (4, 4, 4, 4)  [latnum, latden, lonnum, londen]
    ref_norm: jnp.ndarray     # (3, 2)
    src_fwd_qc: jnp.ndarray   # (S, 4, 4, 4, 4)  [snum, sden, lnum, lden]
    src_denorm: jnp.ndarray   # (S, 2, 2)
    renorm: jnp.ndarray       # (S, 3, 2)


def build_qc_warp_cams(rpcs: np.ndarray, ref_index: int = 0, stage_scale: float = 1.0) -> QcWarpCams:
    base = build_rpc_warp_cams(rpcs, ref_index, stage_scale)
    rpcs = np.asarray(rpcs, dtype=np.float64)
    scaled = np.stack([rpclib.scale_rpc(r.copy(), stage_scale) for r in rpcs])
    ref = scaled[ref_index]
    srcs = [scaled[v] for v in range(len(scaled)) if v != ref_index]
    ref_qc = np.stack([rpclib.to_qc_tensor(ref[sl])
                       for sl in (rpclib.LATNUM, rpclib.LATDEM, rpclib.LONNUM, rpclib.LONDEM)])
    src_qc = np.stack([
        np.stack([rpclib.to_qc_tensor(s[sl])
                  for sl in (rpclib.SNUM, rpclib.SDEM, rpclib.LNUM, rpclib.LDEM)])
        for s in srcs
    ])
    return QcWarpCams(
        ref_inv_qc=jnp.asarray(ref_qc, jnp.float32),
        ref_norm=base.ref_norm,
        src_fwd_qc=jnp.asarray(src_qc, jnp.float32),
        src_denorm=base.src_denorm,
        renorm=base.renorm,
    )


def build_qc_stage_cams(rpcs: np.ndarray, ref_index: int = 0, num_stage: int = 3):
    """Per-cascade-stage QC camera bundles, coarsest first — the `--use_qc`
    twin of `build_stage_cams` (ref dataset/satmvsdataset.py:166-294 builds
    per-stage QC tensor dicts)."""
    scales = {3: (0.25, 0.5, 1.0), 2: (0.25, 1.0), 1: (0.25,)}[num_stage]
    return tuple(build_qc_warp_cams(rpcs, ref_index, s) for s in scales)


def _qc_pair(qc4: jnp.ndarray, p, l, h):
    """Evaluate two rational QC polynomials: qc4 (4, 4, 4, 4) =
    [num_a, den_a, num_b, den_b]; x = (1, L, P, H) per the reference packing
    (ref modules/warping.py:80-81,120-121)."""
    x = jnp.stack([jnp.ones_like(p), l, p, h], axis=-1)         # (..., 4)
    # fp32-exact: default TPU dot precision is one bf16 pass — ~0.4% relative
    # error that scales to ±10 px at 5120² scenes (geo/rpc._rational_pair)
    vals = jnp.einsum("...i,...j,...k,nijk->...n", x, x, x, qc4,
                      precision=jax.lax.Precision.HIGHEST)
    return vals[..., 0] / vals[..., 1], vals[..., 2] / vals[..., 3]


def rpc_sweep_coords_qc(cams: QcWarpCams, src_index, depth_values: jnp.ndarray, height: int, width: int):
    """QC-form twin of `rpc_sweep_coords` (flag parity with --use_qc)."""
    d = depth_values.shape[0]
    if depth_values.ndim == 1:
        depth_values = depth_values.reshape(d, 1, 1) * jnp.ones((1, height, width), depth_values.dtype)
    xs = jax.lax.broadcasted_iota(jnp.float32, (d, height, width), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (d, height, width), 1)

    rn = cams.ref_norm
    xn = (xs - rn[0, 0]) * rn[0, 1]
    yn = (ys - rn[1, 0]) * rn[1, 1]
    hn = (depth_values.astype(jnp.float32) - rn[2, 0]) * rn[2, 1]

    # inverse: P = samp_n, L = line_n
    lat_n, lon_n = _qc_pair(cams.ref_inv_qc, xn, yn, hn)
    aff = cams.renorm[src_index]
    lat_s = lat_n * aff[0, 0] + aff[0, 1]
    lon_s = lon_n * aff[1, 0] + aff[1, 1]
    hei_s = hn * aff[2, 0] + aff[2, 1]
    # direct: P = lat_n, L = lon_n
    samp_n, line_n = _qc_pair(cams.src_fwd_qc[src_index], lat_s, lon_s, hei_s)
    dn = cams.src_denorm[src_index]
    return samp_n * dn[0, 0] + dn[0, 1], line_n * dn[1, 0] + dn[1, 1]


# ---------------------------------------------------------------------------
# pinhole homography sweep
# ---------------------------------------------------------------------------
def homo_sweep_coords(src_proj: jnp.ndarray, ref_proj: jnp.ndarray, depth_values: jnp.ndarray, height: int, width: int):
    """Source pixel coordinates of the classic MVS homography sweep.

    rel = src_proj @ inv(ref_proj); p_src ~ rel[:3,:3] @ (x, y, 1) * d + rel[:3,3].
    Mirrors /root/reference/modules/warping.py:6-44, float32 (works best with
    local-frame projection matrices — see data/dataset.py).
    Returns (x_src, y_src) each (D, H, W).
    """
    d = depth_values.shape[0]
    if depth_values.ndim == 1:
        depth_values = depth_values.reshape(d, 1, 1) * jnp.ones((1, height, width), depth_values.dtype)

    hi = jax.lax.Precision.HIGHEST  # fp32-exact (see _qc_pair note)
    rel = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=hi)
    rot = rel[:3, :3]
    trans = rel[:3, 3]

    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3)

    rot_pix = jnp.matmul(pix, rot.T, precision=hi)  # (H, W, 3)
    p = rot_pix[None] * depth_values[..., None] + trans  # (D, H, W, 3)
    z = p[..., 2]
    # guard against division blow-ups behind the camera (reference divides raw)
    z = jnp.where(jnp.abs(z) < 1e-6, jnp.full_like(z, 1e-6), z)
    return p[..., 0] / z, p[..., 1] / z


def homo_warp(src_feat: jnp.ndarray, src_proj: jnp.ndarray, ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
              method: str = "auto", stencil: int = 8, convention: str = "exact",
              out_dtype=None):
    """Homography plane-sweep warp: (H, W, C) → (D, H, W, C)."""
    h, w, _ = src_feat.shape
    x_src, y_src = jax.lax.stop_gradient(
        homo_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    )
    if convention == "torch":
        from .sampling import torch_grid_coords

        x_src, y_src = torch_grid_coords(x_src, y_src, h, w)
    if method == "pallas" or (method == "auto" and _use_pallas_gather(h)):
        from .pallas.sweep_gather import sweep_gather

        return sweep_gather(src_feat, x_src, y_src, kv=stencil, ks=stencil,
                            out_dtype=out_dtype)
    out = bilinear_sample(src_feat, x_src, y_src)
    return out.astype(out_dtype) if out_dtype is not None else out


def sweep_coverage_misses(rpcs: np.ndarray, ref_index: int = 0,
                          height: int = 384, width: int = 768,
                          num_stage: int = 3, ndepth: int = 16,
                          stencil: int = 8, depth_range=None):
    """Dropped-sample counts of the fused sweep kernels for a scene's cameras.

    The Pallas sweep kernels (ops/pallas/sweep_gather.py, sweep_variance.py)
    assume warp smoothness: within each 8-row output tile the integer sample
    offsets must span ≤ `stencil` pixels, else those samples contribute zero.
    This is the host-side gate of that contract: a full-height-range sweep at
    every cascade stage's resolution, sampled at the shipped coarse-grid
    projected coordinates.  Returns {stage: total dropped samples over all
    source views}; all-zero ⇒ the fused path is exact for this geometry
    (later cascade stages sweep narrower ranges, so stage-wise full-range
    coverage is the conservative bound).

    On a nonzero count: raise `CascadeModel.sweep_stencil`, or set
    CascadeModel.fused_sweep=False to fall back to the XLA sampling path.
    """
    rpcs = np.asarray(rpcs, np.float64)
    order = [ref_index] + [i for i in range(len(rpcs)) if i != ref_index]
    cams_stages = build_stage_cams(rpcs[order], 0, num_stage)
    if depth_range is None:
        depth_range = rpclib.height_range(rpcs[ref_index])
    return sweep_coverage_misses_from_cams(
        cams_stages, height, width, depth_range, ndepth=ndepth, stencil=stencil
    )


def sweep_coverage_misses_from_cams(cams_stages, height: int, width: int,
                                    depth_range, ndepth: int = 16,
                                    stencil: int = 8):
    """`sweep_coverage_misses` given already-built per-stage RpcWarpCams
    (e.g. a dataset sample's `cams`; pass un-batched bundles)."""
    from .coarse_coords import rpc_sweep_coords_coarse
    from .pallas.sweep_gather import count_misses

    num_stage = len(cams_stages)
    scales = {3: (0.25, 0.5, 1.0), 2: (0.25, 1.0), 1: (0.25,)}[num_stage]
    depths = jnp.linspace(float(depth_range[0]), float(depth_range[1]),
                          ndepth, dtype=jnp.float32)
    out = {}
    for stage, (cams, s) in enumerate(zip(cams_stages, scales), start=1):
        sh, sw = int(height * s), int(width * s)
        n_src = cams.renorm.shape[0]
        total = 0
        for src in range(n_src):
            if isinstance(cams, QcWarpCams):
                xs, ys = rpc_sweep_coords_qc(cams, src, depths, sh, sw)
            else:
                xs, ys = rpc_sweep_coords_coarse(cams, src, depths, sh, sw)
            total += int(count_misses(xs, ys, sh, sw, stencil, stencil).sum())
        out[stage] = total
    return out
