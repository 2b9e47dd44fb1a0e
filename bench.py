"""Benchmark harness — runs on the real TPU chip; prints ONE JSON line.

Primary metric (BASELINE.json): plane-sweep views/s/chip — full-depth-sweep
RPC warps + variance-cost accumulation per second, at the reference's stage-1
production geometry for a 384x768 WHU-TLC patch (feature map 96x192x32,
D=64 hypotheses, 2 source views, ref /root/reference/train.py:41-43).

vs_baseline is measured against a documented V100 proxy for the reference's
float64 torch warp at the same geometry: the reference materializes a
(B, D*H*W, 20) float64 monomial buffer (~189 MB of temporaries per warp,
/root/reference/networks/casred.py:34) through ~40 separate elementwise CUDA
kernels plus fp64 reductions; at V100 HBM bandwidth (900 GB/s) the traffic
alone bounds it near ~20 warps/s.  BASELINE_PROXY_VIEWS_PER_S = 20.0 (so the
>=5x build target corresponds to vs_baseline >= 5).

Secondary numbers (stderr): end-to-end CascadeRED forward images/s and a
train-step images/s at the same patch geometry.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from satmvs_tpu import cache as _cache

_cache.enable()  # persistent XLA/Mosaic compile cache (minutes → seconds)

BASELINE_PROXY_VIEWS_PER_S = 20.0

# stage-1 production geometry for a 384x768 patch
PATCH_H, PATCH_W = 384, 768
FEAT_H, FEAT_W, FEAT_C = PATCH_H // 4, PATCH_W // 4, 32
NUM_DEPTH = 64
NUM_SRC = 2

# Roofline constants (TPU v5e, single chip): bf16 MXU peak and HBM bandwidth.
# fp32 matmuls run below the bf16 peak (multi-pass); MFU is reported against
# the hardware bf16 ceiling so numbers are comparable across dtypes.
PEAK_FLOPS = 197e12
PEAK_HBM_GBS = 819.0


def _conv_fl(hh, ww, ci, co, k=3):
    return 2 * hh * ww * ci * co * k * k


def _deconv_fl(hin, win, ci, co, k=3):
    # input-based count: each input pixel feeds k*k outputs
    return 2 * hin * win * ci * co * k * k


def analytic_forward_flops(h=PATCH_H, w=PATCH_W, views=3,
                           ndepths=(64, 32, 8), fb=8, cb=8,
                           taps=25) -> float:
    """Conv/matmul/gather FLOPs of one CascadeRED forward (batch 1) — the
    numerator for MFU.  Counts FeatureNet, per-stage sweep (tap gathers +
    variance moments), RED encoder/GRU/decoder convs; skips softmax/resizes
    (<1%).  Matches the architecture in nn/featurenet.py + nn/red.py."""
    fl = 0.0
    # FeatureNet (unet), per view
    f = 0.0
    f += _conv_fl(h, w, 3, fb) + _conv_fl(h, w, fb, fb)
    f += _conv_fl(h // 2, w // 2, fb, 2 * fb, 5)
    f += 2 * _conv_fl(h // 2, w // 2, 2 * fb, 2 * fb)
    f += _conv_fl(h // 4, w // 4, 2 * fb, 4 * fb, 5)
    f += 2 * _conv_fl(h // 4, w // 4, 4 * fb, 4 * fb)
    f += _conv_fl(h // 4, w // 4, 4 * fb, 4 * fb, 1)
    f += _deconv_fl(h // 4, w // 4, 4 * fb, 2 * fb)      # DeconvFuse 1
    f += _conv_fl(h // 2, w // 2, 4 * fb, 2 * fb)
    f += _conv_fl(h // 2, w // 2, 2 * fb, 2 * fb, 1)
    f += _deconv_fl(h // 2, w // 2, 2 * fb, fb)          # DeconvFuse 2
    f += _conv_fl(h, w, 2 * fb, fb)
    f += _conv_fl(h, w, fb, fb, 1)
    fl += views * f
    # cascade stages: scale, ndepth, feature channels
    for scale, nd, cin in zip((4, 2, 1), ndepths, (4 * fb, 2 * fb, fb)):
        sh, sw = h // scale, w // scale
        # plane-sweep gather + variance moments over V-1 source views
        fl += 2 * (views - 1) * nd * sh * sw * cin * taps
        fl += 4 * (views - 1) * nd * sh * sw * cin
        # RED: encoder
        b = cb
        fl += nd * (_conv_fl(sh // 2, sw // 2, cin, 2 * b)
                    + _conv_fl(sh // 4, sw // 4, 2 * b, 4 * b)
                    + _conv_fl(sh // 8, sw // 8, 4 * b, 8 * b))
        # GRU cells (x-conv ci->3c, gates c->2c, cand c->c) at 4 scales
        for s, c, ci in ((1, b, cin), (2, 2 * b, 2 * b),
                         (4, 4 * b, 4 * b), (8, 8 * b, 8 * b)):
            hh, ww = sh // s, sw // s
            fl += nd * (_conv_fl(hh, ww, ci, 3 * c)
                        + _conv_fl(hh, ww, c, 2 * c)
                        + _conv_fl(hh, ww, c, c))
        # decoder + head
        fl += nd * (_deconv_fl(sh // 8, sw // 8, 8 * b, 4 * b)
                    + _deconv_fl(sh // 4, sw // 4, 4 * b, 2 * b)
                    + _deconv_fl(sh // 2, sw // 2, 2 * b, b)
                    + _conv_fl(sh, sw, b, 1))
    return fl


def _xla_bytes(fn, *args):
    """'bytes accessed' from XLA's compiled cost analysis (best-effort)."""
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed"))
    except Exception:
        return None


def _roofline_report(tag, dt, flops, fn=None, args=()):
    """Print achieved FLOP/s vs MXU peak and HBM GB/s vs bandwidth peak.
    Returns (mfu_fraction, hbm_fraction_or_None) for the parsed payload."""
    tf = flops / dt / 1e12
    mfu = tf * 1e12 / PEAK_FLOPS
    line = (f"[bench] {tag}: {tf:.1f} TFLOP/s analytic "
            f"({100 * mfu:.1f}% of bf16 peak)")
    by = _xla_bytes(fn, *args) if fn is not None else None
    hbm = None
    if by is not None:
        gbs = by / dt / 1e9
        hbm = gbs / PEAK_HBM_GBS
        line += (f"; XLA-counted {by / 1e6:.0f} MB -> {gbs:.0f} GB/s "
                 f"({100 * hbm:.0f}% of HBM peak)")
    print(line, file=sys.stderr)
    return mfu, hbm


def _time_fn(step, iters: int = 10) -> float:
    """Device time per iteration of `step: scalar -> scalar`.

    The remote-TPU tunnel adds per-dispatch latency and weak host-side
    blocking, so host-side loops mis-measure.  Instead `step` (which must
    fold its inputs with the carried scalar so iterations are data-dependent)
    is run `iters` times inside ONE jitted fori_loop — a single dispatch, a
    single scalar readback, pure pipelined device time.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c0)

    jax.block_until_ready(run(jnp.float32(0)))  # compile + warm
    best = float("inf")
    # best-of-5: identical code measured ±5% across sessions through the
    # remote tunnel (NOTES.md round-3 findings) — more reps tighten the tail
    for rep in range(5):
        t0 = time.perf_counter()
        out = run(jnp.float32(1 + rep))
        jax.block_until_ready(out)
        _ = float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_plane_sweep() -> float:
    """views/s for the fused warp+variance sweep (the #1 hot path)."""
    import jax
    import jax.numpy as jnp

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.ops import warp as warplib
    from satmvs_tpu.ops.cost_volume import sweep_variance_volume

    rpcs = synthetic.make_rpc_triplet(PATCH_W, PATCH_H, seed=0)
    cams = warplib.build_stage_cams(
        np.stack([rpcs[2], rpcs[0], rpcs[1]]), ref_index=0, num_stage=3
    )[0]  # coarsest stage (1/4 scale)

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(FEAT_H, FEAT_W, FEAT_C)).astype(np.float32))
    srcs = jnp.asarray(
        rng.normal(size=(NUM_SRC, FEAT_H, FEAT_W, FEAT_C)).astype(np.float32)
    )
    from satmvs_tpu.geo import rpc as rpclib

    h_min, h_max = rpclib.height_range(rpcs[2])
    depths = jnp.linspace(h_min, h_max, NUM_DEPTH, dtype=jnp.float32)

    # shipped inference path: fused Pallas sweep+variance kernel with the
    # coarse-grid projection; stencil size validated on this geometry first
    # (count_misses == 0 ⇒ the 25-tap stencil covers every sample)
    from satmvs_tpu.ops.coarse_coords import rpc_sweep_coords_coarse
    from satmvs_tpu.ops.pallas.sweep_gather import count_misses
    from satmvs_tpu.ops.pallas.sweep_variance import sweep_variance

    coords = [rpc_sweep_coords_coarse(cams, s, depths, FEAT_H, FEAT_W) for s in range(NUM_SRC)]
    misses = sum(
        int(count_misses(x, y, FEAT_H, FEAT_W, 4, 4).sum()) for x, y in coords
    )
    stencil = 4 if misses == 0 else 8
    print(f"[bench] stencil={stencil} (kv4 misses={misses})", file=sys.stderr)

    def step(c):
        d = depths + c * 1e-9
        cs = [rpc_sweep_coords_coarse(cams, s, d, FEAT_H, FEAT_W) for s in range(NUM_SRC)]
        import jax.numpy as jnp

        vol = sweep_variance(
            ref, srcs,
            jnp.stack([x for x, _ in cs]), jnp.stack([y for _, y in cs]),
            kv=stencil, ks=stencil,
        )
        return vol.ravel()[0]

    dt = _time_fn(step)
    views_per_s = NUM_SRC / dt
    pts = NUM_SRC * NUM_DEPTH * FEAT_H * FEAT_W
    print(
        f"[bench] plane_sweep: {dt * 1e3:.2f} ms/sweep, {views_per_s:.1f} views/s, "
        f"{pts / dt / 1e6:.0f} Mpts/s",
        file=sys.stderr,
    )
    return views_per_s


_RED_SETUP: dict = {}


def _red_setup():
    """(model, variables, batch) for the flagship 384x768 bench — memoized
    (model.init at the patch is a full forward; stream/forward share it)."""
    if not _RED_SETUP:
        import os

        import jax

        from satmvs_tpu.data import synthetic
        from satmvs_tpu.models import CascadeREDNet
        from satmvs_tpu.train.loop import numeric_batch

        batch = numeric_batch(
            synthetic.make_batch(batch_size=1, width=PATCH_W, height=PATCH_H,
                                 seed=0)
        )
        fused = (None if "SATMVS_FUSED_RED" not in os.environ
                 else os.environ["SATMVS_FUSED_RED"] != "0")
        model = CascadeREDNet(geo_model="rpc", ndepths=(64, 32, 8),
                              fused_red=fused)
        variables = model.init(
            jax.random.PRNGKey(0),
            batch["imgs"], batch["cams"], batch["depth_values"], train=False,
        )
        _RED_SETUP.update(model=model, variables=variables, batch=batch)
    return _RED_SETUP["model"], _RED_SETUP["variables"], _RED_SETUP["batch"]


def bench_model_forward() -> float:
    """End-to-end CascadeRED forward images/s at the 384x768 patch."""
    model, variables, batch = _red_setup()

    import jax.numpy as jnp

    imgs = jnp.asarray(batch["imgs"])
    cams = batch["cams"]
    dvals = jnp.asarray(batch["depth_values"])

    def step(c):
        out = model.apply(variables, imgs + c * 1e-12, cams, dvals, train=False)
        return out["depth"].ravel()[0]

    dt = _time_fn(step, iters=5)
    print(f"[bench] red_forward_384x768: {dt * 1e3:.1f} ms/image, {1 / dt:.2f} images/s",
          file=sys.stderr)
    mfu, hbm = _roofline_report("red_forward mfu", dt, analytic_forward_flops(),
                                step, (jnp.float32(0),))
    out = {"red_forward_ms": round(dt * 1e3, 1),
           "red_forward_img_s": round(1 / dt, 2),
           "red_forward_mfu": round(mfu, 4)}
    if hbm is not None:
        out["red_forward_hbm_frac"] = round(hbm, 3)
    return out


def bench_train_step() -> float:
    """Full jitted train step (loss+grads+RMSprop) images/s at the patch."""
    import jax
    import jax.numpy as jnp

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    cfg = Config(model="red", geo_model="rpc", ndepths=(64, 32, 8))
    batch = numeric_batch(
        synthetic.make_batch(batch_size=1, width=PATCH_W, height=PATCH_H, seed=0)
    )
    model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=100)
    train_step = make_train_step(model, tx, tuple(cfg.dlossw))

    imgs = batch["imgs"]

    def step(c):
        b = dict(batch, imgs=imgs + c * 1e-12)
        new_state, scalars = train_step(state, b)
        # fold an updated-params leaf into the carry so the backward pass and
        # optimizer update are NOT dead code (loss alone needs only forward)
        import jax

        leaf = jax.tree.leaves(new_state.params)[0]
        return scalars["loss"] + leaf.ravel()[0] * 1e-20

    dt = _time_fn(step, iters=3)
    print(f"[bench] red_train_384x768: {dt * 1e3:.1f} ms/step, {1 / dt:.2f} images/s",
          file=sys.stderr)
    # train MFU: algorithmic forward + backward = 3x forward FLOPs (the
    # kernels' in-VMEM recompute is not counted as useful work)
    mfu, hbm = _roofline_report("red_train mfu", dt, 3 * analytic_forward_flops(),
                                step, (jnp.float32(0),))
    out = {"red_train_ms": round(dt * 1e3, 1),
           "red_train_img_s": round(1 / dt, 2),
           "red_train_mfu": round(mfu, 4)}
    if hbm is not None:
        out["red_train_hbm_frac"] = round(hbm, 3)
    return out


def bench_cross_models() -> dict:
    """casmvs/ucs forward + train ms at the patch (the BASELINE cross-model
    table, mechanically diffable — reproduce: scripts/model_bench.py)."""
    import jax
    import jax.numpy as jnp

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.models import build_model
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    batch = numeric_batch(
        synthetic.make_batch(batch_size=1, width=PATCH_W, height=PATCH_H, seed=0)
    )
    imgs = jnp.asarray(batch["imgs"])
    dvals = jnp.asarray(batch["depth_values"])
    out = {}
    for name in ("casmvs", "ucs"):
        model = build_model(name, "rpc", ndepths=(64, 32, 8))
        variables = model.init(jax.random.PRNGKey(0), imgs, batch["cams"],
                               dvals, train=False)

        def fwd(c):
            o = model.apply(variables, imgs + c * 1e-12, batch["cams"],
                            dvals, train=False)
            return o["depth"].ravel()[0]

        dt = _time_fn(fwd, iters=5)
        out[f"{name}_forward_ms"] = round(dt * 1e3, 1)
        print(f"[bench] {name}_forward_384x768: {dt * 1e3:.1f} ms/image",
              file=sys.stderr)

        cfg = Config(model=name, geo_model="rpc", ndepths=(64, 32, 8))
        model_t, state, tx = create_model_and_state(cfg, batch,
                                                    steps_per_epoch=100)
        step_fn = make_train_step(model_t, tx, tuple(cfg.dlossw))

        def tstep(c):
            b = dict(batch, imgs=imgs + c * 1e-12)
            new_state, scalars = step_fn(state, b)
            leaf = jax.tree.leaves(new_state.params)[0]
            return scalars["loss"] + leaf.ravel()[0] * 1e-20

        dt = _time_fn(tstep, iters=3)
        out[f"{name}_train_ms"] = round(dt * 1e3, 1)
        print(f"[bench] {name}_train_384x768: {dt * 1e3:.1f} ms/step",
              file=sys.stderr)
    return out


def bench_stream_ratio(full_forward_ms: float) -> dict:
    """Slab-streaming forward vs the full-volume time measured above
    (same-process ratio; the per-process record is scripts/stream_bench.py)."""
    from functools import partial

    import jax.numpy as jnp

    from satmvs_tpu.infer.predict import streaming_red_forward

    _, variables, batch = _red_setup()
    fwd = partial(streaming_red_forward, variables, geo_model="rpc",
                  ndepths=(64, 32, 8), slab=8)
    imgs = jnp.asarray(batch["imgs"])
    dvals = jnp.asarray(batch["depth_values"])

    def step(c):
        out = fwd(imgs + c * 1e-12, batch["cams"], dvals)
        return out["stage3"]["depth"].ravel()[0]

    dt = _time_fn(step, iters=5)
    ratio = dt * 1e3 / full_forward_ms
    print(f"[bench] stream_slab8_384x768: {dt * 1e3:.1f} ms/image "
          f"({ratio:.2f}x full-volume)", file=sys.stderr)
    return {"stream_ms": round(dt * 1e3, 1),
            "stream_over_full_ratio": round(ratio, 3)}


def bench_coords_accuracy() -> dict:
    """Max device-vs-fp64-oracle pixel error of the sweep projection chain
    ON THIS HARDWARE — the on-chip twin of tests/test_geo.py's <0.01 px gate
    (which runs on CPU).  Guards against backend numerics regressions: jax's
    DEFAULT TPU matmul precision is one bf16 pass, which put ~0.4%·extent
    errors into the coords until the geometry matmuls were pinned to
    precision=HIGHEST (NOTES round-5 — the whole scene-scale accuracy
    degradation).  Reported per round in the extras payload."""
    import jax.numpy as jnp

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.geo import rpc as rpclib
    from satmvs_tpu.ops import warp as warplib
    from satmvs_tpu.ops.coarse_coords import rpc_sweep_coords_coarse

    rpcs = np.stack(
        synthetic.make_rpc_triplet(PATCH_W, PATCH_H, seed=0)
    )[[2, 0, 1]]
    cams = warplib.build_stage_cams(rpcs, ref_index=0, num_stage=3)[0]
    h_min, h_max = rpclib.height_range(rpcs[0])
    depths = jnp.linspace(h_min, h_max, 4, dtype=jnp.float32)

    # fp64 host oracle on a subsampled grid (every 8th px at 1/4 scale)
    step = 8
    ys, xs = np.mgrid[0:FEAT_H:step, 0:FEAT_W:step].astype(np.float64)
    errs = {}
    for name, fn in (("exact", warplib.rpc_sweep_coords),
                     ("coarse", rpc_sweep_coords_coarse)):
        xd, yd = fn(cams, 0, depths, FEAT_H, FEAT_W)
        xd = np.asarray(xd)[:, ::step, ::step]
        yd = np.asarray(yd)[:, ::step, ::step]
        worst = 0.0
        for di, dv in enumerate(np.asarray(depths, np.float64)):
            # stage-1 cams are at 1/4 scale: their RPCs are the scaled ones
            # inside the bundle, so project with the fp64 originals scaled
            ref4 = rpclib.scale_rpc(rpcs[0], 0.25)
            src4 = rpclib.scale_rpc(rpcs[1], 0.25)
            lat, lon = rpclib.photo_to_obj(
                ref4, xs.ravel() * 1.0, ys.ravel() * 1.0,
                np.full(xs.size, dv))
            sx, sy = rpclib.obj_to_photo(src4, lat, lon, np.full(xs.size, dv))
            e = np.hypot(xd[di].ravel() - sx, yd[di].ravel() - sy)
            worst = max(worst, float(e.max()))
        errs[f"coords_px_err_{name}"] = round(worst, 6)
    print(f"[bench] device-vs-fp64 coords px err: {errs}", file=sys.stderr)
    return errs


def main() -> None:
    views_per_s = bench_plane_sweep()
    # every secondary bench lands in the parsed payload (extras) so rounds
    # can be diffed mechanically; none may sink the primary metric
    extras: dict = {}
    for fn, args in (
        (bench_coords_accuracy, None),
        (bench_model_forward, None),
        (bench_train_step, None),
        (bench_cross_models, None),
        (bench_stream_ratio, "red_forward_ms"),
    ):
        try:
            a = () if args is None else (extras[args],)
            extras.update(fn(*a))
        except Exception as e:
            print(f"[bench] {fn.__name__} failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "plane_sweep_views_per_s",
                "value": round(views_per_s, 2),
                "unit": "views/s/chip (stage-1 384x768 patch, D=64)",
                "vs_baseline": round(views_per_s / BASELINE_PROXY_VIEWS_PER_S, 2),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
