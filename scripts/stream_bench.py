#!/usr/bin/env python
"""Streaming-inference benchmark: slab-streamed predictor vs full-volume
forward on TPU (VERDICT item: prove the O(slab)-memory path is fast).

Measures, at one or more tile geometries:
  * full-volume CascadeRED forward (models.CascadeREDNet, fused kernels)
  * streaming_red_forward with --slab k (fused sweep + state-seeded fused
    recurrence per depth slab; ref plane-streaming at casred.py:161-238)
  * device memory of each — from XLA's per-executable memory_analysis
    (argument + temp + output bytes of the compiled program), NOT the
    process-cumulative peak_bytes_in_use, which whichever run goes second
    would inherit; live peak is also printed for the first-run config.

Usage: python scripts/stream_bench.py [--sizes 384x768,1024x2048] [--slab 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])


def _mem_analysis_mb(fn, *args):
    """Compiled-program device memory (MB): args + temps + output."""
    import jax

    try:
        ma = jax.jit(fn).lower(*args).compile().memory_analysis()
        tot = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
               + ma.output_size_in_bytes)
        return tot / 1e6, ma.temp_size_in_bytes / 1e6
    except Exception as e:  # noqa: BLE001 — backend may not support it
        print(f"  (memory_analysis unavailable: {e})", file=sys.stderr)
        return float("nan"), float("nan")


def _live_peak_mb():
    """Process-cumulative device peak (MB) — meaningful for the FIRST
    measurement of a process only (it never resets), hence the streaming
    path runs before the full-volume one below."""
    import jax

    try:
        st = jax.local_devices()[0].memory_stats()
        return st.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        return float("nan")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="384x768,1024x2048")
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--slab", type=int, default=8)
    p.add_argument("--batch", type=int, default=1,
                   help="tile batch B (predict_scene batch_tiles stand-in): "
                        "the streaming path runs the batched grid=(B, D) "
                        "pipeline; ms/image is per image")
    p.add_argument("--skip_full", action="store_true",
                   help="measure only the streaming path (e.g. when the "
                        "full volume OOMs)")
    p.add_argument("--only", default="both", choices=["both", "stream", "full"],
                   help="measure one path only — run each in its own process "
                        "so the process-cumulative live device peak is an "
                        "honest per-path number")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.infer.predict import streaming_red_forward
    from satmvs_tpu.models import CascadeREDNet
    from satmvs_tpu.train.loop import numeric_batch

    nd = tuple(int(x) for x in a.ndepths.split(","))

    for size in a.sizes.split(","):
        h, w = (int(x) for x in size.split("x"))
        batch = numeric_batch(synthetic.make_batch(a.batch, w, h, seed=0))
        imgs = jnp.asarray(batch["imgs"])
        dvals = jnp.asarray(batch["depth_values"])
        # honor the SATMVS_FUSED_RED A/B probe for direct construction (the
        # env override lives in build_model; constructors must opt in)
        fused = (None if "SATMVS_FUSED_RED" not in os.environ
                 else os.environ["SATMVS_FUSED_RED"] != "0")
        model = CascadeREDNet(geo_model="rpc", ndepths=nd, fused_red=fused)
        # init with a tiny-D clone: the param tree is D-independent and a
        # full-volume init at e.g. D=256 would do the giant forward just to
        # build parameters
        variables = model.clone(ndepths=(8,) * len(nd)).init(
            jax.random.PRNGKey(0), imgs, batch["cams"], dvals, train=False)

        stream = functools.partial(
            streaming_red_forward, variables, geo_model="rpc", ndepths=nd,
            slab=a.slab,
        )

        def strm(c):
            out = stream(imgs=imgs + c * 1e-12, cams=batch["cams"],
                         depth_values=dvals)
            return out["depth"].ravel()[0]

        def full(c):
            out = model.apply(variables, imgs + c * 1e-12, batch["cams"],
                              dvals, train=False)
            return out["depth"].ravel()[0]

        dt_s = None
        if a.only in ("both", "stream"):
            mb_s, tmp_s = _mem_analysis_mb(strm, jnp.float32(0))
            dt_s = bench._time_fn(strm, iters=5) / a.batch
            pk_s = _live_peak_mb()
            print(f"{size}: slab={a.slab:2d} B={a.batch} {dt_s * 1e3:8.1f} ms/image "
                  f"({1 / dt_s:5.2f} img/s)  mem {mb_s:7.0f} MB "
                  f"(temps {tmp_s:.0f}; live peak {pk_s:.0f})", flush=True)

        if a.skip_full or a.only == "stream":
            continue
        mb_f, tmp_f = _mem_analysis_mb(full, jnp.float32(0))
        dt_full = bench._time_fn(full, iters=5) / a.batch
        pk_f = _live_peak_mb()
        rel = (f"  [slab = {dt_s / dt_full:.2f}x time]"
               if dt_s is not None else "")
        print(f"{size}: full-volume  {dt_full * 1e3:8.1f} ms/image "
              f"({1 / dt_full:5.2f} img/s)  mem {mb_f:7.0f} MB "
              f"(temps {tmp_f:.0f}; live peak {pk_f:.0f}){rel}",
              flush=True)


if __name__ == "__main__":
    from satmvs_tpu import cache as _cache

    _cache.enable()
    main()
