#!/usr/bin/env python
"""Streaming-inference benchmark: slab-streamed predictor vs full-volume
forward on TPU (VERDICT item: prove the O(slab)-memory path is fast).

Measures, at one or more tile geometries:
  * full-volume CascadeRED forward (models.CascadeREDNet, fused kernels)
  * streaming_red_forward with --slab k (fused sweep + state-seeded fused
    recurrence per depth slab; ref plane-streaming at casred.py:161-238)
  * peak device memory of each (jax memory_stats), to show the O(slab) win

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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="384x768,1024x2048")
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--slab", type=int, default=8)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.infer.predict import streaming_red_forward
    from satmvs_tpu.models import CascadeREDNet
    from satmvs_tpu.train.loop import numeric_batch

    nd = tuple(int(x) for x in a.ndepths.split(","))

    def peak_mb():
        try:
            st = jax.local_devices()[0].memory_stats()
            return st.get("peak_bytes_in_use", 0) / 1e6
        except Exception:
            return float("nan")

    for size in a.sizes.split(","):
        h, w = (int(x) for x in size.split("x"))
        batch = numeric_batch(synthetic.make_batch(1, w, h, seed=0))
        imgs = jnp.asarray(batch["imgs"])
        dvals = jnp.asarray(batch["depth_values"])
        model = CascadeREDNet(geo_model="rpc", ndepths=nd)
        variables = model.init(jax.random.PRNGKey(0), imgs, batch["cams"],
                               dvals, train=False)

        def full(c):
            out = model.apply(variables, imgs + c * 1e-12, batch["cams"],
                              dvals, train=False)
            return out["depth"].ravel()[0]

        dt_full = bench._time_fn(full, iters=5)
        mb_full = peak_mb()
        print(f"{size}: full-volume  {dt_full * 1e3:8.1f} ms/image "
              f"({1 / dt_full:5.2f} img/s)  peak {mb_full:.0f} MB")

        stream = functools.partial(
            streaming_red_forward, variables, geo_model="rpc", ndepths=nd,
            slab=a.slab,
        )

        def strm(c):
            out = stream(imgs=imgs + c * 1e-12, cams=batch["cams"],
                         depth_values=dvals)
            return out["depth"].ravel()[0]

        dt_s = bench._time_fn(strm, iters=5)
        mb_s = peak_mb()
        print(f"{size}: slab={a.slab:2d}     {dt_s * 1e3:8.1f} ms/image "
              f"({1 / dt_s:5.2f} img/s)  peak {mb_s:.0f} MB  "
              f"({dt_s / dt_full:.2f}x full-volume time)")


if __name__ == "__main__":
    from satmvs_tpu import cache as _cache

    _cache.enable()
    main()
