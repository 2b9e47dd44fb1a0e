#!/usr/bin/env python
"""One-off train-step A/B harness: time the full jitted train step under a
named configuration (fused sweep on/off, batch size, compute dtype).

Usage: python scripts/_train_ab.py [--batch 1] [--fused_sweep] [--dtype fp32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", default="384x768")
    p.add_argument("--fused_sweep", action="store_true")
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bfloat16"])
    p.add_argument("--volume_dtype", default="fp32",
                   choices=["fp32", "bfloat16"],
                   help="warped-volume HBM transport dtype A/B")
    p.add_argument("--use_qc", action="store_true",
                   help="QC-form RPC warp cams (ref --use_qc) A/B")
    p.add_argument("--forward", action="store_true",
                   help="time the inference forward instead of the train step")
    p.add_argument("--iters", type=int, default=3)
    a = p.parse_args()

    import jax

    import bench
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    h, w = (int(x) for x in a.size.split("x"))
    cfg = Config(model="red", geo_model="rpc", ndepths=(64, 32, 8),
                 use_qc=a.use_qc,
                 compute_dtype=("bfloat16" if a.dtype == "bfloat16"
                                else "float32"),
                 volume_dtype=("bfloat16" if a.volume_dtype == "bfloat16"
                               else "float32"))
    batch = numeric_batch(
        synthetic.make_batch(a.batch, w, h, seed=0, use_qc=a.use_qc))
    model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=100)
    if a.fused_sweep:
        model = model.clone(train_fused_sweep=True)

    tag = (f"b={a.batch} {a.size} fused_sweep={a.fused_sweep} "
           f"use_qc={a.use_qc} {a.dtype} vol={a.volume_dtype}")
    if a.forward:
        import jax.numpy as jnp

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        imgs = jnp.asarray(batch["imgs"])

        def fstep(c):
            out = model.apply(variables, imgs + c * 1e-12, batch["cams"],
                              jnp.asarray(batch["depth_values"]), train=False)
            return out["depth"].ravel()[0]

        dt = bench._time_fn(fstep, iters=5)
        print(f"forward {tag}: {dt * 1e3:.1f} ms/image, {a.batch / dt:.2f} img/s")
        return

    train_step = make_train_step(model, tx, tuple(cfg.dlossw))
    imgs = batch["imgs"]

    def step(c):
        b = dict(batch, imgs=imgs + c * 1e-12)
        new_state, scalars = train_step(state, b)
        leaf = jax.tree.leaves(new_state.params)[0]
        return scalars["loss"] + leaf.ravel()[0] * 1e-20

    dt = bench._time_fn(step, iters=a.iters)
    print(f"train {tag}: {dt * 1e3:.1f} ms/step, {a.batch / dt:.2f} img/s")


if __name__ == "__main__":
    from satmvs_tpu import cache as _cache

    _cache.enable()
    main()
