#!/usr/bin/env python
"""Cross-model throughput table on TPU: forward (and optionally train-step)
images/s for CascadeRED / CascadeMVS / UCS at the production patch geometry.

The main bench.py tracks the flagship (RED); this records the other two
model families' numbers for BASELINE.md.

Usage: python scripts/model_bench.py [--models red,casmvs,ucs] [--train]
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
    p.add_argument("--models", default="red,casmvs,ucs")
    p.add_argument("--size", default="384x768")
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--train", action="store_true")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.models import build_model
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    h, w = (int(x) for x in a.size.split("x"))
    nd = tuple(int(x) for x in a.ndepths.split(","))
    batch = numeric_batch(synthetic.make_batch(1, w, h, seed=0))
    imgs = jnp.asarray(batch["imgs"])
    dvals = jnp.asarray(batch["depth_values"])

    for name in a.models.split(","):
        model = build_model(name, "rpc", ndepths=nd)
        variables = model.init(jax.random.PRNGKey(0), imgs, batch["cams"],
                               dvals, train=False)

        def fwd(c):
            out = model.apply(variables, imgs + c * 1e-12, batch["cams"],
                              dvals, train=False)
            return out["depth"].ravel()[0]

        dt = bench._time_fn(fwd, iters=5)
        print(f"{name:7s} forward {a.size}: {dt * 1e3:7.1f} ms/image "
              f"({1 / dt:5.2f} img/s)")

        if a.train:
            cfg = Config(model=name, geo_model="rpc", ndepths=nd)
            model_t, state, tx = create_model_and_state(cfg, batch,
                                                        steps_per_epoch=100)
            step_fn = make_train_step(model_t, tx, tuple(cfg.dlossw))

            def tstep(c):
                b = dict(batch, imgs=imgs + c * 1e-12)
                new_state, scalars = step_fn(state, b)
                leaf = jax.tree.leaves(new_state.params)[0]
                return scalars["loss"] + leaf.ravel()[0] * 1e-20

            dt = bench._time_fn(tstep, iters=3)
            print(f"{name:7s} train   {a.size}: {dt * 1e3:7.1f} ms/step "
                  f"({1 / dt:5.2f} img/s)")


if __name__ == "__main__":
    from satmvs_tpu import cache as _cache

    _cache.enable()
    main()
