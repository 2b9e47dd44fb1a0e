#!/usr/bin/env python
"""Multi-device scaling-efficiency harness (BASELINE target: ≥85% at 2 hosts).

Runs the SAME sharded training step over growing mesh sizes and reports
per-device throughput + scaling efficiency.  On real multi-chip hardware the
mesh spans chips/hosts (run under `jax.distributed`); without it, pass
--virtual N to simulate N CPU devices (validates the SPMD program and the
harness itself — virtual-device timings are NOT performance numbers).

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA/Mosaic compile cache: without it EVERY process pays the full
# jit compile (~3 min at production tile shapes — measured; NOTES round-4)
from satmvs_tpu import cache as _cache

_cache.enable()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=0,
                   help="simulate N CPU devices (0 = use real devices)")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ndepths", default="16,8,8")
    p.add_argument("--model", default="casmvs")
    p.add_argument("--iters", type=int, default=4)
    a = p.parse_args()

    if a.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={a.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np
    import optax

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.dist import make_mesh, replicate, shard_batch
    from satmvs_tpu.models import cascade_loss
    from satmvs_tpu.train import Config
    from satmvs_tpu.train.loop import create_model_and_state, numeric_batch

    n_dev = len(jax.devices())
    mesh_sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    cfg = Config(model=a.model, geo_model="rpc",
                 ndepths=tuple(int(x) for x in a.ndepths.split(",")))

    base_throughput = None
    for nd_mesh in mesh_sizes:
        batch = numeric_batch(
            synthetic.make_batch(batch_size=nd_mesh, width=a.size, height=a.size)
        )
        model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=10)
        mesh = make_mesh(data=nd_mesh, spatial=1)

        def train_step(state, batch):
            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["imgs"], batch["cams"], batch["depth_values"],
                    train=True, mutable=["batch_stats"],
                )
                total, _ = cascade_loss(out, batch["depth_stages"], batch["mask_stages"])
                return total, updates

            (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            upd, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, upd)
            return state.replace(params=params, batch_stats=updates["batch_stats"],
                                 opt_state=opt_state, step=state.step + 1), loss

        with jax.set_mesh(mesh):
            sstate = replicate(state, mesh)
            sbatch = shard_batch(batch, mesh)
            step = jax.jit(train_step)
            sstate, loss = step(sstate, sbatch)  # compile + warm
            jax.block_until_ready(sstate.params)
            t0 = time.perf_counter()
            for _ in range(a.iters):
                sstate, loss = step(sstate, sbatch)
            jax.block_until_ready(sstate.params)
            dt = (time.perf_counter() - t0) / a.iters

        images_per_s = nd_mesh / dt
        per_dev = images_per_s / nd_mesh
        if base_throughput is None:
            base_throughput = per_dev
        eff = per_dev / base_throughput
        print(json.dumps({
            "mesh_devices": nd_mesh,
            "step_ms": round(dt * 1e3, 1),
            "images_per_s": round(images_per_s, 2),
            "scaling_efficiency": round(eff, 3),
            "virtual": bool(a.virtual),
        }))


if __name__ == "__main__":
    main()
