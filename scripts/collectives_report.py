#!/usr/bin/env python
"""Wire-level scaling evidence without multi-chip hardware (VERDICT r3 #7).

Compiles the PRODUCTION-geometry data-parallel train step (red, 384x768,
D=64/32/8, batch = mesh size) over an 8-virtual-device CPU mesh and prints
the compiled SPMD program's collective inventory — (op, count, bytes) per
step, straight from XLA — replacing the analytic "~2.5 MB grads" argument in
BASELINE.md's scaling section with the compiler's own numbers.

Usage: python scripts/collectives_report.py [--devices 8] [--size 384x768]
       [--model red] [--ndepths 64,32,8] [--mesh data|data_spatial|depth]

--mesh data_spatial / depth compile the SAME production geometry with the
cost volumes constrained over the spatial (H) / depth (D) mesh axes
(dist.mesh.stage_volume_specs guards), so the inventory shows GSPMD's conv
halo-exchange traffic on top of the gradient all-reduce (VERDICT r4 #6).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA/Mosaic compile cache: without it EVERY process pays the full
# jit compile (~3 min at production tile shapes — measured; NOTES round-4)
from satmvs_tpu import cache as _cache

_cache.enable()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--size", default="384x768")
    p.add_argument("--model", default="red")
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--mesh", default="data",
                   choices=["data", "data_spatial", "depth"],
                   help="data: pure data-parallel; data_spatial: devices/2 x "
                        "2-way H sharding of the cost volumes; depth: "
                        "devices/4 x 4-way D-slab sharding (extent-guarded)")
    a = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={a.devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from __graft_entry__ import _collective_inventory
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.dist import make_mesh, replicate, shard_batch
    from satmvs_tpu.models import cascade_loss
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    from satmvs_tpu.dist import stage_volume_specs

    h, w = (int(x) for x in a.size.split("x"))
    nd = tuple(int(x) for x in a.ndepths.split(","))
    if a.mesh == "data_spatial":
        spatial_ax, depth_ax = 2, 1
    elif a.mesh == "depth":
        spatial_ax, depth_ax = 1, 4
        if a.model == "red":
            # fit() refuses depth sharding for RED (on-chip scan by design);
            # report the conv-regularizer family instead
            print("[collectives_report] depth mesh: switching model to "
                  "casmvs (RED scans D on-chip; fit() refuses --mesh_depth)")
            a.model = "casmvs"
    else:
        spatial_ax = depth_ax = 1
    data_ax = a.devices // (spatial_ax * depth_ax)
    mesh = make_mesh(data=data_ax, spatial=spatial_ax, depth=depth_ax)
    batch = numeric_batch(
        synthetic.make_batch(batch_size=data_ax, width=w, height=h, seed=0)
    )
    cfg = Config(model=a.model, geo_model="rpc", ndepths=nd)
    # abstract_init: the step is only lowered/compiled, never executed —
    # parameter VALUES are irrelevant, so skip the real init forward
    model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=100,
                                              abstract_init=True)
    if spatial_ax > 1 or depth_ax > 1:
        specs = stage_volume_specs(
            nd, spatial=spatial_ax > 1, depth_shards=depth_ax,
            spatial_shards=spatial_ax, height=h,
        )
        model = model.clone(volume_partition=specs)
        print(f"[collectives_report] volume specs: {list(specs)}")
    step = make_train_step(model, tx, tuple(cfg.dlossw))

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print(f"[collectives_report] {a.model} {a.size} D={nd} "
          f"mesh data={data_ax} spatial={spatial_ax} depth={depth_ax}; "
          f"params {n_params} ({n_params * 4 / 1e6:.2f} MB fp32)")

    with jax.set_mesh(mesh):
        sharded_state = replicate(state, mesh)
        sharded_batch = shard_batch(batch, mesh)
        compiled = step.lower(sharded_state, sharded_batch).compile()
    inv = _collective_inventory(compiled)
    total = sum(b for _, _, b in inv)
    print(f"{'collective':20s} {'count':>6s} {'bytes/step':>12s}")
    for op, c, b in inv:
        print(f"{op:20s} {c:6d} {b:12d}")
    print(f"{'TOTAL':20s} {sum(c for _, c, _ in inv):6d} {total:12d}  "
          f"({total / 1e6:.2f} MB/step)")


if __name__ == "__main__":
    main()
