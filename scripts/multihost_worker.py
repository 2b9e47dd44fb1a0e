#!/usr/bin/env python
"""One process of a multi-host (multi-process) training smoke run.

Exercises the DCN path the reference never had (SURVEY.md §2.2: multi-host
via jax.distributed.initialize): N processes × L local devices form one
global mesh; the batch is data-sharded across *processes*, gradients
all-reduce over the cross-process collective backend, and every process must
end with identical replicated state.

On real TPU pods each process is one host of the slice and the same code
path applies (ICI within a host's chips, DCN across hosts); here the
cluster is simulated with CPU processes (Gloo collectives), which is the
test harness SURVEY §4 prescribes.  tests/test_multihost.py spawns two of
these and checks the losses against a single-process run.

Usage:
  python scripts/multihost_worker.py --process-id 0 --num-processes 2 \
      --coordinator 127.0.0.1:9876 --local-devices 4 --steps 2 --out r0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", default="127.0.0.1:9876")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # virtual local devices must be configured before jax initializes
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from satmvs_tpu.dist import init_multihost, make_mesh, replicate, shard_batch

    n_global = init_multihost(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert n_global == args.num_processes * args.local_devices, n_global
    assert jax.process_count() == args.num_processes

    import numpy as np

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    # identical global batch + init in every process (same seeds)
    cfg = Config(model="casmvs", geo_model="rpc", ndepths=(8, 8, 8))
    batch = numeric_batch(
        synthetic.make_batch(batch_size=args.batch, width=32, height=32, seed=0)
    )
    model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=10)
    train_step = make_train_step(model, tx, tuple(cfg.dlossw))

    mesh = make_mesh(data=n_global)
    state = replicate(state, mesh)
    gbatch = shard_batch(batch, mesh)

    scalars = {}
    for _ in range(args.steps):
        state, scalars = train_step(state, gbatch)

    # replicated outputs are process-local readable
    leaf = jax.tree.leaves(state.params)[0]
    result = {
        "process_id": args.process_id,
        "global_devices": n_global,
        "loss": float(scalars["loss"]),
        "abs_depth_error": float(scalars["abs_depth_error"]),
        "param_leaf_sum": float(jax.numpy.sum(leaf)),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"[multihost_worker {args.process_id}] {result}", flush=True)


if __name__ == "__main__":
    main()
