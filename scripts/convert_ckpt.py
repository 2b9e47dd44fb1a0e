#!/usr/bin/env python
"""Convert a reference (PyTorch) SatMVS checkpoint into an orbax checkpoint.

Usage:
  python scripts/convert_ckpt.py --src model_000015.ckpt --model red \
      --out checkpoints/red/rpc [--ndepths 64,32,8]

The result restores via train/checkpoints.py (scripts/train.py --mode=test,
scripts/predict.py --loadckpt ...).  Layer-level numerical parity of the
conversion is covered by tests/test_convert.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])

# persistent XLA/Mosaic compile cache: without it EVERY process pays the full
# jit compile (~3 min at production tile shapes — measured; NOTES round-4)
from satmvs_tpu import cache as _cache

_cache.enable()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="reference .ckpt (torch.save)")
    p.add_argument("--out", required=True, help="orbax checkpoint directory")
    p.add_argument("--model", default="red", choices=["red", "casmvs", "ucs"])
    p.add_argument("--geo_model", default="rpc", choices=["rpc", "pinhole"])
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--epoch", type=int, default=0, help="epoch label for the save")
    a = p.parse_args()

    import jax.numpy as jnp

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.train import Config
    from satmvs_tpu.train.checkpoints import save_checkpoint
    from satmvs_tpu.train.convert import load_reference_checkpoint
    from satmvs_tpu.train.loop import TrainState, create_model_and_state, numeric_batch

    cfg = Config(model=a.model, geo_model=a.geo_model,
                 ndepths=tuple(int(x) for x in a.ndepths.split(",")))
    params, batch_stats = load_reference_checkpoint(
        a.src, model=a.model, num_stage=cfg.num_stage
    )

    # build an optimizer-state template so the checkpoint restores into the
    # standard TrainState (fresh optimizer — the reference's RMSprop moments
    # are architecture-layout-specific and not carried over)
    batch = numeric_batch(synthetic.make_batch(1, 32, 32, seed=0))
    model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=1, abstract_init=True)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    save_checkpoint(a.out, a.epoch, state)
    print(f"converted {a.src} → {a.out}/{a.epoch}")


if __name__ == "__main__":
    import jax  # noqa: F401

    main()
