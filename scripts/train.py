#!/usr/bin/env python
"""Training / evaluation / profiling CLI.

Counterpart of /root/reference/train.py with the same flag surface
(--mode --model --geo_model --ndepths ... see satmvs_tpu/train/config.py).
Unlike the reference, --mode=profile is actually implemented: it traces a few
training steps with jax.profiler into <logdir>/profile.

Usage:
  python scripts/train.py --mode=train --model=red --geo_model=rpc \
      --dataset_root=/path/WHU_TLC --min_interval=5 --ndepths=64,32,8
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# optional backend override (the axon sitecustomize pins the TPU backend;
# SATMVS_PLATFORM=cpu runs the CLI on host, e.g. for smoke tests)
if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])

# persistent XLA/Mosaic compile cache: without it EVERY process pays the full
# jit compile (~3 min at production tile shapes — measured; NOTES round-4)
from satmvs_tpu import cache as _cache

_cache.enable()


def main() -> None:
    # NaN debugging (SURVEY §5 "race/NaN detection"): fail fast on any NaN
    # produced under jit when SATMVS_DEBUG_NANS=1
    if os.environ.get("SATMVS_DEBUG_NANS") == "1":
        import jax

        jax.config.update("jax_debug_nans", True)

    from satmvs_tpu.data.dataset import find_dataset
    from satmvs_tpu.data.loader import Loader
    from satmvs_tpu.train import Config, fit
    from satmvs_tpu.train.config import Config as Cfg

    cfg = Cfg.from_args()
    workdir = os.path.join(cfg.logdir, cfg.model, cfg.geo_model)
    os.makedirs(workdir, exist_ok=True)

    trainpath = os.path.join(cfg.dataset_root, f"open_dataset_{cfg.geo_model}", "train")
    testpath = os.path.join(cfg.dataset_root, f"open_dataset_{cfg.geo_model}", "test")
    if not os.path.isdir(trainpath):
        # allow pointing dataset_root directly at a split directory
        trainpath = testpath = cfg.dataset_root

    ds_cls = find_dataset(cfg.geo_model)
    make = lambda path, mode: ds_cls(
        path, mode, cfg.view_num, cfg.ref_view, cfg.geo_model, cfg.num_stage,
        cfg.seed, use_qc=cfg.use_qc, max_h=cfg.max_h, max_w=cfg.max_w,
    )

    if cfg.mode == "train":
        tl = Loader(make(trainpath, "train"), cfg.batch_size, shuffle=True, seed=cfg.seed)
        el = Loader(make(testpath, "test"), cfg.batch_size)
        fit(cfg, tl, el, workdir)
    elif cfg.mode == "test":
        from satmvs_tpu.train.checkpoints import restore_checkpoint
        from satmvs_tpu.train.loop import (
            create_model_and_state,
            make_eval_step,
            numeric_batch,
        )
        from satmvs_tpu.train.metrics import DictAverageMeter

        import numpy as np

        from satmvs_tpu.data import formats

        el = Loader(make(testpath, "test"), cfg.batch_size)
        first = next(iter(el))
        model, state, _ = create_model_and_state(cfg, first, steps_per_epoch=1, abstract_init=True)
        restored, ep = restore_checkpoint(workdir if cfg.loadckpt is None else cfg.loadckpt, state)
        if restored is None:
            raise SystemExit(f"no checkpoint found under {workdir}")
        print(f"loaded checkpoint epoch {ep}")
        eval_step = make_eval_step(model, tuple(cfg.dlossw), cfg.min_interval)
        meter = DictAverageMeter()
        # per-sample height maps next to the test split, matching the
        # reference test() output surface (ref train.py:225-264: a
        # height_result/ folder per split; its masked gt uses -999)
        out_dir = os.path.join(testpath, "height_result")
        os.makedirs(out_dir, exist_ok=True)
        for i, batch in enumerate(el):
            scalars, depth, conf = eval_step(restored, numeric_batch(batch))
            scal = {k: float(v) for k, v in scalars.items()}
            meter.update(scal)
            print(f"iter {i}/{len(el)} {batch['out_name'][0]} {scal}")
            depth = np.asarray(depth, np.float32)
            conf = np.asarray(conf, np.float32)
            gt = np.asarray(batch["depth_stages"][-1], np.float32)
            mask = np.asarray(batch["mask_stages"][-1], np.float32)
            for j in range(depth.shape[0]):
                stem = os.path.join(
                    out_dir, f"{batch['out_name'][j]}_{batch['out_view'][j]}"
                )
                formats.save_pfm(stem + ".pfm", depth[j])
                formats.save_pfm(stem + "_prob.pfm", conf[j])
                err = np.where(mask[j] > 0.5, depth[j] - gt[j],
                               np.float32(-999.0))
                formats.save_pfm(stem + "_err.pfm", err)
        print(f"height maps written to {out_dir}")
        print("final:", meter.mean())
    elif cfg.mode == "profile":
        import jax

        tl = Loader(make(trainpath, "train"), cfg.batch_size, shuffle=True, seed=cfg.seed)
        from satmvs_tpu.train.loop import create_model_and_state, make_train_step, numeric_batch

        first = next(iter(tl))
        model, state, tx = create_model_and_state(cfg, first, steps_per_epoch=max(len(tl), 1))
        step = make_train_step(model, tx, tuple(cfg.dlossw))
        nb = numeric_batch(first)
        state, _ = step(state, nb)  # compile outside the trace
        profile_dir = os.path.join(workdir, "profile")
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                state, scalars = step(state, nb)
            jax.block_until_ready(scalars)
        print(f"profile written to {profile_dir}")


if __name__ == "__main__":
    main()
