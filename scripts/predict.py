#!/usr/bin/env python
"""Whole-scene prediction CLI: streaming inference → per-view height/prob
PFMs (+ optional fusion to a DSM raster).

Counterpart of /root/reference/predict.py (writes the same
mvs_results/{view}/{init,prob}/{name}.pfm layout, predict.py:117-135) with a
fusion stage the reference left to an external pipeline:
  --fuse     run geometric-consistency fusion over each scene's views and
             write a UTM DSM raster (tools/rpc_filter.py + data_io.py:289-325
             equivalents, on device).
"""

from __future__ import annotations

import os
import sys
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
    import argparse

    import jax
    import numpy as np

    from satmvs_tpu.data import formats
    from satmvs_tpu.data.dataset import find_dataset
    from satmvs_tpu.data.loader import Loader
    from satmvs_tpu.train.checkpoints import restore_checkpoint
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import create_model_and_state, numeric_batch

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="red", choices=["red", "casmvs", "ucs"])
    p.add_argument("--geo_model", default="rpc", choices=["rpc", "pinhole"])
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--view_num", type=int, default=3)
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--min_interval", type=float, default=2.5)
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--lamb", type=float, default=1.5)
    p.add_argument("--use_qc", action="store_true",
                   help="QC-form RPC warp (ref predict.py:26)")
    p.add_argument("--max_h", type=int, default=0)
    p.add_argument("--max_w", type=int, default=0)
    p.add_argument("--streaming", action="store_true",
                   help="plane-streaming scan (red model only): O(H*W) memory in D")
    p.add_argument("--slab", type=int, default=0,
                   help="streaming slab size (planes per scan step; 0 = one "
                        "plane at a time). TPU: fused sweep + state-seeded "
                        "fused recurrence per slab")
    p.add_argument("--torch_compat", action="store_true",
                   help="reference-checkpoint parity mode: reproduce the "
                        "reference's grid_sample convention + hypothesis "
                        "chain so converted checkpoints predict its answers")
    p.add_argument("--fuse", action="store_true", help="fuse views into a DSM")
    p.add_argument("--color", action="store_true",
                   help="also write colorized PNGs (init/color, prob/color — "
                        "the reference's sketched visualization surface)")
    # fusion operating point: the measured valid%-vs-MAE knee (BASELINE.md
    # fusion curve — 82% valid at MAE 2.69 m on the 2560^2 record; the
    # reference's own defaults p=1.0/d=2.5 sit far down the curve at 48%)
    p.add_argument("--p_ratio", type=float, default=2.0)
    p.add_argument("--d_ratio", type=float, default=7.5)
    p.add_argument("--geo_consist_num", type=int, default=1)
    p.add_argument("--confidence_ratio", type=float, default=0.1)
    p.add_argument("--grid_res", type=float, default=5.0)
    p.add_argument("--fused_sweep", default="auto", choices=["auto", "on", "off"],
                   help="fused sweep+variance kernel (auto = TPU backend)")
    a = p.parse_args()

    cfg = Config(
        model=a.model, geo_model=a.geo_model,
        ndepths=tuple(int(x) for x in a.ndepths.split(",") if x),
        depth_inter_r=tuple(float(x) for x in a.depth_inter_r.split(",") if x),
        cr_base_chs=tuple(int(x) for x in a.cr_base_chs.split(",") if x),
        min_interval=a.min_interval, lamb=a.lamb, view_num=a.view_num,
        torch_compat=a.torch_compat,
        fused_sweep={"auto": None, "on": True, "off": False}[a.fused_sweep],
    )

    ds = find_dataset(a.geo_model)(
        a.dataset_root, "pred", a.view_num, geo_model=a.geo_model,
        num_stage=cfg.num_stage, use_qc=a.use_qc, max_h=a.max_h, max_w=a.max_w,
    )
    ld = Loader(ds, batch_size=1)
    first = next(iter(ld))

    if a.geo_model == "rpc":
        # fused-sweep coverage contract: validate once on the first sample
        import jax as _jax

        from satmvs_tpu.ops.warp import sweep_coverage_misses_from_cams

        cams0 = _jax.tree.map(lambda x: x[0], first["cams"])
        h0, w0 = first["imgs"].shape[2:4]
        misses = sweep_coverage_misses_from_cams(
            cams0, h0, w0, first["depth_values"][0]
        )
        if any(misses.values()):
            print(f"WARNING: fused-sweep stencil drops samples {misses}; "
                  "pass --fused_sweep off or raise sweep_stencil",
                  file=sys.stderr)

    model, state, _ = create_model_and_state(cfg, first, steps_per_epoch=1, abstract_init=True)
    restored, ep = restore_checkpoint(a.loadckpt, state)
    if restored is None:
        raise SystemExit(f"no checkpoint at {a.loadckpt}")
    print(f"loaded checkpoint epoch {ep}")
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}

    if a.streaming and a.model == "red":
        from functools import partial

        from satmvs_tpu.infer.predict import streaming_red_forward

        forward = jax.jit(
            partial(
                streaming_red_forward,
                geo_model=a.geo_model, ndepths=cfg.ndepths,
                depth_intervals_ratio=cfg.depth_inter_r,
                min_interval=cfg.min_interval, cr_base_chs=cfg.cr_base_chs,
                slab=a.slab, torch_compat=a.torch_compat,
            )
        )
        run = lambda nb: forward(variables, nb["imgs"], nb["cams"], nb["depth_values"])
    else:
        @jax.jit
        def run_jit(variables, imgs, cams, dvals):
            return model.apply(variables, imgs, cams, dvals, train=False)

        run = lambda nb: run_jit(variables, nb["imgs"], nb["cams"], nb["depth_values"])

    out_root = os.path.join(a.dataset_root, "mvs_results")
    per_scene: dict[str, dict] = {}
    t0 = time.time()
    for i, batch in enumerate(ld):
        t1 = time.time()
        out = run(numeric_batch(batch))
        depth = np.asarray(out["depth"][0], np.float32)
        prob = np.asarray(out["photometric_confidence"][0], np.float32)
        view, name = batch["out_view"][0], batch["out_name"][0]
        for sub, arr in (("init", depth), ("prob", prob)):
            d = os.path.join(out_root, view, sub)
            os.makedirs(d, exist_ok=True)
            formats.save_pfm(os.path.join(d, f"{name}.pfm"), arr)
        if a.color:
            # colorized PNGs next to the PFMs — the visualization surface the
            # reference predict.py sketches at init/color, prob/color
            # (ref predict.py:126-128,143-144: plt.imsave left commented out)
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            cd = os.path.join(out_root, view, "init", "color")
            pd = os.path.join(out_root, view, "prob", "color")
            os.makedirs(cd, exist_ok=True)
            os.makedirs(pd, exist_ok=True)
            plt.imsave(os.path.join(cd, f"{name}.png"), depth)
            plt.imsave(os.path.join(pd, f"{name}_prob.png"), prob)
        print(f"iter {i}/{len(ld)} view={view} {name} time={time.time() - t1:.3f}s")
        per_scene.setdefault(name, {})[view] = (depth, prob, i)

    print(f"prediction done in {time.time() - t0:.1f}s")

    if a.fuse and a.geo_model == "rpc":
        from satmvs_tpu.infer.fuse import fuse_scene_to_dsm

        for name, views in per_scene.items():
            order = sorted(views.keys())
            depths = np.stack([views[v][0] for v in order])
            prob = views[order[0]][1]
            rpcs = np.stack(
                [formats.load_rpc(os.path.join(
                    a.dataset_root, "rpc", v, f"{name}.rpc"))[0] for v in order]
            )
            out_path = os.path.join(out_root, f"{name}_dsm.tif")
            path, mask, _ = fuse_scene_to_dsm(
                depths, rpcs, out_path, grid_res=a.grid_res, prob=prob,
                p_ratio=a.p_ratio, d_ratio=a.d_ratio,
                geo_consist_num=a.geo_consist_num,
                confidence_ratio=a.confidence_ratio,
            )
            print(f"fused {name}: {path} (valid {mask.mean():.1%})")


if __name__ == "__main__":
    main()
