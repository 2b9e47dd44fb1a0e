#!/usr/bin/env python
"""Controlled train/predict radiometric-normalization experiment (VERDICT r4
#2 second half): does SCENE-consistent normalization at BOTH train and
predict time remove the tile seams that per-tile normalization causes?

Protocol (all synthetic, geometry identical across arms):
  * render N big scenes (default 512x512) + one held-out eval scene;
  * carve each into random 160x160 training tiles (crop_rpc-shifted cams);
  * arm "tile":  every training tile is center_image'd individually —
    matching predict_scene --norm tile (the reference's per-block behavior);
  * arm "scene": every training tile is normalized with its scene's
    per-view whole-image stats — matching predict_scene --norm scene;
  * train both checkpoints with the canonical train step (same seeds,
    epochs, tiles), save under <workdir>/ckpt_{arm};
  * predict the held-out scene with the MATCHING --norm via the in-process
    predict_scene API and report seam ratio + MAE for all four
    (train-norm x predict-norm) combinations — the off-diagonal cells
    separate "train/predict consistency" from "which norm is better".

Writes one JSON line per cell: {train_norm, predict_norm, seam_ratio,
mae_m, lt2.5m_pct}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])

from satmvs_tpu import cache as _cache

_cache.enable()

import numpy as np


def make_tile_batches(scenes, tile, batch_size, rng, norm, num_stage=3):
    """Yield training batches of random tile crops from the big scenes.

    Each element: crop all 3 views at the same scene window (the synthetic
    views share a pixel grid), shift RPCs with crop_rpc, normalize per
    `norm`, build stage cams + GT pyramids exactly like data/dataset.py.
    """
    from satmvs_tpu.data import preprocess
    from satmvs_tpu.geo import rpc as rpclib
    from satmvs_tpu.ops import warp as warplib

    order = [2, 0, 1]  # nadir reference first (data/synthetic.py convention)
    elems = []
    for scene in scenes:
        imgs = scene["images"]  # (3, H, W)
        size = imgs.shape[1]
        if norm == "scene":
            mean = imgs.mean(axis=(1, 2), dtype=np.float64, keepdims=True)
            std = np.sqrt(imgs.var(axis=(1, 2), dtype=np.float64,
                                   keepdims=True)) + 1e-8
        r0 = rng.integers(0, size - tile + 1)
        c0 = rng.integers(0, size - tile + 1)
        crops, rpcs_t = [], []
        for v in range(3):
            crop = imgs[v][r0:r0 + tile, c0:c0 + tile].astype(np.float32)
            crop3 = np.repeat(crop[..., None], 3, -1)
            if norm == "scene":
                crop3 = ((crop3 - mean[v]) / std[v]).astype(np.float32)
            else:
                crop3 = preprocess.center_image(crop3)
            crops.append(crop3)
            rpcs_t.append(rpclib.crop_rpc(scene["rpcs"][v], c0, r0))
        crops = np.stack(crops)[order]
        rpcs_t = np.stack(rpcs_t)[order]
        gt = scene["gt_heights"][2][r0:r0 + tile, c0:c0 + tile]
        pyr = preprocess.build_pyramid(gt, num_stage)
        elems.append({
            "imgs": crops,
            "cams": warplib.build_stage_cams(rpcs_t, 0, num_stage),
            "depth_values": np.asarray(scene["h_range"], np.float32),
            "gt_pyr": pyr,
        })

    rng.shuffle(elems)
    from satmvs_tpu.ops.warp import stack_cams

    for i0 in range(0, len(elems) - batch_size + 1, batch_size):
        grp = elems[i0:i0 + batch_size]
        yield {
            "imgs": np.stack([e["imgs"] for e in grp]),
            "cams": tuple(stack_cams([e["cams"][s] for e in grp])
                          for s in range(num_stage)),
            "depth_values": np.stack([e["depth_values"] for e in grp]),
            "depth_stages": [np.stack([e["gt_pyr"][s] for e in grp])
                             for s in range(num_stage)],
            "mask_stages": [np.ones_like(np.stack([e["gt_pyr"][s] for e in grp]))
                            for s in range(num_stage)],
        }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scene_size", type=int, default=512)
    p.add_argument("--tile", type=int, default=160)
    p.add_argument("--halo", type=int, default=32)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--ndepths", default="16,8,4")
    p.add_argument("--workdir", default="/tmp/scene_norm_exp")
    p.add_argument("--arms", default="tile,scene")
    p.add_argument("--gradient", action="store_true",
                   help="add a strong radiometric gradient to every scene "
                        "(train AND eval) — without it the synthetic texture "
                        "is stationary and the two norms coincide (measured: "
                        "identical scene records, NOTES round-5)")
    p.add_argument("--json_out", default="")
    a = p.parse_args()
    os.makedirs(a.workdir, exist_ok=True)

    import jax

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.infer.scene import predict_scene
    from satmvs_tpu.train.checkpoints import restore_checkpoint, save_checkpoint
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import (
        create_model_and_state, make_train_step, numeric_batch,
    )

    nd = tuple(int(x) for x in a.ndepths.split(","))

    # ---- scenes (cached across runs of one workdir)
    cache_npz = os.path.join(
        a.workdir, f"scenes_{a.scene_size}_{a.scenes}.npz"
    )
    t0 = time.time()
    if os.path.exists(cache_npz):
        z = np.load(cache_npz, allow_pickle=True)
        scenes = list(z["scenes"])
        print(f"[exp] reusing {len(scenes)} cached scenes")
    else:
        scenes = [
            synthetic.make_scene(a.scene_size, a.scene_size, seed=100 + i,
                                 h_amp=100.0)
            for i in range(a.scenes + 1)
        ]
        np.savez_compressed(cache_npz, scenes=np.array(scenes, dtype=object))
        print(f"[exp] rendered {len(scenes)} scenes in {time.time()-t0:.0f}s")
    if a.gradient:
        sz = a.scene_size
        gx = np.linspace(0.0, 90.0, sz, dtype=np.float32)[None, :]
        gy = np.linspace(0.0, 30.0, sz, dtype=np.float32)[:, None]
        for sc in scenes:
            sc["images"] = sc["images"] * 0.6 + gx + gy
    train_scenes, eval_scene = scenes[:-1], scenes[-1]

    # ---- train both arms with the canonical step
    cfg = Config(model="red", geo_model="rpc", ndepths=nd, epochs=a.epochs)
    rng0 = np.random.default_rng(7)
    probe = next(make_tile_batches(train_scenes, a.tile, 1, rng0, "tile"))
    ckpts = {}
    for arm in a.arms.split(","):
        ck = os.path.join(a.workdir, f"ckpt_{arm}")
        ckpts[arm] = ck
        if os.path.isdir(ck):
            tpl = create_model_and_state(cfg, probe, 1, abstract_init=True)[1]
            if restore_checkpoint(ck, tpl)[0] is not None:
                print(f"[exp] arm {arm}: reusing checkpoint {ck}")
                continue
        model, state, tx = create_model_and_state(cfg, probe,
                                                  steps_per_epoch=len(train_scenes))
        step = jax.jit(make_train_step(model, tx, tuple(cfg.dlossw)))
        t1 = time.time()
        rng = np.random.default_rng(7)
        for ep in range(a.epochs):
            losses = []
            for batch in make_tile_batches(train_scenes, a.tile, 1, rng, arm):
                state, scalars = step(state, numeric_batch(batch))
                losses.append(float(scalars["loss"]))
            if ep % 10 == 0 or ep == a.epochs - 1:
                print(f"[exp] arm {arm} epoch {ep}: loss {np.mean(losses):.4f}")
        save_checkpoint(ck, a.epochs - 1, state)
        print(f"[exp] arm {arm} trained in {time.time()-t1:.0f}s → {ck}")

    # ---- evaluate: 2x2 (train_norm x predict_norm) on the held-out scene
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scene_bench import seam_metric

    order = [2, 0, 1]
    images = eval_scene["images"][order]
    rpcs = eval_scene["rpcs"][order]
    gt = eval_scene["gt_heights"][2]

    model, state_tpl, _ = create_model_and_state(cfg, probe, 1,
                                                 abstract_init=True)
    rows = []
    for arm, ck in ckpts.items():
        restored, _ = restore_checkpoint(ck, state_tpl)
        assert restored is not None, ck
        variables = {"params": restored.params,
                     "batch_stats": restored.batch_stats}

        @jax.jit
        def forward(imgs, cams, dv, variables=variables):
            return model.apply(variables, imgs, cams, dv, train=False)

        for pnorm in ("tile", "scene"):
            depth, _ = predict_scene(
                forward, images, rpcs, tile=a.tile, halo=a.halo,
                num_stage=len(nd), ref_index=0, norm=pnorm,
            )
            err = np.abs(depth - gt)
            s, i, ratio = seam_metric(depth, a.tile, a.halo)
            row = {
                "train_norm": arm, "predict_norm": pnorm,
                "seam_jump_m": round(s, 4), "interior_jump_m": round(i, 4),
                "seam_ratio": round(ratio, 3),
                "mae_m": round(float(err.mean()), 3),
                "lt2.5m_pct": round(float((err < 2.5).mean()) * 100, 2),
            }
            rows.append(row)
            print(json.dumps(row))

    if a.json_out:
        with open(a.json_out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
