#!/usr/bin/env python
"""Production-scale whole-scene e2e benchmark (VERDICT r2 #7).

Generates a large synthetic 3-view scene (GT heights included), writes it to
disk (PNG + .rpc), runs `scripts/predict_scene.py` as a real subprocess (the
user-facing surface: windowed ingestion → tiled batched inference with
host/device overlap → stitched PFM), then scores:

  * wall-clock + host-prep share (parsed from the CLI's [scene] line —
    the <20% host-prep target),
  * accuracy vs the synthetic GT (sanity; needs --ckpt of a trained model),
  * a SEAM metric: mean |row-/col-difference| of the stitched depth across
    every tile boundary vs the same statistic 8 px inside the tiles —
    ratio ≈ 1 means the halo-interior stitching is seamless.

Usage: python scripts/scene_bench.py [--size 2560] [--tile 384] [--halo 32]
       [--ckpt checkpoints/red/rpc] [--ndepths 64,32,8]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA/Mosaic compile cache: without it EVERY process pays the full
# jit compile (~3 min at production tile shapes — measured; NOTES round-4)
from satmvs_tpu import cache as _cache

_cache.enable()


def seam_metric(depth, tile: int, halo: int, multiple: int = 32):
    """(seam-jump, interior-jump, ratio): mean |adjacent-pixel difference|
    across tile boundaries vs 8 px inside them."""
    import numpy as np

    from satmvs_tpu.infer import tiling

    h, w = depth.shape
    tiles = tiling.plan_tiles(h, w, tile=tile, halo=halo, multiple=multiple)
    rows = sorted({t.core_row0 for t in tiles if t.core_row0 > 0})
    cols = sorted({t.core_col0 for t in tiles if t.core_col0 > 0})
    seam, inner = [], []
    for r in rows:
        if 8 <= r < h - 9:
            seam.append(np.abs(depth[r] - depth[r - 1]))
            inner.append(np.abs(depth[r + 8] - depth[r + 7]))
    for c in cols:
        if 8 <= c < w - 9:
            seam.append(np.abs(depth[:, c] - depth[:, c - 1]))
            inner.append(np.abs(depth[:, c + 8] - depth[:, c + 7]))
    import numpy as np

    s = float(np.mean([x.mean() for x in seam])) if seam else 0.0
    i = float(np.mean([x.mean() for x in inner])) if inner else 1e-9
    return s, i, s / max(i, 1e-9)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=2560)
    p.add_argument("--tile", type=int, default=384)
    p.add_argument("--halo", type=int, default=32)
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--ckpt", default="", help="trained checkpoint (default: "
                   "train a quick synthetic model first)")
    p.add_argument("--train_epochs", type=int, default=8)
    p.add_argument("--train_scenes", type=int, default=6)
    p.add_argument("--workdir", default="")
    p.add_argument("--streaming", action="store_true",
                   help="slab-streaming tile forward (predict_scene "
                        "--streaming; batched grid=(B, D) pipeline with "
                        "--batch_tiles > 1)")
    p.add_argument("--slab", type=int, default=8)
    p.add_argument("--batch_tiles", type=int, default=0)
    p.add_argument("--norm", default="tile", choices=["tile", "scene"],
                   help="tile radiometry (predict_scene --norm)")
    p.add_argument("--dsm", action="store_true",
                   help="also fuse all views to a DSM (reports valid%%)")
    p.add_argument("--p_ratio", type=float, default=2.0)
    p.add_argument("--d_ratio", type=float, default=7.5)
    p.add_argument("--json_out", default="",
                   help="append the one-line JSON record here too")
    a = p.parse_args()

    import numpy as np
    from PIL import Image

    from satmvs_tpu.data import formats, synthetic

    work = a.workdir or tempfile.mkdtemp(prefix="scene_bench_")
    os.makedirs(work, exist_ok=True)
    print(f"[scene_bench] workdir {work}")

    # ---- scene on disk (reused across runs of the same workdir — host-side
    # rendering of a 2560² triplet takes ~20 min on this 2-core box)
    t0 = time.time()
    img_paths = [os.path.join(work, f"v{vi}.png") for vi in range(3)]
    rpc_paths = [os.path.join(work, f"v{vi}.rpc") for vi in range(3)]
    gt_path = os.path.join(work, "gt_ref.npy")
    if all(os.path.exists(p) for p in img_paths + rpc_paths + [gt_path]):
        gt = np.load(gt_path)
        print(f"[scene_bench] reusing scene in {work}")
    else:
        scene = synthetic.make_scene(a.size, a.size, seed=3, h_amp=100.0)
        for vi in range(3):
            arr = scene["images"][vi]
            arr8 = np.clip((arr - arr.min()) / max(np.ptp(arr), 1e-6) * 255,
                           0, 255)
            Image.fromarray(arr8.astype(np.uint8)).save(img_paths[vi])
            formats.save_rpc(rpc_paths[vi], scene["rpcs"][vi])
        gt = scene["gt_heights"][2]
        np.save(gt_path, gt)
        print(f"[scene_bench] scene {a.size}x{a.size} written in {time.time()-t0:.1f}s")

    env = dict(os.environ)

    # ---- checkpoint: train a quick model if none given
    ckpt = a.ckpt
    if not ckpt:
        ds_root = os.path.join(work, "train_ds")
        synthetic.write_synthetic_dataset(ds_root, num_scenes=a.train_scenes,
                                          width=160, height=160, h_amp=100.0)
        logdir = os.path.join(work, "logs")
        r = subprocess.run(
            [sys.executable, "scripts/train.py", "--mode=train", "--model=red",
             "--geo_model=rpc", f"--dataset_root={ds_root}",
             f"--logdir={logdir}", "--ndepths", a.ndepths,
             "--epochs", str(a.train_epochs)],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        ckpt = os.path.join(logdir, "red", "rpc")
        print(f"[scene_bench] quick model trained ({a.train_epochs} epochs)")

    # ---- the real surface: predict_scene CLI (output per norm mode so a
    # tile/scene A/B in one workdir keeps both maps)
    out_pfm = os.path.join(work, f"scene_height_{a.norm}.pfm")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "scripts/predict_scene.py",
         "--images", *img_paths, "--rpcs", *rpc_paths,
         f"--loadckpt={ckpt}", f"--out={out_pfm}",
         "--ndepths", a.ndepths, "--ref_index", "2",
         "--tile", str(a.tile), "--halo", str(a.halo)]
        + (["--streaming", "--slab", str(a.slab)] if a.streaming else [])
        + (["--batch_tiles", str(a.batch_tiles)] if a.batch_tiles else [])
        + (["--norm", a.norm] if a.norm != "tile" else [])
        + (["--dsm", os.path.join(work, f"dsm_{a.norm}.tif"),
            "--p_ratio", str(a.p_ratio), "--d_ratio", str(a.d_ratio)]
           if a.dsm else []),
        env=env, capture_output=True, text=True, timeout=9000,
    )
    wall = time.time() - t0
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0, r.stderr[-3000:]
    scene_lines = [ln for ln in r.stdout.splitlines() if "[scene]" in ln]
    stats_line = scene_lines[0] if scene_lines else ""
    for ln in scene_lines:
        print(ln)
    print(f"[scene_bench] CLI wall (incl. compile) {wall:.1f}s")

    # ---- score
    depth = formats.load_pfm(out_pfm)
    err = np.abs(depth - gt)
    mae = float(np.mean(err))
    lt25 = float(np.mean(err < 2.5))
    s, i, ratio = seam_metric(depth, a.tile, a.halo)
    print(f"[scene_bench] MAE {mae:.2f} m, <2.5m {lt25:.1%}; "
          f"seam jump {s:.3f} m vs interior {i:.3f} m (ratio {ratio:.2f})")
    host_share = None
    m = re.search(r"host prep ([0-9.]+)s \((\d+)%", stats_line)
    if m:
        host_share = int(m.group(2)) / 100.0
        print(f"[scene_bench] host-prep share {m.group(2)}% (target <20%)")

    # ---- the machine-parseable record (same contract as bench.py: ONE JSON
    # line the next round can diff mechanically — VERDICT r4 #5)
    scene_wall = steady_tile = None
    m = re.search(r"wall ([0-9.]+)s", stats_line)
    if m:
        scene_wall = float(m.group(1))
    m = re.search(r"steady-state [0-9.]+s/chunk \(([0-9.]+)s/tile\)",
                  r.stdout)
    if m:
        steady_tile = float(m.group(1))
    valid_pct = None
    m = re.search(r"DSM written: .* \(valid ([0-9.]+)%", r.stdout)
    if m:
        valid_pct = float(m.group(1))
    record = {
        "size": a.size, "tile": a.tile, "halo": a.halo, "norm": a.norm,
        "streaming": bool(a.streaming),
        "cli_wall_s": round(wall, 1),
        "wall_s": scene_wall,
        "steady_tile_s": steady_tile,
        "host_prep_share": host_share,
        "seam_jump_m": round(s, 4), "interior_jump_m": round(i, 4),
        "seam_ratio": round(ratio, 3),
        "mae_m": round(mae, 3), "lt2.5m_pct": round(lt25 * 100, 2),
        "valid_pct": valid_pct,
    }
    import json

    line = json.dumps(record)
    print(line)
    if a.json_out:
        with open(a.json_out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
