#!/usr/bin/env python
"""Fusion operating-point sweep (VERDICT r4 #3).

The geometric-consistency filter has four thresholds
(ref tools/rpc_filter.py:71-112: p_ratio / d_ratio / geo_consist_num /
confidence_ratio); this sweeps them over ALREADY-PREDICTED per-view height
maps (written by `predict_scene.py --dsm` as `<out>_view{i}.pfm`, or passed
explicitly) and prints the valid%-vs-MAE curve as one JSON line per setting —
the filter itself is seconds per point, so the whole curve costs one scene
prediction.

MAE is scored in reference-view pixel space against --gt (a height PFM/np
file co-registered with view 0 of --rpcs), over the fused mask, with the
reference's 250 m gross-error cut (ref tools/utils.py:176-206 semantics).

Usage:
  python scripts/fusion_sweep.py --views h_view2.pfm h_view0.pfm h_view1.pfm \
      --rpcs v2.rpc v0.rpc v1.rpc [--prob h_prob.pfm] [--gt gt.npy] \
      [--p_ratio 1 2 4] [--d_ratio 2.5 7.5 15] [--geo_consist 1 2] \
      [--confidence 0 0.1]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])

import numpy as np


def load_map(path: str) -> np.ndarray:
    from satmvs_tpu.data import formats

    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    return formats.load_pfm(path).astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--views", nargs="+", required=True,
                   help="per-view height PFMs, reference view FIRST "
                        "(predict_scene --dsm writes <out>_view{i}.pfm)")
    p.add_argument("--rpcs", nargs="+", required=True,
                   help="RPC files in the SAME order as --views")
    p.add_argument("--prob", default=None,
                   help="reference-view confidence PFM (predict_scene writes "
                        "<out>_prob.pfm)")
    p.add_argument("--gt", default=None,
                   help="reference-view GT heights (.pfm or .npy) for MAE")
    p.add_argument("--p_ratio", type=float, nargs="+",
                   default=[0.5, 1.0, 2.0, 4.0, 8.0])
    p.add_argument("--d_ratio", type=float, nargs="+",
                   default=[2.5, 5.0, 7.5, 15.0, 30.0])
    p.add_argument("--geo_consist", type=int, nargs="+", default=[1, 2])
    p.add_argument("--confidence", type=float, nargs="+", default=[0.0])
    p.add_argument("--out", default=None, help="also append JSONL here")
    a = p.parse_args()
    assert len(a.views) == len(a.rpcs)

    from satmvs_tpu.data import formats
    from satmvs_tpu.infer.fuse import filter_depth_rpc

    depths = np.stack([load_map(v) for v in a.views])
    rpcs = np.stack([formats.load_rpc(r)[0] for r in a.rpcs])
    prob = load_map(a.prob) if a.prob else None
    gt = load_map(a.gt) if a.gt else None
    if gt is not None:
        assert gt.shape == depths[0].shape, (gt.shape, depths[0].shape)

    rows = []
    for pr, dr, gc, cr in itertools.product(
        a.p_ratio, a.d_ratio, a.geo_consist, a.confidence
    ):
        if gc > len(a.views) - 1:
            continue
        mask, fused = filter_depth_rpc(
            depths, rpcs, p_ratio=pr, d_ratio=dr, geo_consist_num=gc,
            prob=prob, confidence_ratio=cr,
        )
        row = {
            "p_ratio": pr, "d_ratio": dr, "geo_consist": gc,
            "confidence": cr, "valid_pct": round(float(mask.mean()) * 100, 2),
        }
        if gt is not None and mask.any():
            err = np.abs(fused - gt)[mask]
            err = err[err < 250.0]  # the reference's gross-error cut
            row["mae_m"] = round(float(err.mean()), 3) if err.size else None
            row["lt2.5m_pct"] = (
                round(float((err < 2.5).mean()) * 100, 2) if err.size else None
            )
        rows.append(row)
        print(json.dumps(row))

    if a.out:
        with open(a.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
