"""Datasets over the WHU-TLC directory layout (rpc + pinhole geo models).

Counterpart of /root/reference/dataset/{satmvsdataset,virdataset}.py, emitting
TPU-layout samples:

  imgs          (V, H, W, 3) float32, per-image normalized, view 0 = reference
  cams          per-stage tuple (coarsest first):
                  rpc     → ops.warp.RpcWarpCams (fp32, renorm precomputed fp64)
                  pinhole → (V, 4, 4) float32 projection matrices in a local
                            object frame (shifting the UTM origin to the scene
                            keeps the on-device fp32 matrix inverse well
                            conditioned; the relative transform is invariant)
  depth_values  (2,) [h_min, h_max]
  depth_stages / mask_stages   coarsest-first GT pyramids (train/test modes)
  out_view / out_name          output routing strings

No torch DataLoader: `data.loader.Loader` does shuffling, collation and
threaded prefetch.
"""

from __future__ import annotations

import os

import numpy as np

from ..geo import pinhole as pinlib
from ..geo import rpc as rpclib
from ..ops import warp as warplib
from . import formats, preprocess, samples


class MVSDataset:
    """mode ∈ {train, val, test, pred}; mirrors the reference dataset modes
    (satmvsdataset.py:9-16).  `pred` skips ground truth."""

    def __init__(
        self,
        root: str,
        mode: str,
        view_num: int = 3,
        ref_view: int = 2,
        geo_model: str = "rpc",
        num_stage: int = 3,
        seed: int = 0,
        use_qc: bool = False,
        max_h: int = 0,
        max_w: int = 0,
    ):
        assert mode in ("train", "val", "test", "pred")
        assert geo_model in ("rpc", "pinhole")
        self.root = root
        self.mode = mode
        self.view_num = view_num
        self.geo_model = geo_model
        self.num_stage = num_stage
        self.use_qc = use_qc  # QC-form RPC warp cams (ref --use_qc)
        # every view is center-cropped to network-legal dims (multiples of
        # 32, capped at max_h/max_w when nonzero) with its camera shifted —
        # ref preprocess.py:72-102 semantics (see crop_to_multiple)
        self.max_h = max_h
        self.max_w = max_w
        # direct-only (90-value) .rpc files get their inverse coefficients
        # fitted on load (ref RPCCore.py:31,188-240); cache per path — the
        # ICCV fit is a 78-unknown damped solve, too slow to redo per sample
        self._inv_rpc_cache: dict[str, np.ndarray] = {}
        self.rng = np.random.default_rng(seed)
        ref = -1 if mode == "pred" else ref_view
        self.sample_list = samples.gen_list(root, view_num, ref, geo_model)

    def __len__(self) -> int:
        return len(self.sample_list)

    # ------------------------------------------------------------------
    def _load_views(self, paths):
        imgs, cams_raw = [], []
        ref_window = None
        for v in range(self.view_num):
            img = formats.read_image(paths[2 * v])
            if self.geo_model == "rpc":
                cam = self._load_rpc_full(paths[2 * v + 1])
            else:
                cam = formats.load_camera_nn(paths[2 * v + 1])
            img, cam, window = self._crop_view(img, cam)
            if v == 0:
                ref_window = window
            if self.mode == "train":
                img = preprocess.random_color(img, self.rng)
            imgs.append(preprocess.center_image(img))
            cams_raw.append(cam)
        return np.stack(imgs), cams_raw, ref_window

    def _load_rpc_full(self, path: str) -> np.ndarray:
        """Load an .rpc as a full 170-vector, fitting the inverse block when
        the file ships only the 90 direct values (ref RPCCore.py:31 computes
        the inverse on load; WHU-TLC files already carry all 170)."""
        cam = formats.load_rpc(path)[0]
        if cam.shape[0] == 170:
            return cam
        hit = self._inv_rpc_cache.get(path)
        if hit is None:
            full = np.zeros(170, np.float64)
            full[:90] = cam
            hit = rpclib.fit_inverse_rpc(full)
            self._inv_rpc_cache[path] = hit
        return hit

    def _crop_view(self, img, cam):
        """Center-crop one view to network-legal dims, shifting its camera
        (RPC image offsets / pinhole principal point — ref preprocess.py:
        94-95 and :144-145)."""
        sh, sw, nh, nw = preprocess.crop_to_multiple(img, self.max_h, self.max_w)
        if (sh, sw, nh, nw) == (0, 0, img.shape[0], img.shape[1]):
            return img, cam, (0, 0, nh, nw)
        img = img[sh:sh + nh, sw:sw + nw]
        if self.geo_model == "rpc":
            cam = rpclib.crop_rpc(cam, sw, sh)
        else:
            cam = np.asarray(cam, np.float64).copy()
            cam[1, 0, 2] -= sw
            cam[1, 1, 2] -= sh
        return img, cam, (sh, sw, nh, nw)

    def _stage_scales(self):
        return {3: (0.25, 0.5, 1.0), 2: (0.25, 1.0), 1: (0.25,)}[self.num_stage]

    def _build_cams(self, cams_raw):
        if self.geo_model == "rpc":
            rpcs = np.stack(cams_raw)
            if self.use_qc:
                return warplib.build_qc_stage_cams(rpcs, 0, self.num_stage)
            return warplib.build_stage_cams(rpcs, ref_index=0, num_stage=self.num_stage)
        # pinhole: compose K·E in a local object frame
        es = np.stack([c[0] for c in cams_raw])
        ks = np.stack([c[1, :3, :3] for c in cams_raw])
        centers = np.stack([-e[:3, :3].T @ e[:3, 3] for e in es])
        origin = centers.mean(axis=0)
        projs = []
        for e, k in zip(es, ks):
            e_local = e.copy()
            e_local[:3, 3] = e[:3, 3] + e[:3, :3] @ origin
            projs.append(pinlib.compose_proj_matrix(k, e_local))
        projs = np.stack(projs)
        return tuple(
            np.asarray(pinlib.scale_proj_matrix(projs, s), np.float32)
            for s in self._stage_scales()
        )

    def _depth_range(self, paths):
        if self.geo_model == "rpc":
            _, h_max, h_min = formats.load_rpc(paths[1])
        else:
            cam = formats.load_camera_nn(paths[1])
            h_min, h_max = cam[1, 3, 0], cam[1, 3, 3]
        return np.array([h_min, h_max], dtype=np.float32)

    # ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> dict:
        paths = self.sample_list[idx]
        imgs, cams_raw, ref_window = self._load_views(paths)
        depth_values = self._depth_range(paths)

        sample = {
            "imgs": imgs,
            "cams": self._build_cams(cams_raw),
            "depth_values": depth_values,
            "out_view": paths[0].split("/")[-2],
            "out_name": os.path.splitext(os.path.basename(paths[0]))[0],
        }
        if self.mode != "pred":
            depth = formats.load_pfm(paths[2 * self.view_num])
            sh, sw, nh, nw = ref_window
            depth = depth[sh:sh + nh, sw:sw + nw]
            mask = (
                (depth >= depth_values[0]) & (depth <= depth_values[1])
            ).astype(np.float32)
            sample["depth_stages"] = preprocess.build_pyramid(depth, self.num_stage)
            sample["mask_stages"] = preprocess.build_pyramid(mask, self.num_stage)
        return sample


def find_dataset(geo_model: str):
    """Factory keyed on geo_model (ref dataset/__init__.py:4-13) — both geo
    models share one implementation here."""
    if geo_model not in ("rpc", "pinhole"):
        raise ValueError(f"unknown geo_model {geo_model!r}")
    return MVSDataset
