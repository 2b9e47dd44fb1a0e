"""Sample-list generation over the WHU-TLC directory layout.

Counterpart of /root/reference/dataset/gen_list.py.  Layout conventions:
  rpc geo model:     image/{v}/name.png  rpc/{v}/name.rpc     height/{v}/name.pfm
  pinhole geo model: image/{v}/name.png  camera/{v}/name.txt  depth/{v}/name.pfm

A sample is (ref_image, ref_cam, src_image, src_cam, ..., ref_height).
"""

from __future__ import annotations

import os


def _ext(root: str, kind: str, view: int, name: str, ext: str) -> str:
    return os.path.join(root, kind, str(view), f"{name}{ext}").replace("\\", "/")


def _list_names(root: str, view: int) -> list[str]:
    folder = os.path.join(root, "image", str(view))
    return sorted(os.path.splitext(p)[0] for p in os.listdir(folder))


def _make_sample(root, ref_view, view_num, name, cam_dir, cam_ext, height_dir):
    sample = [
        _ext(root, "image", ref_view, name, ".png"),
        _ext(root, cam_dir, ref_view, name, cam_ext),
    ]
    for s in range(view_num):
        sv = (ref_view + s) % view_num
        if sv != ref_view:
            sample.append(_ext(root, "image", sv, name, ".png"))
            sample.append(_ext(root, cam_dir, sv, name, cam_ext))
    sample.append(_ext(root, height_dir, ref_view, name, ".pfm"))
    return sample


def gen_list(root: str, view_num: int, ref_view: int = 2, geo_model: str = "rpc"):
    """Samples with a fixed reference view (ref gen_list.py:44-77,106-151).

    ref_view < 0 → every view takes a turn as reference (the prediction /
    all-views mode, ref gen_list.py:6-41)."""
    cam_dir, cam_ext = ("rpc", ".rpc") if geo_model == "rpc" else ("camera", ".txt")
    height_dir = "height" if geo_model == "rpc" else "depth"
    refs = range(view_num) if ref_view < 0 else [ref_view]
    samples = []
    for r in refs:
        for name in _list_names(root, r):
            samples.append(_make_sample(root, r, view_num, name, cam_dir, cam_ext, height_dir))
    return samples
