"""Preprocessing & augmentation (host-side NumPy, deterministic by Generator).

Counterpart of /root/reference/dataset/preprocess.py.  The color augmentation
mirrors the reference's PIL ImageEnhance jitter (random_color,
preprocess.py:166-180) but is a pure-NumPy implementation driven by an
explicit np.random.Generator, so the pipeline is reproducible and thread-safe.
Camera-aware scale/crop live with the camera models (geo.rpc.scale_rpc /
crop_rpc, geo.pinhole.scale_proj_matrix).
"""

from __future__ import annotations

import math

import numpy as np


def center_image(img: np.ndarray) -> np.ndarray:
    """Per-image mean/std normalization over spatial dims
    (ref preprocess.py:150-160).  Native C++ path when available."""
    from .. import native

    if native.available():
        out = native.center_image(img)
        if out is not None:
            return out
    img = np.asarray(img, dtype=np.float32)
    mean = img.mean(axis=(0, 1), keepdims=True)
    var = img.var(axis=(0, 1), keepdims=True)
    return (img - mean) / (np.sqrt(var) + 1e-8)


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return b + factor * (a - b)


def random_color(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Saturation / brightness / contrast / sharpness jitter with the
    reference's factor ranges (preprocess.py:166-180).  img: (H, W, 3) in
    [0, 255] float."""
    img = np.asarray(img, dtype=np.float32)

    # saturation ("Color"): blend with per-pixel luma, factor U[0.01, 3.0]
    f = rng.integers(1, 301) / 100.0
    luma = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
    img = _blend(img, luma, f)

    # brightness: blend with black, U[0.1, 2.0]
    f = rng.integers(10, 201) / 100.0
    img = img * f

    # contrast: blend with mean luma, U[0.1, 2.0]
    f = rng.integers(10, 201) / 100.0
    img = _blend(img, np.full_like(img, luma.mean()), f)

    # sharpness: blend with 3x3 smoothing, U[0.0, 3.0]
    f = rng.integers(0, 301) / 100.0
    kernel = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    smooth = sum(
        kernel[i, j] * pad[i : i + img.shape[0], j : j + img.shape[1]]
        for i in range(3)
        for j in range(3)
    )
    img = _blend(img, smooth, f)
    return np.clip(img, 0.0, 255.0)


def crop_to_multiple(image, max_h: int = 384, max_w: int = 768, base: int = 32):
    """Center-crop window making dims ≤ max and divisible by `base`
    (ref preprocess.py:72-102).  Returns (start_h, start_w, new_h, new_w) —
    apply to image/height-map and shift the camera with geo.rpc.crop_rpc.

    Deliberate fix vs the reference: its below-max branch rounds *up*
    (`ceil(h/base)*base`), giving a negative crop start and a corrupt slice
    for any non-multiple size — here sizes always round DOWN to the largest
    network-legal crop.  max_h/max_w = 0 disables the size cap."""
    h, w = image.shape[:2]
    new_h = (min(h, max_h) if max_h else h) // base * base
    new_w = (min(w, max_w) if max_w else w) // base * base
    assert new_h > 0 and new_w > 0, f"image {h}x{w} smaller than base {base}"
    start_h = int(math.ceil((h - new_h) / 2))
    start_w = int(math.ceil((w - new_w) / 2))
    return start_h, start_w, new_h, new_w


def build_pyramid(arr: np.ndarray, num_stage: int = 3) -> list[np.ndarray]:
    """Coarsest-first nearest-neighbor pyramid of an (H, W) map — GT/mask
    stage pyramids (ref satmvsdataset.py:72-81 uses cv2 INTER_NEAREST)."""
    out = []
    for i in range(num_stage):
        step = 2 ** (num_stage - 1 - i)
        out.append(np.ascontiguousarray(arr[::step, ::step]))
    return out
