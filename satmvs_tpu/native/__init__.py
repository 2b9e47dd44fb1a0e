"""Native host-side data-plane kernels (C++ via ctypes) with lazy build.

The shared library is compiled on first use with g++ (-O3 -shared -fPIC) and
cached next to the source.  Every entry point has a pure-Python fallback in
data/formats.py & data/preprocess.py; `available()` reports whether the
native path is active.  Disable with SATMVS_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "io_kernels.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_io_kernels.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SATMVS_NO_NATIVE") == "1":
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.pfm_read_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.pfm_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
        lib.pfm_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.center_image.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.tone_map_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long, ctypes.c_double, ctypes.c_double,
        ]
        lib.downsample_nearest.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pfm_read(path: str):
    """Native PFM read → (H, W) or (H, W, 3) float32, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    le = ctypes.c_int()
    off = ctypes.c_long()
    if lib.pfm_read_header(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(c), ctypes.byref(le), ctypes.byref(off)) != 0:
        raise ValueError(f"{path}: not a valid PFM file")
    shape = (h.value, w.value, 3) if c.value == 3 else (h.value, w.value)
    out = np.empty(shape, np.float32)
    if lib.pfm_read(path.encode(), _fptr(out)) != 0:
        raise IOError(f"{path}: PFM read failed")
    return out


def pfm_write(path: str, image: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    image = np.ascontiguousarray(image, np.float32)
    channels = 3 if (image.ndim == 3 and image.shape[2] == 3) else 1
    rc = lib.pfm_write(path.encode(), _fptr(image), image.shape[0], image.shape[1], channels)
    if rc != 0:
        raise IOError(f"{path}: PFM write failed ({rc})")
    return True


def center_image(img: np.ndarray):
    """In-place-capable native normalization; returns the normalized array
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(img, np.float32).copy()
    h, w = out.shape[:2]
    c = out.shape[2] if out.ndim == 3 else 1
    lib.center_image(_fptr(out), h, w, c)
    return out


def tone_map_u8(data: np.ndarray, lo_pct: float = 0.5, hi_pct: float = 99.5):
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(data, np.float32)
    out = np.empty(flat.shape, np.uint8)
    lib.tone_map_u8(_fptr(flat), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    flat.size, lo_pct, hi_pct)
    return out


def downsample_nearest(arr: np.ndarray, step: int):
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.float32)
    h, w = arr.shape
    out = np.empty(((h + step - 1) // step, (w + step - 1) // step), np.float32)
    lib.downsample_nearest(_fptr(arr), _fptr(out), h, w, step)
    return out
