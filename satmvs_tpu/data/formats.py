"""File formats: PFM, RPC text, pinhole camera text, TFW, images, DSM rasters.

Counterpart of /root/reference/dataset/data_io.py.  GDAL is not available in
this environment, so GeoTIFF raster I/O is gated behind an optional import
with a PFM + TFW sidecar fallback (`write_dsm` / `read_dsm`) that carries the
same georeferencing information.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

try:  # pragma: no cover - optional dependency
    from osgeo import gdal  # type: ignore

    HAS_GDAL = True
except ImportError:  # pragma: no cover
    gdal = None
    HAS_GDAL = False


# ---------------------------------------------------------------------------
# PFM (ref data_io.py:17-74)
# ---------------------------------------------------------------------------
def load_pfm(path: str) -> np.ndarray:
    """Read a PFM file → (H, W) or (H, W, 3) float32 (top row first).

    Uses the native C++ decoder (satmvs_tpu.native) when available."""
    from .. import native

    if native.available():
        out = native.pfm_read(path)
        if out is not None:
            return out
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dim_match = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dim_match:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().decode("latin-1").rstrip())
        dtype = "<f" if scale < 0 else ">f"
        data = np.fromfile(f, dtype)
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).astype(np.float32)


def save_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.asarray(image)
    if image.dtype.name != "float32":
        raise ValueError("PFM image dtype must be float32")
    color = image.ndim == 3 and image.shape[2] == 3
    if not (color or image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1)):
        raise ValueError("image must be HxW, HxWx1, or HxWx3")
    from .. import native

    if native.available() and native.pfm_write(path, image):
        return
    flipped = np.flipud(image)
    endian = image.dtype.byteorder
    if endian == "<" or (endian == "=" and sys.byteorder == "little"):
        scale = -scale
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{scale}\n".encode())
        f.write(flipped.tobytes())


# ---------------------------------------------------------------------------
# RPC text (ref data_io.py:78-92; tools/RPCCore.py:242-421)
# ---------------------------------------------------------------------------
_RPC_SCALAR_LABELS = [
    "LINE_OFF:", "SAMP_OFF:", "LAT_OFF:", "LONG_OFF:", "HEIGHT_OFF:",
    "LINE_SCALE:", "SAMP_SCALE:", "LAT_SCALE:", "LONG_SCALE:", "HEIGHT_SCALE:",
]
_RPC_SCALAR_UNITS = [
    "pixels", "pixels", "degrees", "degrees", "meters",
    "pixels", "pixels", "degrees", "degrees", "meters",
]
_RPC_BLOCKS = [
    "LINE_NUM_COEFF", "LINE_DEN_COEFF", "SAMP_NUM_COEFF", "SAMP_DEN_COEFF",
    "LAT_NUM_COEFF", "LAT_DEN_COEFF", "LONG_NUM_COEFF", "LONG_DEN_COEFF",
]


def load_rpc(path: str):
    """Read a `.rpc` text file → ((N,) float64, h_max, h_min).

    N is 90 (direct only) or 170 (direct + inverse); values are the second
    whitespace token of each line (ref data_io.py:78-92).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"RPC not found: {path}")
    with open(path) as f:
        lines = f.read().splitlines()
    data = np.array([ln.split(" ")[1] for ln in lines if ln.strip()], dtype=np.float64)
    if data.shape[0] not in (90, 170):
        raise ValueError(f"{path}: expected 90 or 170 RPC values, got {data.shape[0]}")
    h_max = data[4] + data[9]
    h_min = data[4] - data[9]
    return data, h_max, h_min


def save_rpc(path: str, data: np.ndarray) -> None:
    """Write a 90- or 170-value RPC in the reference text layout."""
    data = np.asarray(data, dtype=np.float64)
    n_blocks = (data.shape[0] - 10) // 20
    lines = [
        f"{label} {float(val):.17g} {unit}"
        for label, val, unit in zip(_RPC_SCALAR_LABELS, data[:10], _RPC_SCALAR_UNITS)
    ]
    for blk in range(n_blocks):
        name = _RPC_BLOCKS[blk]
        for i in range(20):
            lines.append(f"{name}_{i + 1}: {float(data[10 + blk * 20 + i]):.17g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# pinhole camera text (ref data_io.py:328-391)
# ---------------------------------------------------------------------------
def load_camera(path: str):
    """Read the fitted-camera text format → (K (3,3), E (4,4), d_min, d_max, d_inter)."""
    with open(path) as f:
        lines = f.read().splitlines()
    e = np.array([[float(v) for v in lines[r].split(" ")] for r in range(4)])
    f_, x0, y0 = (float(v) for v in lines[5].split(" "))
    k = np.array([[f_, 0.0, x0], [0.0, f_, y0], [0.0, 0.0, 1.0]])
    d_min, d_max, d_inter = (float(v) for v in lines[7].split(" "))
    return k, e, d_min, d_max, d_inter


def save_camera(path, k, r, t, d_min, d_max, d_interval, img_index=0, width=0, height=0):
    e = np.concatenate([np.asarray(r), np.asarray(t).reshape(3, 1)], axis=-1)
    lines = [" ".join(str(v) for v in row) for row in e]
    lines += ["0 0 0 1", "", f"{k[0, 0]} {k[0, 2]} {k[1, 2]}", ""]
    lines += [f"{d_min} {d_max} {d_interval}", f"{img_index} 0 0 0 0 {width} {height}"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_camera_nn(path: str) -> np.ndarray:
    """(2, 4, 4) [extrinsics; intrinsics + depth-range row] as the pinhole
    dataset consumes it (ref data_io.py:377-391)."""
    k, e, d_min, d_max, d_inter = load_camera(path)
    cam = np.zeros((2, 4, 4), dtype=np.float64)
    cam[0] = e
    cam[1, :3, :3] = k
    cam[1, 3, 0] = d_min
    cam[1, 3, 1] = d_inter
    cam[1, 3, 3] = d_max
    return cam


# ---------------------------------------------------------------------------
# TFW georeference sidecar (ref data_io.py:264-281, 289-300)
# ---------------------------------------------------------------------------
def read_tfw(path: str) -> np.ndarray:
    with open(path) as f:
        vals = np.array(f.read().splitlines(), dtype=np.float64)
    if vals.shape[0] != 6:
        raise ValueError(f"{path}: expected 6 TFW parameters, got {vals.shape[0]}")
    return vals


def write_tfw(path: str, e_ul: float, n_ul: float, x_unit: float, y_unit: float) -> None:
    with open(path, "w") as f:
        f.write(f"{x_unit}\n0\n0\n{-y_unit}\n{e_ul}\n{n_ul}\n")


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------
def read_image(path: str) -> np.ndarray:
    """Read an image → (H, W, 3) float32; grayscale is replicated to 3
    channels (ref data_io.py:154-166)."""
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    elif arr.shape[2] > 3:
        arr = arr[..., :3]
    return arr.astype(np.float32)


def scene_size(path: str):
    """(width, height) of a scene raster without reading pixels
    (ref data_io.py:169-179).  GDAL when available, PIL otherwise."""
    if HAS_GDAL:  # pragma: no cover - no GDAL in this image
        ds = gdal.Open(path)
        if ds is None:
            raise IOError(f"GDAL failed to open {path}")
        w, h = ds.RasterXSize, ds.RasterYSize
        del ds
        return w, h
    from PIL import Image

    with Image.open(path) as img:
        return img.size


def read_scene_image(path: str, x_lu: int = 0, y_lu: int = 0,
                     x_size: int | None = None, y_size: int | None = None,
                     tone: object = "auto") -> np.ndarray:
    """Windowed read of one scene raster band → (H, W) float32.

    The production WHU-TLC scenes are 5120x5120 GeoTIFFs with raw (>8-bit)
    radiometry read via GDAL with tone mapping (ref data_io.py:181-261:
    gdal_read_img_tone / gdal_read_img_pipeline).  GDAL path does a true
    windowed RasterIO; the fallback decodes with PIL (any TIFF/PNG it
    understands, incl. uint16) and crops.  Multi-band rasters are averaged
    (ref :198-200).

    tone: "auto" applies the reference's γ=1/2.2 + 0.5/99.5-percentile
    stretch iff the source is not already 8-bit (the reference applies it to
    raw GeoTIFFs but reads prepared uint8 PNGs untouched); True/False force.
    """
    if HAS_GDAL:  # pragma: no cover - no GDAL in this image
        ds = gdal.Open(path)
        if ds is None:
            raise IOError(f"GDAL failed to open {path}")
        if x_size is None:
            x_size = ds.RasterXSize - x_lu
        if y_size is None:
            y_size = ds.RasterYSize - y_lu
        data = ds.ReadAsArray(x_lu, y_lu, x_size, y_size)
        del ds
        if data.ndim > 2:
            data = data.astype(np.float64).mean(axis=0)
        is_8bit = data.dtype == np.uint8
    else:
        from PIL import Image

        with Image.open(path) as img:
            if x_size is None:
                x_size = img.size[0] - x_lu
            if y_size is None:
                y_size = img.size[1] - y_lu
            window = img.crop((x_lu, y_lu, x_lu + x_size, y_lu + y_size))
            data = np.asarray(window)
        if data.ndim > 2:
            data = data.astype(np.float64).mean(axis=-1)
        is_8bit = data.dtype == np.uint8
    apply_tone = tone is True or (tone == "auto" and not is_8bit)
    data = data.astype(np.float32)
    if apply_tone:
        data = tone_map(data).astype(np.float32)
    return data


def tone_map(data: np.ndarray) -> np.ndarray:
    """γ=1/2.2 + 0.5/99.5-percentile stretch → uint8-range float
    (ref data_io.py:181-214) — for raw GeoTIFF radiometry."""
    im = np.power(np.maximum(data.astype(np.float64), 0.0), 1.0 / 2.2)
    lo = np.percentile(im, 0.5)
    hi = np.percentile(im, 99.5)
    im = np.clip(im, lo, hi)
    return 255.0 * (im - lo) / max(hi - lo, 1e-9)


# ---------------------------------------------------------------------------
# DSM raster (GDAL GeoTIFF when available; PFM + TFW fallback)
# ---------------------------------------------------------------------------
def write_dsm(path: str, data: np.ndarray, e_ul: float, n_ul: float,
              x_unit: float, y_unit: float) -> str:
    """Write a georeferenced DSM raster.  With GDAL → GeoTIFF (+ TFW sidecar,
    ref data_io.py:289-300); without → PFM + TFW carrying identical info.
    Returns the raster path actually written."""
    data = np.asarray(data, dtype=np.float32)
    if HAS_GDAL and path.endswith(".tif"):  # pragma: no cover - no GDAL here
        drv = gdal.GetDriverByName("GTiff")
        ds = drv.Create(path, data.shape[1], data.shape[0], 1, gdal.GDT_Float32)
        ds.GetRasterBand(1).WriteArray(data)
        del ds
        write_tfw(path[:-4] + ".tfw", e_ul, n_ul, x_unit, y_unit)
        return path
    out = path[:-4] + ".pfm" if path.endswith(".tif") else path
    save_pfm(out, data)
    write_tfw(os.path.splitext(out)[0] + ".tfw", e_ul, n_ul, x_unit, y_unit)
    return out


def read_dsm(path: str):
    """Read a DSM raster + TFW → (data, tfw)."""
    if path.endswith(".pfm"):
        data = load_pfm(path)
    elif HAS_GDAL:  # pragma: no cover
        ds = gdal.Open(path)
        data = ds.ReadAsArray()
        del ds
    else:
        raise RuntimeError("GeoTIFF reading requires GDAL; use the PFM fallback")
    tfw = read_tfw(os.path.splitext(path)[0] + ".tfw")
    return data, tfw
