"""Synthetic satellite-MVS scenes: RPC triplets, terrain, rendered views.

The reference repo ships no sample data (WHU-TLC is an external download), so
the framework provides a geometrically consistent synthetic generator for unit
tests, end-to-end smoke training, and benchmarking.  All host-side NumPy
float64.

A synthetic camera is a hand-constructed *direct* RPC (pushbroom-like: sample
parallax proportional to height, mild cubic distortion terms) whose inverse
RPC is then obtained with the production fitting pipeline
(`geo.rpc.fit_inverse_rpc`) — so every synthetic scene also exercises the
virtual-grid + ICCV-solver stack.
"""

from __future__ import annotations

import math

import numpy as np

from ..geo import rpc as rpclib

# ~meters per degree of latitude on WGS-84 (good enough for synthesis)
_M_PER_DEG = 111_320.0


def make_synthetic_rpc(
    width: int = 256,
    height: int = 256,
    gsd: float = 2.5,
    off_nadir_deg: float = 0.0,
    azimuth_deg: float = 0.0,
    lat0: float = 30.0,
    lon0: float = 120.0,
    h0: float = 500.0,
    h_scale: float = 450.0,
    distortion: float = 3e-3,
    seed: int = 0,
    fit_inverse: bool = True,
) -> np.ndarray:
    """Build a plausible 170-parameter RPC for one view of a scene.

    The direct model (in normalized coordinates) is an affine ground-to-image
    map, a height-parallax term of magnitude tan(off_nadir) along the look
    azimuth, and small random quadratic/cubic distortion terms with a
    near-unity rational denominator.  Height parallax makes the plane-sweep
    geometry non-trivial; the distortions make the inverse fit non-exact (as
    with real cameras).
    """
    rng = np.random.default_rng(seed)
    data = np.zeros(rpclib.NUM_PARAMS, dtype=np.float64)

    samp_scale = width / 2.0
    line_scale = height / 2.0
    lat_scale = height * gsd / 2.0 / _M_PER_DEG
    lon_scale = width * gsd / 2.0 / (_M_PER_DEG * math.cos(math.radians(lat0)))

    data[rpclib.LINE_OFF] = (height - 1) / 2.0
    data[rpclib.SAMP_OFF] = (width - 1) / 2.0
    data[rpclib.LAT_OFF] = lat0
    data[rpclib.LON_OFF] = lon0
    data[rpclib.HEI_OFF] = h0
    data[rpclib.LINE_SCALE] = line_scale
    data[rpclib.SAMP_SCALE] = samp_scale
    data[rpclib.LAT_SCALE] = lat_scale
    data[rpclib.LON_SCALE] = lon_scale
    data[rpclib.HEI_SCALE] = h_scale

    # height parallax in normalized units
    par = math.tan(math.radians(off_nadir_deg))
    par_samp = par * math.cos(math.radians(azimuth_deg)) * h_scale / (samp_scale * gsd)
    par_line = par * math.sin(math.radians(azimuth_deg)) * h_scale / (line_scale * gsd)

    # basis term ordering: [1, L, P, H, LP, LH, PH, L², P², H², PLH, L³, ...]
    # with P = lat_n, L = lon_n, H = hei_n (geo/rpc.py poly_basis).
    snum = np.zeros(20)
    snum[1] = 1.0          # samp_n ≈ lon_n
    snum[2] = 0.02         # slight row/col coupling
    snum[3] = par_samp     # height parallax
    lnum = np.zeros(20)
    lnum[2] = -1.0         # line_n ≈ -lat_n (row grows southward)
    lnum[1] = 0.015
    lnum[3] = par_line

    # mild random high-order distortion (numerator) and rational denominator
    for vec in (snum, lnum):
        vec[4:10] += rng.normal(0.0, distortion, 6)
        vec[10:20] += rng.normal(0.0, distortion / 10.0, 10)
    sdem = np.zeros(20)
    ldem = np.zeros(20)
    sdem[0] = 1.0
    ldem[0] = 1.0
    sdem[1:4] += rng.normal(0.0, distortion / 3.0, 3)
    ldem[1:4] += rng.normal(0.0, distortion / 3.0, 3)

    data[rpclib.SNUM] = snum
    data[rpclib.SDEM] = sdem
    data[rpclib.LNUM] = lnum
    data[rpclib.LDEM] = ldem

    if fit_inverse:
        data = rpclib.fit_inverse_rpc(data)
    return data


def make_rpc_triplet(width: int = 256, height: int = 256, seed: int = 0, **kw) -> list[np.ndarray]:
    """Three-view ZY-3-style geometry: forward / nadir / backward looks.

    View order matches the WHU-TLC convention (views 0, 1, 2 with 2 = the
    nadir reference view by default, ref train.py `--ref_view 2`).
    """
    angles = [(22.0, 0.0), (-22.0, 0.0), (0.0, 0.0)]
    return [
        make_synthetic_rpc(
            width, height, off_nadir_deg=a, azimuth_deg=az, seed=seed + 17 * i, **kw
        )
        for i, (a, az) in enumerate(angles)
    ]


def _terrain(lat_n: np.ndarray, lon_n: np.ndarray, h0: float, h_amp: float,
             seed: int, freq_scale: float = 1.0):
    """Smooth random terrain h(lat_n, lon_n) as a small Fourier series.

    Frequencies/amplitudes are kept low enough that terrain slope times the
    ±22° parallax stays < 1 — the contraction condition of the fixed-point
    renderer (and of real-world multi-view height consistency).

    freq_scale: frequencies are per NORMALIZED scene unit, so without
    scaling a 2560-px scene would be 16x smoother per pixel than a 160-px
    one; render_view passes size/256 so per-pixel terrain statistics (and
    slopes — the contraction bound) are scene-size-invariant."""
    rng = np.random.default_rng(seed + 1000)
    h = np.full_like(lat_n, float(h0))
    for k in range(6):
        fx, fy = rng.uniform(0.3, 1.5, 2) * freq_scale
        px, py = rng.uniform(0, 2 * np.pi, 2)
        amp = h_amp / (1.6 ** k) / (1.0 + 0.6 * (fx + fy) / freq_scale)
        h = h + amp * np.sin(fx * np.pi * lon_n + px) * np.sin(fy * np.pi * lat_n + py)
    return h


def _texture(lat_n: np.ndarray, lon_n: np.ndarray, seed: int,
             freq_scale: float = 1.0):
    """Ground albedo in [0, 255] with multi-scale detail (matchable texture)."""
    rng = np.random.default_rng(seed + 2000)
    t = np.zeros_like(lat_n)
    for k in range(8):
        fx, fy = rng.uniform(2.0, 40.0, 2) * freq_scale
        px, py = rng.uniform(0, 2 * np.pi, 2)
        t = t + np.sin(fx * np.pi * lon_n + px) * np.cos(fy * np.pi * lat_n + py) / (1.2 ** k)
    t = (t - t.min()) / (t.max() - t.min() + 1e-9)
    return 40.0 + 190.0 * t


def render_view(
    rpc: np.ndarray,
    width: int,
    height: int,
    terrain_seed: int = 0,
    h_amp: float = 120.0,
    iters: int = 24,
):
    """Render one view of the synthetic scene and its ground-truth height map.

    For each pixel, solves the ray-terrain intersection h = H(latlon(x, y, h))
    by fixed-point iteration (converges when terrain slope x parallax < 1),
    then samples the shared ground texture — so all rendered views of one
    scene are geometrically consistent under their RPCs.

    Returns (image (H, W) float32 in [0,255], height_map (H, W) float32).
    """
    x, y = np.meshgrid(np.arange(width, dtype=np.float64), np.arange(height, dtype=np.float64))
    x, y = x.reshape(-1), y.reshape(-1)
    h0 = rpc[rpclib.HEI_OFF]
    # per-pixel terrain/texture statistics invariant to scene size (≤256 px
    # unchanged — the regime all accuracy baselines were measured in)
    fscale = max(1.0, max(width, height) / 256.0)

    def terrain_at(lat, lon):
        lat_n = (lat - rpc[rpclib.LAT_OFF]) / rpc[rpclib.LAT_SCALE]
        lon_n = (lon - rpc[rpclib.LON_OFF]) / rpc[rpclib.LON_SCALE]
        return _terrain(lat_n, lon_n, h0, h_amp, terrain_seed, fscale)

    h = np.full_like(x, float(h0))
    for _ in range(iters):
        lat, lon = rpclib.photo_to_obj(rpc, x, y, h)
        # damped fixed point: converges for slope x parallax < 3
        h = 0.5 * h + 0.5 * terrain_at(lat, lon)

    lat, lon = rpclib.photo_to_obj(rpc, x, y, h)
    lat_n = (lat - rpc[rpclib.LAT_OFF]) / rpc[rpclib.LAT_SCALE]
    lon_n = (lon - rpc[rpclib.LON_OFF]) / rpc[rpclib.LON_SCALE]
    img = _texture(lat_n, lon_n, terrain_seed, fscale).reshape(height, width)
    return img.astype(np.float32), h.reshape(height, width).astype(np.float32)


def make_batch(batch_size: int = 1, width: int = 64, height: int = 64,
               seed: int = 0, num_stage: int = 3, with_gt: bool = True,
               use_qc: bool = False) -> dict:
    """In-memory batched training sample (no disk) in the loader's collated
    layout — for tests, dry runs, and benchmarking.  use_qc builds the
    QC-form warp cams (ref --use_qc) instead of the basis form."""
    from ..ops import warp as warplib

    build = warplib.build_qc_stage_cams if use_qc else warplib.build_stage_cams
    sample_cams, imgs_all, dvals_all, gt_all = [], [], [], []
    for b in range(batch_size):
        scene = make_scene(width, height, seed=seed + b, h_amp=80.0)
        order = [2, 0, 1]  # nadir view is the reference, ref-first
        rpcs = scene["rpcs"][order]
        sample_cams.append(build(rpcs, 0, num_stage))
        imgs = scene["images"][order]
        imgs = (imgs - imgs.mean(axis=(1, 2), keepdims=True)) / (
            imgs.std(axis=(1, 2), keepdims=True) + 1e-8
        )
        imgs_all.append(np.repeat(imgs[..., None], 3, axis=-1).astype(np.float32))
        dvals_all.append(scene["h_range"])
        gt_all.append(scene["gt_heights"][2])

    batch = {
        "imgs": np.stack(imgs_all),
        "cams": tuple(
            warplib.stack_cams([c[i] for c in sample_cams]) for i in range(num_stage)
        ),
        "depth_values": np.stack(dvals_all),
        "out_view": ["2"] * batch_size,
        "out_name": [f"synth{b}" for b in range(batch_size)],
    }
    if with_gt:
        from . import preprocess

        pyr = [preprocess.build_pyramid(g, num_stage) for g in gt_all]
        batch["depth_stages"] = [
            np.stack([p[i] for p in pyr]) for i in range(num_stage)
        ]
        batch["mask_stages"] = [np.ones_like(d) for d in batch["depth_stages"]]
    return batch


def write_synthetic_dataset(
    root: str,
    num_scenes: int = 2,
    width: int = 64,
    height: int = 64,
    view_num: int = 3,
    seed: int = 0,
    h_amp: float = 80.0,
    name_prefix: str = "scene",
    **rpc_kwargs,
) -> str:
    """Materialize synthetic scenes in the WHU-TLC on-disk layout
    (image/{v}/name.png, rpc/{v}/name.rpc, height/{v}/name.pfm — ref
    dataset/gen_list.py conventions) so the file-format + dataset stack can be
    exercised end-to-end without the real download."""
    import os

    from PIL import Image

    from . import formats

    for v in range(view_num):
        for kind in ("image", "rpc", "height"):
            os.makedirs(os.path.join(root, kind, str(v)), exist_ok=True)

    for s in range(num_scenes):
        rpcs = make_rpc_triplet(width, height, seed=seed + 31 * s, **rpc_kwargs)
        name = f"{name_prefix}{s:04d}"
        for v, rpc in enumerate(rpcs):
            img, hmap = render_view(rpc, width, height, terrain_seed=seed + 31 * s, h_amp=h_amp)
            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(root, "image", str(v), name + ".png")
            )
            formats.save_rpc(os.path.join(root, "rpc", str(v), name + ".rpc"), rpc)
            formats.save_pfm(os.path.join(root, "height", str(v), name + ".pfm"), hmap)
    return root


def write_whu_tlc_tree(
    root: str,
    num_train: int = 2,
    num_test: int = 1,
    width: int = 64,
    height: int = 64,
    seed: int = 0,
    h_amp: float = 80.0,
    **rpc_kwargs,
) -> str:
    """Materialize the EXACT WHU-TLC "open_dataset" on-disk tree with
    synthetic content: <root>/open_dataset_rpc/{train,test}/{image,rpc,
    height}/{0,1,2}/blockNNNN.* — the split dirs the reference train.py
    resolves (ref train.py:65-66) and the blockwise naming its production
    pipeline uses (ref tools/rpc_tensor.py:174-181: block0000.rpc/.pfm).
    When the real dataset becomes fetchable, parity is a download away —
    the whole CLI journey already runs over this layout
    (tests/test_cli.py::test_whu_tlc_layout_journey)."""
    import os

    for split, n, s0 in (("train", num_train, 0), ("test", num_test, 1000)):
        write_synthetic_dataset(
            os.path.join(root, "open_dataset_rpc", split),
            num_scenes=n, width=width, height=height, seed=seed + s0,
            h_amp=h_amp, name_prefix="block", **rpc_kwargs,
        )
    return root


def make_scene(width: int = 128, height: int = 128, seed: int = 0, h_amp: float = 120.0):
    """Full synthetic MVS sample: 3 rendered views + ref-view GT height.

    Returns dict {images: (V, H, W) float32, rpcs: (V, 170) float64,
    gt_height: (H, W) float32 for the *last* (nadir) view, h_range: (2,)}.
    """
    rpcs = make_rpc_triplet(width, height, seed=seed)
    images, heights = [], []
    for rpc in rpcs:
        img, hmap = render_view(rpc, width, height, terrain_seed=seed, h_amp=h_amp)
        images.append(img)
        heights.append(hmap)
    h_min, h_max = rpclib.height_range(rpcs[-1])
    return {
        "images": np.stack(images),
        "rpcs": np.stack(rpcs),
        "gt_height": heights[-1],
        "gt_heights": np.stack(heights),
        "h_range": np.array([h_min, h_max], dtype=np.float32),
    }
