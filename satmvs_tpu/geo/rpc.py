"""Rational Polynomial Camera (RPC) model — TPU-native core.

One implementation of the RPC cubic rational polynomials shared by the
plane-sweep warp (ops/warp.py), the fusion filter (infer/fuse.py) and the
offline tooling, replacing the reference's three separate copies
(/root/reference/tools/RPCCore.py, tools/rpc_tensor.py,
 /root/reference/modules/warping.py:183-307).

Representation
  An RPC is a flat (170,) float array using the same layout as the reference
  `.rpc` text files (/root/reference/tools/RPCCore.py:9-28):
    [0..9]    LINE_OFF SAMP_OFF LAT_OFF LON_OFF HEI_OFF
              LINE_SCALE SAMP_SCALE LAT_SCALE LON_SCALE HEI_SCALE
    [10..90]  LNUM(20) LDEM(20) SNUM(20) SDEM(20)      (direct: obj → photo)
    [90..170] LATNUM(20) LATDEM(20) LONNUM(20) LONDEM(20) (inverse: photo → obj)

TPU numerics design (deliberate departure from the reference's float64):
  The reference evaluates RPC polynomials in float64 throughout the warp
  (/root/reference/modules/warping.py:28,323-337).  float64 is emulated and
  slow on TPU.  Instead, the hot path here works entirely in *normalized*
  coordinates (≈[-1, 1], where float32 has ~6e-8 relative precision) via
  `photo_to_obj_n` / `obj_to_photo_n`; cross-view renormalization constants
  are precomputed on host in float64 (`renorm_affine`) so absolute lat/lon
  (whose float32 ulp is ~0.2 m at ±60°) never materialize on device.
  tests/test_rpc.py validates the composed fp32 path against the float64
  oracle to < 0.01 px.

The polynomial evaluation is formulated as one (N, 20) @ (20, 4) matmul per
projection direction (numerator/denominator for both output coordinates at
once) — MXU-friendly — rather than the reference's 8 separate
sum(coef * rpc_slice) reductions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# 170-vector layout (indices match the reference .rpc text format)
# ---------------------------------------------------------------------------
LINE_OFF, SAMP_OFF, LAT_OFF, LON_OFF, HEI_OFF = 0, 1, 2, 3, 4
LINE_SCALE, SAMP_SCALE, LAT_SCALE, LON_SCALE, HEI_SCALE = 5, 6, 7, 8, 9
LNUM = slice(10, 30)
LDEM = slice(30, 50)
SNUM = slice(50, 70)
SDEM = slice(70, 90)
LATNUM = slice(90, 110)
LATDEM = slice(110, 130)
LONNUM = slice(130, 150)
LONDEM = slice(150, 170)

NUM_PARAMS = 170
NUM_TERMS = 20


# ---------------------------------------------------------------------------
# cubic monomial basis
# ---------------------------------------------------------------------------
def poly_basis(p, l, h):
    """20-term cubic monomial basis of the RPC model, stacked on a new last axis.

    Term ordering matches the reference (/root/reference/tools/RPCCore.py:116-140):
      [1, L, P, H, LP, LH, PH, L², P², H², PLH,
       L³, LP², LH², L²P, P³, PH², L²H, P²H, H³]

    Works for NumPy or JAX inputs of any (broadcast-compatible) shape.
    """
    xp = jnp if isinstance(p, jnp.ndarray) else np
    one = xp.ones_like(p)
    lp, lh, ph = l * p, l * h, p * h
    l2, p2, h2 = l * l, p * p, h * h
    return xp.stack(
        [
            one, l, p, h, lp, lh, ph, l2, p2, h2,
            lp * h, l2 * l, l * p2, l * h2, l2 * p,
            p2 * p, p * h2, l2 * h, p2 * h, h2 * h,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# normalized-space projection (the jitted hot path)
# ---------------------------------------------------------------------------
def fwd_coef_matrix(rpc):
    """(20, 4) direct-projection coefficients [SNUM | SDEM | LNUM | LDEM]."""
    xp = jnp if isinstance(rpc, jnp.ndarray) else np
    return xp.stack([rpc[SNUM], rpc[SDEM], rpc[LNUM], rpc[LDEM]], axis=-1)


def inv_coef_matrix(rpc):
    """(20, 4) inverse-projection coefficients [LATNUM | LATDEM | LONNUM | LONDEM]."""
    xp = jnp if isinstance(rpc, jnp.ndarray) else np
    return xp.stack([rpc[LATNUM], rpc[LATDEM], rpc[LONNUM], rpc[LONDEM]], axis=-1)


def _rational_pair(coefs, p, l, h):
    """Evaluate two rational polynomials sharing one basis via a single matmul.

    coefs: (20, 4) = [num_a | den_a | num_b | den_b]
    returns (a, b) with a = num_a/den_a, b = num_b/den_b, shape = p.shape.
    """
    basis = poly_basis(p, l, h)  # (..., 20)
    # precision=HIGHEST: jax's DEFAULT TPU matmul precision is a single bf16
    # pass (~2^-8 relative error).  Pixel coords are normalized(±1)·SCALE, so
    # that error is ~0.4%·image_extent — ±0.3 px at a 160² training patch but
    # ±10 px at a 5120² scene (measured round-5: the whole scene-scale
    # accuracy degradation + the TPU-vs-CPU fusion valid%% gap, NOTES).  The
    # fp32-exact 3-pass matmul costs <1 ms/sweep on the coarse grid.
    vals = jnp.matmul(basis, coefs, preferred_element_type=basis.dtype,
                      precision=jax.lax.Precision.HIGHEST)  # (..., 4)
    a = vals[..., 0] / vals[..., 1]
    b = vals[..., 2] / vals[..., 3]
    return a, b


def photo_to_obj_n(inv_coefs, samp_n, line_n, hei_n):
    """Inverse RPC in normalized space: (samp_n, line_n, hei_n) → (lat_n, lon_n).

    inv_coefs: (20, 4) from `inv_coef_matrix`.  Basis convention P=samp, L=line
    (reference /root/reference/tools/RPCCore.py:476).
    """
    return _rational_pair(inv_coefs, samp_n, line_n, hei_n)


def obj_to_photo_n(fwd_coefs, lat_n, lon_n, hei_n):
    """Direct RPC in normalized space: (lat_n, lon_n, hei_n) → (samp_n, line_n).

    fwd_coefs: (20, 4) from `fwd_coef_matrix`.  Basis convention P=lat, L=lon
    (reference /root/reference/tools/RPCCore.py:443).
    """
    return _rational_pair(fwd_coefs, lat_n, lon_n, hei_n)


# ---------------------------------------------------------------------------
# absolute-coordinate projection (tooling / oracle; works in the input dtype)
# ---------------------------------------------------------------------------
def obj_to_photo(rpc, lat, lon, hei):
    """(lat, lon, hei) → (samp, line) using the direct RPC.

    Mirrors /root/reference/tools/RPCCore.py:424-455.  Use float64 NumPy inputs
    for oracle-grade accuracy; jnp inputs stay on device.
    """
    lat_n = (lat - rpc[LAT_OFF]) / rpc[LAT_SCALE]
    lon_n = (lon - rpc[LON_OFF]) / rpc[LON_SCALE]
    hei_n = (hei - rpc[HEI_OFF]) / rpc[HEI_SCALE]
    if isinstance(lat_n, jnp.ndarray):
        samp_n, line_n = obj_to_photo_n(fwd_coef_matrix(rpc), lat_n, lon_n, hei_n)
    else:
        basis = poly_basis(lat_n, lon_n, hei_n)
        samp_n = basis @ rpc[SNUM] / (basis @ rpc[SDEM])
        line_n = basis @ rpc[LNUM] / (basis @ rpc[LDEM])
    samp = samp_n * rpc[SAMP_SCALE] + rpc[SAMP_OFF]
    line = line_n * rpc[LINE_SCALE] + rpc[LINE_OFF]
    return samp, line


def photo_to_obj(rpc, samp, line, hei):
    """(samp, line, hei) → (lat, lon) using the inverse RPC.

    Mirrors /root/reference/tools/RPCCore.py:457-489.
    """
    samp_n = (samp - rpc[SAMP_OFF]) / rpc[SAMP_SCALE]
    line_n = (line - rpc[LINE_OFF]) / rpc[LINE_SCALE]
    hei_n = (hei - rpc[HEI_OFF]) / rpc[HEI_SCALE]
    if isinstance(samp_n, jnp.ndarray):
        lat_n, lon_n = photo_to_obj_n(inv_coef_matrix(rpc), samp_n, line_n, hei_n)
    else:
        basis = poly_basis(samp_n, line_n, hei_n)
        lat_n = basis @ rpc[LATNUM] / (basis @ rpc[LATDEM])
        lon_n = basis @ rpc[LONNUM] / (basis @ rpc[LONDEM])
    lat = lat_n * rpc[LAT_SCALE] + rpc[LAT_OFF]
    lon = lon_n * rpc[LON_SCALE] + rpc[LON_OFF]
    return lat, lon


# ---------------------------------------------------------------------------
# cross-view renormalization (host-side float64 → six scalars)
# ---------------------------------------------------------------------------
def renorm_affine(ref_rpc, src_rpc):
    """Affine constants mapping ref-normalized object coords to src-normalized.

      lat_n_src = lat_n_ref * lat_scale + lat_shift     (likewise lon, hei)

    Computed in float64 on host so the device-side fp32 chain
    ref-photo → ref-obj_n → src-obj_n → src-photo never touches absolute
    lat/lon.  Returns a (3, 2) float array [[scale, shift] x (lat, lon, hei)].
    """
    ref = np.asarray(ref_rpc, dtype=np.float64)
    src = np.asarray(src_rpc, dtype=np.float64)
    out = np.empty((3, 2), dtype=np.float64)
    for row, (off, scale) in enumerate(
        [(LAT_OFF, LAT_SCALE), (LON_OFF, LON_SCALE), (HEI_OFF, HEI_SCALE)]
    ):
        out[row, 0] = ref[scale] / src[scale]
        out[row, 1] = (ref[off] - src[off]) / src[scale]
    return out


# ---------------------------------------------------------------------------
# derived quantities & rescaling
# ---------------------------------------------------------------------------
def height_range(rpc):
    """(h_min, h_max) from HEIGHT_OFF ± HEIGHT_SCALE (ref RPCCore.py:66-74)."""
    return rpc[HEI_OFF] - rpc[HEI_SCALE], rpc[HEI_OFF] + rpc[HEI_SCALE]


def scale_rpc(rpc, scale):
    """RPC for an image resized by `scale` (ref dataset/preprocess.py:12-21).

    Image-space offsets and scales (line/samp) are multiplied by `scale`; the
    object-space parameters and all polynomial coefficients are unchanged.
    The per-cascade-stage RPCs of the reference (satmvsdataset.py:83-99) are
    scale_rpc(rpc, 1/2) and scale_rpc(rpc, 1/4).
    """
    xp = jnp if isinstance(rpc, jnp.ndarray) else np
    out = xp.asarray(rpc).copy() if xp is np else rpc
    if xp is np:
        out[[LINE_OFF, SAMP_OFF, LINE_SCALE, SAMP_SCALE]] *= scale
        return out
    idx = jnp.array([LINE_OFF, SAMP_OFF, LINE_SCALE, SAMP_SCALE])
    return out.at[idx].multiply(scale)


def crop_rpc(rpc, start_w, start_h):
    """RPC for a crop whose top-left corner is (start_w, start_h) px
    (ref dataset/preprocess.py:94-95): image-space offsets shift."""
    out = np.asarray(rpc, dtype=np.float64).copy()
    out[SAMP_OFF] -= start_w
    out[LINE_OFF] -= start_h
    return out


# ---------------------------------------------------------------------------
# quaternary-cubic (QC) form
# ---------------------------------------------------------------------------
def to_qc_tensor(c20):
    """Pack 20 cubic coefficients into the symmetric (4, 4, 4) tensor T with
    poly(x) = Σ_ijk T[i,j,k] x_i x_j x_k for x = (1, L, P, H).

    Matches /root/reference/dataset/data_io.py:95-130.  Equivalent math to the
    20-term basis; exposed for the `use_qc` pipeline variant whose TPU-side
    evaluation is a dot_general chain (see ops/warp.py).
    """
    d = np.asarray(c20, dtype=np.float64)
    assert d.shape == (20,)
    t = np.zeros((4, 4, 4), dtype=np.float64)

    def add(i, j, k, v):
        # distribute v equally over all distinct permutations of (i, j, k)
        from itertools import permutations

        perms = set(permutations((i, j, k)))
        for p in perms:
            t[p] += v / len(perms)

    # x = (1, L, P, H): index 0=1, 1=L, 2=P, 3=H
    add(0, 0, 0, d[0])          # 1
    add(0, 0, 1, d[1])          # L
    add(0, 0, 2, d[2])          # P
    add(0, 0, 3, d[3])          # H
    add(0, 1, 2, d[4])          # LP
    add(0, 1, 3, d[5])          # LH
    add(0, 2, 3, d[6])          # PH
    add(0, 1, 1, d[7])          # L²
    add(0, 2, 2, d[8])          # P²
    add(0, 3, 3, d[9])          # H²
    add(1, 2, 3, d[10])         # PLH
    add(1, 1, 1, d[11])         # L³
    add(1, 2, 2, d[12])         # LP²
    add(1, 3, 3, d[13])         # LH²
    add(1, 1, 2, d[14])         # L²P
    add(2, 2, 2, d[15])         # P³
    add(2, 3, 3, d[16])         # PH²
    add(1, 1, 3, d[17])         # L²H
    add(2, 2, 3, d[18])         # P²H
    add(3, 3, 3, d[19])         # H³
    return t


def qc_eval(t, x):
    """Evaluate the QC form: x shape (..., 4), t shape (4, 4, 4) → (...)."""
    if isinstance(x, jnp.ndarray):
        # fp32-exact (see _rational_pair: default TPU dot precision is bf16)
        return jnp.einsum("...i,...j,...k,ijk->...", x, x, x, t,
                          precision=jax.lax.Precision.HIGHEST)
    return np.einsum("...i,...j,...k,ijk->...", x, x, x, t)


# ---------------------------------------------------------------------------
# fitting (host-side float64; data-preparation time)
# ---------------------------------------------------------------------------
def create_virtual_grid(rpc, xy_samples: int = 30, z_samples: int = 20) -> np.ndarray:
    """Virtual 3-D control grid over the RPC's object-space validity box,
    projected to image space and clipped to the image-space box.

    Returns (N, 5) columns [samp, line, lat, lon, hei]
    (ref /root/reference/tools/RPCCore.py:76-114).
    """
    rpc = np.asarray(rpc, dtype=np.float64)
    lat = np.linspace(rpc[LAT_OFF] - rpc[LAT_SCALE], rpc[LAT_OFF] + rpc[LAT_SCALE], xy_samples)
    lon = np.linspace(rpc[LON_OFF] - rpc[LON_SCALE], rpc[LON_OFF] + rpc[LON_SCALE], xy_samples)
    hei = np.linspace(rpc[HEI_OFF] - rpc[HEI_SCALE], rpc[HEI_OFF] + rpc[HEI_SCALE], z_samples)
    glat, glon, ghei = (g.reshape(-1) for g in np.meshgrid(lat, lon, hei))
    samp, line = obj_to_photo(rpc, glat, glon, ghei)
    keep = (
        (samp >= rpc[SAMP_OFF] - rpc[SAMP_SCALE])
        & (samp <= rpc[SAMP_OFF] + rpc[SAMP_SCALE])
        & (line >= rpc[LINE_OFF] - rpc[LINE_SCALE])
        & (line <= rpc[LINE_OFF] + rpc[LINE_SCALE])
    )
    return np.stack([samp, line, glat, glon, ghei], axis=-1)[keep]


def _rational_design_matrix(in_basis: np.ndarray, out_a: np.ndarray, out_b: np.ndarray):
    """Design matrix for jointly fitting two 39-unknown rational polynomials
    (num 20 + den 19 with den[0]=1) sharing one input basis.

    Rows: out_a equations then out_b equations; 78 columns
    (ref /root/reference/tools/RPCCore.py:217-225)."""
    n = in_basis.shape[0]
    a = np.zeros((2 * n, 78), dtype=np.float64)
    a[:n, 0:20] = -in_basis
    a[:n, 20:39] = out_a[:, None] * in_basis[:, 1:]
    a[n:, 39:59] = -in_basis
    a[n:, 59:78] = out_b[:, None] * in_basis[:, 1:]
    rhs = -np.concatenate([out_a, out_b])
    return a, rhs


def fit_inverse_rpc(rpc, xy_samples: int = 30, z_samples: int = 20) -> np.ndarray:
    """Fill slots [90:170] (inverse RPC) by fitting on a virtual control grid.

    Mirrors Calculate_Inverse_RPC → Solve_Inverse_RPC_ICCV
    (/root/reference/tools/RPCCore.py:188-240).  Returns a new (170,) array.
    """
    from .solver import solve_iccv

    rpc = np.asarray(rpc, dtype=np.float64).copy()
    grid = create_virtual_grid(rpc, xy_samples, z_samples)
    samp_n = (grid[:, 0] - rpc[SAMP_OFF]) / rpc[SAMP_SCALE]
    line_n = (grid[:, 1] - rpc[LINE_OFF]) / rpc[LINE_SCALE]
    lat_n = (grid[:, 2] - rpc[LAT_OFF]) / rpc[LAT_SCALE]
    lon_n = (grid[:, 3] - rpc[LON_OFF]) / rpc[LON_SCALE]
    hei_n = (grid[:, 4] - rpc[HEI_OFF]) / rpc[HEI_SCALE]

    basis = poly_basis(samp_n, line_n, hei_n)  # P=samp, L=line
    a, rhs = _rational_design_matrix(basis, lat_n, lon_n)
    x, _ = solve_iccv(a.T @ a, a.T @ rhs)

    rpc[LATNUM] = x[0:20]
    rpc[110] = 1.0
    rpc[111:130] = x[20:39]
    rpc[LONNUM] = x[39:59]
    rpc[150] = 1.0
    rpc[151:170] = x[59:78]
    return rpc


def refit_direct_rpc(rpc, grid: np.ndarray) -> np.ndarray:
    """Re-fit the direct RPC [10:90] from (samp, line, lat, lon, hei) samples
    by plain least squares (ref /root/reference/tools/RPCCore.py:142-186)."""
    rpc = np.asarray(rpc, dtype=np.float64).copy()
    samp_n = (grid[:, 0] - rpc[SAMP_OFF]) / rpc[SAMP_SCALE]
    line_n = (grid[:, 1] - rpc[LINE_OFF]) / rpc[LINE_SCALE]
    lat_n = (grid[:, 2] - rpc[LAT_OFF]) / rpc[LAT_SCALE]
    lon_n = (grid[:, 3] - rpc[LON_OFF]) / rpc[LON_SCALE]
    hei_n = (grid[:, 4] - rpc[HEI_OFF]) / rpc[HEI_SCALE]

    basis = poly_basis(lat_n, lon_n, hei_n)  # P=lat, L=lon
    a, rhs = _rational_design_matrix(basis, samp_n, line_n)
    x, *_ = np.linalg.lstsq(a, rhs, rcond=None)

    rpc[SNUM] = x[0:20]
    rpc[70] = 1.0
    rpc[71:90] = x[20:39]
    rpc[LNUM] = x[39:59]
    rpc[30] = 1.0
    rpc[31:50] = x[59:78]
    return rpc


def check_rpc(
    rpc,
    width: float,
    height: float,
    xy_samples: int = 20,
    h_samples: int = 10,
) -> np.ndarray:
    """Round-trip reprojection-error oracle: photo → obj → photo in float64.

    The reference's own correctness check for the whole RPC stack
    (/root/reference/tools/RPCCore.py:592-631).  Returns per-sample pixel error.
    """
    rpc = np.asarray(rpc, dtype=np.float64)
    h_min, h_max = height_range(rpc)
    x = np.linspace(0, width, xy_samples)
    y = np.linspace(0, height, xy_samples)
    h = np.linspace(h_min, h_max, h_samples)
    gx, gy, gh = (g.reshape(-1) for g in np.meshgrid(x, y, h))
    lat, lon = photo_to_obj(rpc, gx, gy, gh)
    nx, ny = obj_to_photo(rpc, lat, lon, gh)
    return np.hypot(nx - gx, ny - gy)
