"""Native C++ data-plane tests: parity with the pure-Python paths."""

import numpy as np
import pytest

from satmvs_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@requires_native
def test_native_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(33, 47)).astype(np.float32)
    p = str(tmp_path / "n.pfm")
    assert native.pfm_write(p, img)
    out = native.pfm_read(p)
    np.testing.assert_array_equal(out, img)
    # color
    img3 = rng.normal(size=(9, 5, 3)).astype(np.float32)
    native.pfm_write(p, img3)
    np.testing.assert_array_equal(native.pfm_read(p), img3)


@requires_native
def test_native_pfm_matches_python_reader(tmp_path):
    """Cross-compat: python-written files read natively and vice versa."""
    import os

    os.environ["SATMVS_NO_NATIVE"] = "0"
    from satmvs_tpu.data import formats

    rng = np.random.default_rng(1)
    img = rng.normal(size=(16, 24)).astype(np.float32)
    p_native = str(tmp_path / "a.pfm")
    native.pfm_write(p_native, img)
    np.testing.assert_array_equal(formats.load_pfm(p_native), img)

    # force the python writer, read with native
    p_py = str(tmp_path / "b.pfm")
    import sys

    # inline python writer (mirror of formats.save_pfm fallback)
    flipped = np.flipud(img)
    with open(p_py, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(flipped.astype("<f").tobytes())
    np.testing.assert_array_equal(native.pfm_read(p_py), img)


@requires_native
def test_native_center_image_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (32, 48, 3)).astype(np.float32)
    got = native.center_image(img)
    mean = img.mean(axis=(0, 1), keepdims=True)
    var = img.var(axis=(0, 1), keepdims=True)
    want = (img - mean) / (np.sqrt(var) + 1e-8)
    np.testing.assert_allclose(got, want, atol=1e-4)


@requires_native
def test_native_tone_map_matches_numpy():
    rng = np.random.default_rng(3)
    raw = rng.uniform(0, 4000, (64, 64)).astype(np.float32)
    got = native.tone_map_u8(raw).astype(np.float64)
    from satmvs_tpu.data.formats import tone_map

    want = tone_map(raw)
    # histogram percentile vs exact sort percentile: small quantization slack
    assert np.abs(got - want).mean() < 2.0


@requires_native
def test_native_downsample_nearest():
    arr = np.arange(64, dtype=np.float32).reshape(8, 8)
    got = native.downsample_nearest(arr, 4)
    np.testing.assert_array_equal(got, arr[::4, ::4])
