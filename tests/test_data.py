"""Data-layer tests: format round-trips, sample lists, preprocessing,
dataset + loader end-to-end over a synthetic on-disk WHU-TLC layout."""

import numpy as np
import pytest

from satmvs_tpu.data import formats, loader, preprocess, samples, synthetic
from satmvs_tpu.data.dataset import MVSDataset, find_dataset
from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.ops.warp import RpcWarpCams


# ---------------------------------------------------------------- formats
def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(17, 23)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    formats.save_pfm(p, img)
    np.testing.assert_array_equal(formats.load_pfm(p), img)
    # color
    img3 = rng.normal(size=(5, 7, 3)).astype(np.float32)
    formats.save_pfm(p, img3)
    np.testing.assert_array_equal(formats.load_pfm(p), img3)


def test_pfm_reads_reference_style_header(tmp_path):
    # header with trailing space after dims, as some writers emit
    img = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = tmp_path / "y.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n3 2 \n-1.0\n")
        f.write(np.flipud(img).astype("<f").tobytes())
    np.testing.assert_array_equal(formats.load_pfm(str(p)), img)


def test_rpc_text_roundtrip(tmp_path):
    rpc = synthetic.make_synthetic_rpc(64, 64, seed=1)
    p = str(tmp_path / "a.rpc")
    formats.save_rpc(p, rpc)
    data, h_max, h_min = formats.load_rpc(p)
    np.testing.assert_array_equal(data, rpc)
    assert h_max == rpc[4] + rpc[9] and h_min == rpc[4] - rpc[9]
    # 90-value (direct-only) files load too
    formats.save_rpc(p, rpc[:90])
    data90, _, _ = formats.load_rpc(p)
    np.testing.assert_array_equal(data90, rpc[:90])


def test_camera_text_roundtrip(tmp_path):
    k = np.array([[1200.0, 0, 320.0], [0, 1200.0, 240.0], [0, 0, 1]])
    r = np.eye(3)
    t = np.array([[1.0], [2.0], [3.0]])
    p = str(tmp_path / "cam.txt")
    formats.save_camera(p, k, r, t, 10.0, 90.0, 0.5, 7, 640, 480)
    k2, e2, dmin, dmax, dint = formats.load_camera(p)
    np.testing.assert_allclose(k2, k)
    np.testing.assert_allclose(e2[:3, :3], r)
    np.testing.assert_allclose(e2[:3, 3], t[:, 0])
    assert (dmin, dmax, dint) == (10.0, 90.0, 0.5)
    cam = formats.load_camera_nn(p)
    assert cam.shape == (2, 4, 4)
    assert cam[1, 3, 0] == 10.0 and cam[1, 3, 3] == 90.0


def test_tfw_roundtrip(tmp_path):
    p = str(tmp_path / "x.tfw")
    formats.write_tfw(p, 500000.0, 3300000.0, 5.0, 5.0)
    tfw = formats.read_tfw(p)
    np.testing.assert_allclose(tfw, [5.0, 0, 0, -5.0, 500000.0, 3300000.0])


def test_write_dsm_fallback(tmp_path):
    data = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)
    out = formats.write_dsm(str(tmp_path / "dsm.tif"), data, 1.0, 2.0, 5.0, 5.0)
    read, tfw = formats.read_dsm(out)
    np.testing.assert_array_equal(read, data)
    assert tfw[4] == 1.0 and tfw[5] == 2.0


def test_tone_map_range():
    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 4000, (50, 50))
    tm = formats.tone_map(raw)
    assert tm.min() >= 0 and tm.max() <= 255.0 + 1e-6


# ---------------------------------------------------------------- preprocess
def test_center_image_stats():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    c = preprocess.center_image(img)
    np.testing.assert_allclose(c.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(c.std(axis=(0, 1)), 1.0, atol=1e-3)


def test_random_color_deterministic_and_bounded():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).uniform(0, 255, (16, 16, 3)).astype(np.float32)
    a = preprocess.random_color(img, np.random.default_rng(42))
    b = preprocess.random_color(img, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() <= 255


def test_crop_to_multiple():
    img = np.zeros((300, 500))
    sh, sw, nh, nw = preprocess.crop_to_multiple(img, max_h=384, max_w=384, base=32)
    assert nh % 32 == 0 and nw % 32 == 0
    assert nh == 288 and nw == 384  # round DOWN below max; cap above max
    assert sh >= 0 and sw >= 0 and sh + nh <= 300 and sw + nw <= 500
    # no-op on already-legal sizes
    assert preprocess.crop_to_multiple(np.zeros((64, 64)), 0, 0) == (0, 0, 64, 64)


def test_build_pyramid():
    arr = np.arange(64, dtype=np.float32).reshape(8, 8)
    pyr = preprocess.build_pyramid(arr, 3)
    assert [p.shape for p in pyr] == [(2, 2), (4, 4), (8, 8)]
    np.testing.assert_array_equal(pyr[2], arr)


# ---------------------------------------------------------------- dataset + loader
@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("whu_synth")
    return synthetic.write_synthetic_dataset(str(root), num_scenes=2, width=64, height=64)


def test_gen_list(synth_root):
    lst = samples.gen_list(synth_root, 3, ref_view=2, geo_model="rpc")
    assert len(lst) == 2
    assert lst[0][0].endswith("image/2/scene0000.png")
    assert lst[0][1].endswith("rpc/2/scene0000.rpc")
    assert lst[0][-1].endswith("height/2/scene0000.pfm")
    all_lst = samples.gen_list(synth_root, 3, ref_view=-1, geo_model="rpc")
    assert len(all_lst) == 6


def test_dataset_sample_and_loader(synth_root):
    ds = find_dataset("rpc")(synth_root, "train", view_num=3, ref_view=2)
    assert len(ds) == 2
    s = ds[0]
    assert s["imgs"].shape == (3, 64, 64, 3)
    assert len(s["cams"]) == 3
    assert isinstance(s["cams"][0], RpcWarpCams)
    assert s["cams"][0].src_fwd.shape == (2, 20, 4)
    assert [d.shape for d in s["depth_stages"]] == [(16, 16), (32, 32), (64, 64)]
    assert s["mask_stages"][0].max() <= 1.0
    assert s["out_view"] == "2" and s["out_name"] == "scene0000"

    ld = loader.Loader(ds, batch_size=2, shuffle=True, prefetch=2, seed=1)
    batches = list(ld)
    assert len(batches) == 1
    b = batches[0]
    assert b["imgs"].shape == (2, 3, 64, 64, 3)
    assert b["cams"][0].src_fwd.shape == (2, 2, 20, 4)
    assert b["depth_stages"][2].shape == (2, 64, 64)
    assert len(b["out_name"]) == 2


def test_dataset_direct_only_rpc_fits_inverse(tmp_path, synth_root):
    """A dataset whose .rpc files ship only the 90 direct values must load:
    the inverse block is fitted on the fly (ref RPCCore.py:31,188-240) and
    must pass the Check_RPC round-trip gate."""
    import shutil

    from satmvs_tpu.geo import rpc as rpclib

    root = tmp_path / "direct_only"
    shutil.copytree(synth_root, root)
    rpc_paths = sorted(str(p) for p in root.rglob("*.rpc"))
    assert rpc_paths
    for p in rpc_paths:
        data = formats.load_rpc(p)[0]
        formats.save_rpc(p, data[:90])

    ds = MVSDataset(str(root), "test", view_num=3)
    sample = ds[0]
    assert sample["imgs"].shape[0] == 3
    # the fitted inverse must round-trip sub-0.1-px on the image grid
    fitted = ds._load_rpc_full(rpc_paths[0])
    err = rpclib.check_rpc(fitted, 64, 64, xy_samples=10, h_samples=5)
    assert float(err.max()) < 0.1
    # cache: second load returns the identical array (no refit)
    assert ds._load_rpc_full(rpc_paths[0]) is fitted


def test_dataset_pred_mode(synth_root):
    ds = MVSDataset(synth_root, "pred", view_num=3)
    assert len(ds) == 6  # every view takes a turn as reference
    s = ds[0]
    assert "depth_stages" not in s
    assert s["imgs"].shape == (3, 64, 64, 3)


def test_dataset_gt_mask_consistency(synth_root):
    """GT rendered heights must lie inside the RPC height range (mask ≈ 1)."""
    ds = MVSDataset(synth_root, "test", view_num=3)
    s = ds[0]
    assert s["mask_stages"][2].mean() > 0.99


def test_loader_propagates_worker_exceptions():
    """A raising __getitem__ must fail the consuming iteration loudly, not
    silently truncate the epoch (the prefetch worker runs on a thread)."""

    class Exploding:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i >= 2:
                raise RuntimeError("corrupt sample")
            return {
                "imgs": np.zeros((1, 8, 8, 3), np.float32),
                "cams": (np.zeros((1, 4, 4), np.float32),),
                "depth_values": np.zeros(2, np.float32),
                "out_view": "0",
                "out_name": f"s{i}",
            }

    ld = loader.Loader(Exploding(), batch_size=1, prefetch=2)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in ld:
            pass


def test_read_scene_image_tiff_window_and_tone():
    """GeoTIFF-style scene ingestion: uint16 raw radiometry gets the
    reference tone-map pipeline (γ + percentile stretch, data_io.py:181-261);
    windowed reads slice the same pixels; uint8 inputs pass through raw."""
    import tempfile

    from PIL import Image

    rng = np.random.default_rng(3)
    raw = (rng.gamma(2.0, 300.0, size=(64, 96)) + 50).astype(np.uint16)
    with tempfile.TemporaryDirectory() as d:
        tif = f"{d}/scene.tif"
        Image.fromarray(raw).save(tif)
        assert formats.scene_size(tif) == (96, 64)

        full = formats.read_scene_image(tif)
        assert full.shape == (64, 96) and full.dtype == np.float32
        assert 0.0 <= full.min() and full.max() <= 255.0
        assert full.max() > 200  # stretch reaches the top of the range

        win = formats.read_scene_image(tif, x_lu=16, y_lu=8, x_size=32, y_size=24,
                                       tone=False)
        np.testing.assert_allclose(win, raw[8:32, 16:48].astype(np.float32))

        png = f"{d}/scene.png"
        Image.fromarray((raw / 16).astype(np.uint8)).save(png)
        u8 = formats.read_scene_image(png)
        np.testing.assert_allclose(u8, (raw / 16).astype(np.uint8).astype(np.float32))
