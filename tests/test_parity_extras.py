"""Parity extras: QC-form warp equivalence, skew-removal resample,
RPC→pinhole fitting pipeline."""

import numpy as np
import jax.numpy as jnp

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import pinhole, rpc as rpclib
from satmvs_tpu.ops import warp as warplib


def test_qc_sweep_matches_basis_sweep():
    """The QC-tensor formulation must agree with the 20-term basis path
    (they are the same polynomials; ref modules/warping.py:47-178)."""
    rpcs = synthetic.make_rpc_triplet(96, 96, seed=6)
    pair = np.stack([rpcs[2], rpcs[0]])
    cams = warplib.build_rpc_warp_cams(pair, 0)
    qc = warplib.build_qc_warp_cams(pair, 0)
    h0 = rpcs[2][rpclib.HEI_OFF]
    depths = jnp.asarray([h0 - 100, h0, h0 + 150], jnp.float32)
    x1, y1 = warplib.rpc_sweep_coords(cams, 0, depths, 96, 96)
    x2, y2 = warplib.rpc_sweep_coords_qc(qc, 0, depths, 96, 96)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-2)


def test_remap_skew():
    k = np.array([[500.0, 25.0, 64.0], [0.0, 500.0, 64.0], [0.0, 0.0, 1.0]])
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (128, 128)).astype(np.float32)
    out, k_ns = pinhole.remap_skew(img, k)
    assert k_ns[0, 1] == 0.0
    assert out.shape == img.shape
    # a point projected by K maps to the same object ray as K_ns in the
    # corrected image: check center pixel consistency (skew-free at cx, cy)
    assert abs(float(out[64, 64]) - float(img[64, 64])) < 30.0
    # with zero skew the resample is identity
    k0 = k.copy()
    k0[0, 1] = 0.0
    out0, _ = pinhole.remap_skew(img, k0)
    np.testing.assert_allclose(out0, img, atol=1e-3)


def test_fit_pinhole_from_rpc():
    """The open_dataset_pinhole generation path: a pinhole camera fitted from
    an RPC must reproject the control grid with small pixel error
    (WHU_TLC/readme.md:84-110)."""
    rpc = synthetic.make_synthetic_rpc(128, 128, off_nadir_deg=22.0, seed=8)
    k, r, t, proj_err, inv_err = pinhole.fit_pinhole_from_rpc(rpc, 128, 128)
    assert np.median(proj_err) < 1.0, np.median(proj_err)
    assert k[0, 0] > 0 and k[1, 1] > 0
    assert abs(np.linalg.det(r) - 1) < 1e-6


def test_qc_model_forward_matches_basis(synth_like_scene=None):
    """Full-model forward with QC-form cams (the --use_qc path) must agree
    with the 20-term basis cams — same polynomials, different packing
    (ref satmvsdataset.py:166-294 + warping.py:139-178)."""
    import jax

    from satmvs_tpu.models import CascadeREDNet

    scene = synthetic.make_scene(64, 64, seed=4, h_amp=60.0)
    order = [2, 0, 1]
    rpcs = scene["rpcs"][order]
    imgs = scene["images"][order]
    imgs = (imgs - imgs.mean(axis=(1, 2), keepdims=True)) / (
        imgs.std(axis=(1, 2), keepdims=True) + 1e-8
    )
    imgs = jnp.asarray(np.repeat(imgs[..., None], 3, axis=-1)[None], jnp.float32)
    dvals = jnp.asarray(scene["h_range"], jnp.float32)[None]

    cams_basis = tuple(
        warplib.stack_cams([c]) for c in warplib.build_stage_cams(rpcs, 0, 3)
    )
    cams_qc = tuple(
        warplib.stack_cams([c]) for c in warplib.build_qc_stage_cams(rpcs, 0, 3)
    )

    model = CascadeREDNet(geo_model="rpc", ndepths=(8, 4, 4))
    variables = model.init(jax.random.PRNGKey(0), imgs, cams_basis, dvals, train=False)
    out_b = model.apply(variables, imgs, cams_basis, dvals, train=False)
    out_q = model.apply(variables, imgs, cams_qc, dvals, train=False)
    for s in (1, 2, 3):
        db = np.asarray(out_b[f"stage{s}"]["depth"])
        dq = np.asarray(out_q[f"stage{s}"]["depth"])
        # same math, fp32 packing differences only — sub-decimeter agreement
        assert np.abs(db - dq).max() < 0.3, (s, np.abs(db - dq).max())


def test_dataset_use_qc_and_crop(tmp_path):
    """use_qc=True emits QcWarpCams; odd-size images are center-cropped to
    x32 with RPC offsets shifted (GT window matches the reference view)."""
    from satmvs_tpu.data import preprocess, synthetic as synth
    from satmvs_tpu.data.dataset import MVSDataset
    from satmvs_tpu.data.loader import Loader
    from satmvs_tpu.geo import rpc as rpclib2

    root = str(tmp_path / "odd")
    synth.write_synthetic_dataset(root, num_scenes=1, width=90, height=70,
                                  h_amp=40.0, h_scale=120.0)
    ds = MVSDataset(root, "test", view_num=3, use_qc=True)
    s = ds[0]
    assert s["imgs"].shape == (3, 64, 64, 3)
    assert s["depth_stages"][2].shape == (64, 64)
    assert isinstance(s["cams"][0], warplib.QcWarpCams)

    # camera shift: the full-res ref cam's samp/line offsets moved by the
    # crop start computed by crop_to_multiple
    sh, sw, nh, nw = preprocess.crop_to_multiple(np.zeros((70, 90)), 0, 0)
    from satmvs_tpu.data import formats

    rpc_ref = formats.load_rpc(f"{root}/rpc/2/scene0000.rpc")[0]
    full_cams = s["cams"][2]
    assert abs(float(full_cams.ref_norm[0, 0]) - (rpc_ref[rpclib2.SAMP_OFF] - sw)) < 1e-5
    assert abs(float(full_cams.ref_norm[1, 0]) - (rpc_ref[rpclib2.LINE_OFF] - sh)) < 1e-5

    # collate stacks QC cam pytrees
    b = next(iter(Loader(ds, batch_size=1, prefetch=0)))
    assert b["cams"][0].src_fwd_qc.shape == (1, 2, 4, 4, 4, 4)
