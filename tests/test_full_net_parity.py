"""Full-network forward parity against the reference implementation.

Runs the *whole* reference networks (CascadeREDNet /root/reference/networks/
casred.py:114, CascadeMVSNet casmvs.py:127, UCSNet ucs.py:102) on CPU with
identical inputs, converts their state dicts with train/convert.py, and
asserts the per-stage + final depth maps of our cascade agree — the
end-to-end proof that a user can load a reference checkpoint into this
framework and get the reference's answers.

The reference hardcodes `.cuda()` on its scratch tensors (casred.py:34,
176-189); those calls are identity-patched so the nets run on CPU.  Our
model runs in `torch_compat=True` mode, which reproduces the reference's
grid_sample(align_corners=False) sampling stretch and its full-res-then-
trilinear-downsample hypothesis chain; remaining differences are fp32-vs-
fp64 RPC math (< 0.01 px) and conv summation order.

The randomly initialized logit heads are sharpened (x40) before loading into
BOTH frameworks so the softmax is informative — near-uniform probabilities
would make depth parity trivially easy.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")), reason="reference not mounted"
)

H = W = 64
NDEPTHS = (8, 8, 8)  # CostRegNet needs D divisible by 8 at every stage


@pytest.fixture(scope="module")
def ref_env():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.manual_seed(0)
    yield torch
    torch.Tensor.cuda = orig


@pytest.fixture(scope="module")
def rpc_inputs():
    """One synthetic 3-view scene in both frameworks' input layouts."""
    from satmvs_tpu.data import synthetic
    from satmvs_tpu.geo import rpc as rpclib
    from satmvs_tpu.ops import warp as warplib

    scene = synthetic.make_scene(W, H, seed=11, h_amp=80.0)
    order = [2, 0, 1]  # nadir reference first
    rpcs = scene["rpcs"][order]  # (3, 170) float64
    imgs = scene["images"][order]
    imgs = (imgs - imgs.mean(axis=(1, 2), keepdims=True)) / (
        imgs.std(axis=(1, 2), keepdims=True) + 1e-8
    )
    imgs = np.repeat(imgs[..., None], 3, axis=-1).astype(np.float32)  # (V,H,W,3)
    dvals = np.asarray(scene["h_range"], np.float32)[None]  # (1, 2)

    # ours: per-stage camera bundles, coarsest first
    cams = tuple(
        warplib.stack_cams([c])
        for c in warplib.build_stage_cams(rpcs, ref_index=0, num_stage=3)
    )
    # reference: stage dict of divided 170-vectors (satmvsdataset.py:83-99;
    # dict key "stage1" holds the ÷4 RPC)
    rpc_ms = {}
    for key, scale in (("stage1", 0.25), ("stage2", 0.5), ("stage3", 1.0)):
        rpc_ms[key] = np.stack(
            [rpclib.scale_rpc(r.copy(), scale) for r in rpcs]
        )[None]  # (1, V, 170) float64
    return {
        "imgs_ours": imgs[None],
        "cams_ours": cams,
        "rpc_ms": rpc_ms,
        "depth_values": dvals,
    }


@pytest.fixture(scope="module")
def pinhole_inputs():
    from satmvs_tpu.geo import pinhole as pinlib

    rng = np.random.default_rng(7)
    k = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    projs = []
    for tx in (0.0, 3.0, -3.0):
        e = np.eye(4)
        e[0, 3] = tx
        projs.append(pinlib.compose_proj_matrix(k, e))
    projs = np.stack(projs)  # (V, 4, 4)
    stage_projs = tuple(
        np.asarray(pinlib.scale_proj_matrix(projs, s), np.float32)[None]
        for s in (0.25, 0.5, 1.0)
    )
    proj_ms = {
        "stage1": pinlib.scale_proj_matrix(projs, 0.25)[None],
        "stage2": pinlib.scale_proj_matrix(projs, 0.5)[None],
        "stage3": projs[None],
    }
    imgs = rng.normal(size=(1, 3, H, W, 3)).astype(np.float32)
    # smooth the images a bit so bilinear sampling differences stay benign
    for _ in range(2):
        imgs = 0.5 * imgs + 0.25 * (np.roll(imgs, 1, 2) + np.roll(imgs, -1, 2))
    dvals = np.asarray([[30.0, 60.0]], np.float32)
    return {
        "imgs_ours": imgs,
        "cams_ours": stage_projs,
        "proj_ms": proj_ms,
        "depth_values": dvals,
    }


def _sharpen_head(sd, factor=40.0):
    """Scale the logit-head weights so softmax probabilities are peaked."""
    out = {}
    for key, val in sd.items():
        if ("upconv2d" in key or ".prob." in key) and key.endswith(("weight", "bias")):
            val = val * factor
        out[key] = val
    return out


def _build_ref_net(torch, name, geo_model):
    import networks.casmvs as casmvs
    import networks.casred as casred
    import networks.ucs as ucs

    if name == "red":
        net = casred.CascadeREDNet(
            geo_model=geo_model, ndepths=list(NDEPTHS), depth_interals_ratio=[4, 2, 1]
        )
    elif name == "casmvs":
        net = casmvs.CascadeMVSNet(
            geo_model=geo_model, ndepths=list(NDEPTHS), depth_interals_ratio=[4, 2, 1]
        )
    else:
        net = ucs.UCSNet(geo_model=geo_model, stage_configs=list(NDEPTHS))
    net = net.eval()
    sd = _sharpen_head({k: v.clone() for k, v in net.state_dict().items()})
    net.load_state_dict(sd)
    return net, sd


def _run_ref(torch, net, inputs, geo_model):
    imgs_t = torch.from_numpy(
        np.ascontiguousarray(inputs["imgs_ours"].transpose(0, 1, 4, 2, 3))
    )
    if geo_model == "rpc":
        cams_t = {k: torch.from_numpy(v) for k, v in inputs["rpc_ms"].items()}
    else:
        cams_t = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in inputs["proj_ms"].items()
        }
    dvals_t = torch.from_numpy(inputs["depth_values"])
    with torch.no_grad():
        return net(imgs_t, cams_t, dvals_t)


def _run_ours(name, geo_model, sd, inputs):
    import jax
    import jax.numpy as jnp

    from satmvs_tpu.models import build_model
    from satmvs_tpu.train.convert import convert_reference_checkpoint

    params, stats = convert_reference_checkpoint(sd, model=name)
    model = build_model(name, geo_model, ndepths=NDEPTHS, torch_compat=True)
    variables = {"params": params}
    if jax.tree_util.tree_leaves(stats):
        variables["batch_stats"] = stats
    return model.apply(
        variables,
        jnp.asarray(inputs["imgs_ours"]),
        inputs["cams_ours"],
        jnp.asarray(inputs["depth_values"]),
        train=False,
    )


INTERVALS = {1: 10.0, 2: 5.0, 3: 2.5}  # ratio x min_interval per stage


@pytest.mark.parametrize("name", ["red", "casmvs", "ucs"])
@pytest.mark.parametrize("geo_model", ["rpc", "pinhole"])
def test_full_network_parity(ref_env, rpc_inputs, pinhole_inputs, name, geo_model):
    torch = ref_env
    inputs = rpc_inputs if geo_model == "rpc" else pinhole_inputs
    net, sd = _build_ref_net(torch, name, geo_model)
    want = _run_ref(torch, net, inputs, geo_model)
    got = _run_ours(name, geo_model, sd, inputs)

    scale = 10.0 if geo_model == "pinhole" else 1.0  # pinhole range is ~10x tighter
    for stage in (1, 2, 3):
        w_depth = want[f"stage{stage}"]["depth"].numpy()
        g_depth = np.asarray(got[f"stage{stage}"]["depth"])
        assert g_depth.shape == w_depth.shape
        tol = 0.25 * INTERVALS[stage] / scale  # quarter of the stage interval
        err = np.abs(g_depth - w_depth)
        assert err.max() < tol, (
            f"{name}/{geo_model} stage{stage}: max depth dev {err.max():.4f} m "
            f"(tol {tol} m, interval {INTERVALS[stage] / scale} m)"
        )

        w_conf = want[f"stage{stage}"]["photometric_confidence"].numpy()
        g_conf = np.asarray(got[f"stage{stage}"]["photometric_confidence"])
        np.testing.assert_allclose(g_conf, w_conf, atol=0.05,
                                   err_msg=f"{name}/{geo_model} stage{stage} conf")

    if name == "ucs":
        w_var = want["stage2"]["variance"].numpy()
        g_var = np.asarray(got["stage2"]["variance"])
        np.testing.assert_allclose(g_var, w_var, atol=0.5 / scale,
                                   err_msg="ucs variance")
