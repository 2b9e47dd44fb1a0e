"""Checkpoint-converter parity tests.

Instantiates the *reference implementation's own torch modules* (imported
read-only from /root/reference at test time — skipped when unavailable),
converts their weights with train/convert.py, and asserts numerical agreement
of module outputs.  This validates that users can load the reference's
pretrained checkpoints into this framework.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "modules")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import modules.module as refmod

    torch.manual_seed(0)
    return torch, refmod


def _nchw(x):
    return np.ascontiguousarray(np.moveaxis(np.asarray(x), -1, 1))


def _nhwc(x):
    return np.ascontiguousarray(np.moveaxis(np.asarray(x), 1, -1))


def test_featurenet_conversion(ref_modules):
    torch, refmod = ref_modules
    import jax.numpy as jnp

    from satmvs_tpu.nn.featurenet import FeatureNet
    from satmvs_tpu.train.convert import convert_featurenet

    for arch in ("unet", "fpn"):
        ref = refmod.FeatureNet(base_channels=8, num_stage=3, stride=4, arch_mode=arch).eval()
        sd = {f"feature.{k}": v for k, v in ref.state_dict().items()}
        params, stats = convert_featurenet(sd, "feature", arch, 3)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(_nchw(x)))

        net = FeatureNet(8, 3, arch)
        outs = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
        for i, key in enumerate(["stage1", "stage2", "stage3"]):
            want = ref_out[key].numpy()
            got = _nchw(outs[i])
            np.testing.assert_allclose(got, want, atol=2e-4,
                                       err_msg=f"{arch} {key}")


def test_costregnet_conversion(ref_modules):
    torch, refmod = ref_modules
    import jax.numpy as jnp

    from satmvs_tpu.nn.costreg import CostRegNet
    from satmvs_tpu.train.convert import convert_costreg

    ref = refmod.CostRegNet(in_channels=16, base_channels=8).eval()
    sd = {f"cr.{k}": v for k, v in ref.state_dict().items()}
    params, stats = convert_costreg(sd, "cr")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 16, 16, 16)).astype(np.float32)  # (B,D,H,W,C)
    xt = torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))  # (B,C,D,H,W)
    with torch.no_grad():
        want = ref(xt).numpy()[:, 0]  # (B, D, H, W)

    net = CostRegNet(8)
    got = np.asarray(net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_red_step_conversion(ref_modules):
    torch, refmod = ref_modules
    import jax.numpy as jnp

    from satmvs_tpu.nn.red import REDStep, init_red_states
    from satmvs_tpu.train.convert import convert_red_step

    ref = refmod.slice_RED_Regularization(in_channels=16, base_channels=8).eval()
    sd = {f"r.{k}": v for k, v in ref.state_dict().items()}
    params = convert_red_step(sd, "r")

    rng = np.random.default_rng(2)
    cost = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)  # (B,H,W,C)
    states_np = [rng.normal(size=(1, 16 // s, 16 // s, 8 * s)).astype(np.float32)
                 for s in (1, 2, 4, 8)]

    with torch.no_grad():
        want, *_ = ref(
            torch.from_numpy(_nchw(cost)),
            *[torch.from_numpy(_nchw(s)) for s in states_np],
        )
    step = REDStep(8)
    (_, logits) = step.apply(
        {"params": params}, tuple(jnp.asarray(s) for s in states_np), jnp.asarray(cost)
    )
    np.testing.assert_allclose(np.asarray(logits), want.numpy()[:, 0], atol=2e-4)


def test_full_red_regularizer_conversion(ref_modules):
    """Full-volume scan vs the reference's python loop over depth planes."""
    torch, refmod = ref_modules
    import jax.numpy as jnp

    from satmvs_tpu.nn.red import REDRegularizer
    from satmvs_tpu.train.convert import convert_red_step

    ref = refmod.RED_Regularization(in_channels=16, base_channels=8).eval()
    # reference hardcodes .cuda() for its zero states — run its math manually
    sd = {f"r.{k}": v for k, v in ref.state_dict().items()}
    params = {"ScanREDStep_0": convert_red_step(sd, "r")}

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(1, 4, 16, 16, 16)).astype(np.float32)  # (B,D,H,W,C)

    with torch.no_grad():
        states = [torch.zeros(1, 8 * s, 16 // s, 16 // s) for s in (1, 2, 4, 8)]
        wants = []
        sref = refmod.slice_RED_Regularization(16, 8).eval()
        sref.load_state_dict(ref.state_dict())
        for d in range(4):
            cost = torch.from_numpy(_nchw(vol[:, d]))
            out, *states = sref(cost, *states)
            wants.append(out.numpy()[:, 0])
    want = np.stack(wants, axis=1)  # (B, D, H, W)

    reg = REDRegularizer(8)
    got = np.asarray(reg.apply({"params": params}, jnp.asarray(vol)))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_full_checkpoint_conversion_loads(ref_modules):
    """A complete reference CascadeREDNet state_dict converts into a tree the
    flax model accepts and produces finite outputs."""
    torch, refmod = ref_modules
    sys.path.insert(0, REF)
    import jax
    import jax.numpy as jnp

    # build a reference-shaped state dict without instantiating the full
    # reference network (its forward needs CUDA): compose submodule dicts
    feat = refmod.FeatureNet(base_channels=8, num_stage=3, arch_mode="unet")
    sd = {}
    for k, v in feat.state_dict().items():
        sd[f"module.feature.{k}"] = v
    for i in range(3):
        red = refmod.RED_Regularization(in_channels=[32, 16, 8][i], base_channels=8)
        for k, v in red.state_dict().items():
            sd[f"module.cost_regularization.{i}.{k}"] = v

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.models import CascadeREDNet
    from satmvs_tpu.train.convert import convert_reference_checkpoint
    from satmvs_tpu.train.loop import numeric_batch

    params, stats = convert_reference_checkpoint(sd, model="red")
    batch = numeric_batch(synthetic.make_batch(1, 32, 32, seed=0))
    model = CascadeREDNet(geo_model="rpc", ndepths=(8, 4, 4))

    # structure check vs a fresh init
    ref_vars = model.init(jax.random.PRNGKey(0), batch["imgs"], batch["cams"],
                          batch["depth_values"], train=False)
    conv_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    init_shapes = jax.tree.map(lambda x: np.asarray(x).shape, ref_vars["params"])
    assert conv_shapes == init_shapes

    out = model.apply({"params": params, "batch_stats": stats},
                      batch["imgs"], batch["cams"], batch["depth_values"], train=False)
    assert np.isfinite(np.asarray(out["depth"])).all()
