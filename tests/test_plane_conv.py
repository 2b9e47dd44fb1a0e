"""Row-packed plane-conv kernels (ops/pallas/plane_conv.py) vs the XLA
blocks they replace — forward + gradient parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satmvs_tpu.nn.blocks import ConvBlock, DeconvBlock
from satmvs_tpu.ops.pallas import plane_conv as pc

D = 3


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def _ref_conv_dn(x, w):
    blk = ConvBlock(w.shape[3], 3, stride=2, norm="none", use_bias=False)
    return blk.apply({"params": {"Conv_0": {"kernel": w}}}, x)


def _ref_deconv_up(x, wt):
    blk = DeconvBlock(wt.shape[2], 3, norm="none", use_bias=False)
    return blk.apply({"params": {"ConvTranspose_0": {"kernel": wt}}}, x)


def _ref_head(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def _dn(x, k, h, w):
    """NHWC wrapper over the split-input conv_dn."""
    xe, xo = pc.split_cols(pc.pack_planes(x))
    return pc.unpack_planes(pc.conv_dn(xe, xo, k, h, w), h // 2, w // 2)


def _up(x, kt, h, w):
    """NHWC wrapper over the split-output deconv_up."""
    ye, yo = pc.deconv_up(pc.pack_planes(x), kt, h, w)
    return pc.unpack_planes(pc.merge_cols(ye, yo), 2 * h, 2 * w)


def test_pack_split_roundtrip():
    x = _rand((D, 16, 24, 8))
    xp = pc.pack_planes(x)
    assert jnp.array_equal(pc.unpack_planes(xp, 16, 24), x)
    assert jnp.array_equal(pc.merge_cols(*pc.split_cols(xp)), xp)


@pytest.mark.parametrize("h,w,cin,cout", [(16, 24, 8, 16), (32, 16, 16, 32)])
def test_conv_dn_forward(h, w, cin, cout):
    x = _rand((D, h, w, cin))
    k = _rand((3, 3, cin, cout), 1) * 0.2
    np.testing.assert_allclose(
        _dn(x, k, h, w), _ref_conv_dn(x, k), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("h,w,cin,cout", [(8, 12, 16, 8), (16, 8, 32, 16)])
def test_deconv_up_forward(h, w, cin, cout):
    x = _rand((D, h, w, cin))
    kt = _rand((3, 3, cout, cin), 2) * 0.2
    np.testing.assert_allclose(
        _up(x, kt, h, w), _ref_deconv_up(x, kt), atol=1e-5, rtol=1e-5
    )


def test_conv_head_forward():
    h, w, cin = 16, 24, 8
    x = _rand((D, h, w, cin))
    k = _rand((3, 3, cin, 1), 3) * 0.2
    b = _rand((1,), 4)
    out = pc.unpack_planes(
        pc.conv_head(pc.pack_planes(x), k, b, h, w), h, w
    )
    np.testing.assert_allclose(out, _ref_head(x, k, b), atol=1e-5, rtol=1e-5)


def test_conv_dn_grad():
    h, w, cin, cout = 16, 24, 8, 16
    x = _rand((D, h, w, cin))
    k = _rand((3, 3, cin, cout), 1) * 0.2
    g = _rand((D, h // 2, w // 2, cout), 5)

    def loss_k(x, k):
        return jnp.sum(_dn(x, k, h, w) * g)

    def loss_ref(x, k):
        return jnp.sum(_ref_conv_dn(x, k) * g)

    gx, gk = jax.grad(loss_k, (0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, (0, 1))(x, k)
    np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gk, rk, atol=1e-4, rtol=1e-4)


def test_deconv_up_grad():
    h, w, cin, cout = 8, 12, 16, 8
    x = _rand((D, h, w, cin))
    kt = _rand((3, 3, cout, cin), 2) * 0.2
    g = _rand((D, 2 * h, 2 * w, cout), 6)

    def loss_k(x, kt):
        return jnp.sum(_up(x, kt, h, w) * g)

    def loss_ref(x, kt):
        return jnp.sum(_ref_deconv_up(x, kt) * g)

    gx, gk = jax.grad(loss_k, (0, 1))(x, kt)
    rx, rk = jax.grad(loss_ref, (0, 1))(x, kt)
    np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gk, rk, atol=1e-4, rtol=1e-4)


def test_conv_head_grad():
    h, w, cin = 16, 24, 8
    x = _rand((D, h, w, cin))
    k = _rand((3, 3, cin, 1), 3) * 0.2
    b = _rand((1,), 4)
    g = _rand((D, h, w, 1), 7)

    def loss_k(x, k, b):
        y = pc.unpack_planes(
            pc.conv_head(pc.pack_planes(x), k, b, h, w), h, w
        )
        return jnp.sum(y * g)

    def loss_ref(x, k, b):
        return jnp.sum(_ref_head(x, k, b) * g)

    gx, gk, gb = jax.grad(loss_k, (0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(loss_ref, (0, 1, 2))(x, k, b)
    np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gk, rk, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gb, rb, atol=1e-4, rtol=1e-4)


def test_packed_pipeline_feasibility_gate():
    """Geometry/VMEM gate (ADVICE r2): wide tiles whose phase packs go odd
    (e.g. W=2048 ⇒ row-pack 1) and huge tiles that blow VMEM must report
    infeasible; the production patch geometry must stay feasible."""
    from satmvs_tpu.nn.red import packed_pipeline_feasible

    # production stages: 1 = (96,192,cin=32), 3 = (384,768,cin=8)
    assert packed_pipeline_feasible(96, 192, 32, 8, train=True)
    assert packed_pipeline_feasible(384, 768, 8, 8, train=True)
    # W=2048: _pack_rows(h, 2048) == 1 (odd) -> no phase deconv
    assert not packed_pipeline_feasible(16, 2048, 8, 8)
    # 512x1024 tile: the scale-1 red_recur flat pads + scratch exceed VMEM
    assert not packed_pipeline_feasible(512, 1024, 8, 8)


def test_red_regularizer_fused_falls_back_on_wide_tiles():
    """REDRegularizer(fused=True) at an infeasible geometry must not crash
    (the old behavior: trace-time assert in _phase_deconv) — it silently
    takes the scan path and matches it."""
    from satmvs_tpu.nn.red import REDRegularizer

    b, d, h, w, c = 1, 2, 16, 2048, 8
    vol = _rand((b, d, h, w, c), 11) * 0.1
    reg = REDRegularizer(c)
    variables = reg.init(jax.random.PRNGKey(0), vol)
    ref = reg.apply(variables, vol, False)
    fused = reg.apply(variables, vol, True)  # gate -> scan fallback
    np.testing.assert_allclose(fused, ref, atol=0, rtol=0)


def test_red_regularizer_hcw_layout_matches_nhwc():
    """layout='hcw' ((B,D,H,C,W) volumes straight from the sweep kernels)
    must produce identical logits and grads to the NHWC path."""
    from satmvs_tpu.nn.red import REDRegularizer

    b, d, h, w, c = 1, 3, 16, 24, 8
    vol = _rand((b, d, h, w, c), 12)
    vol_hcw = jnp.swapaxes(vol, 3, 4)
    reg = REDRegularizer(c)
    variables = reg.init(jax.random.PRNGKey(0), vol)

    out_n = reg.apply(variables, vol, True)
    out_h = reg.apply(variables, vol_hcw, True, layout="hcw")
    np.testing.assert_allclose(out_h, out_n, atol=1e-6, rtol=1e-6)

    gn_ = jax.grad(lambda v, x: jnp.sum(jnp.sin(reg.apply(v, x, True))))(
        variables, vol)
    gh_ = jax.grad(lambda v, x: jnp.sum(jnp.sin(
        reg.apply(v, x, True, layout="hcw"))))(variables, vol_hcw)
    for a, bb in zip(jax.tree_util.tree_leaves(gn_), jax.tree_util.tree_leaves(gh_)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)

    # scan fallback accepts hcw too (transposes once)
    out_s = reg.apply(variables, vol_hcw, False, layout="hcw")
    ref_s = reg.apply(variables, vol, False)
    np.testing.assert_allclose(out_s, ref_s, atol=0, rtol=0)


def test_red_regularizer_fused_pipeline_matches_scan():
    """The full row-packed pipeline (pack -> conv_dn x3 -> red_recur_packed x4
    -> deconv_up x3 -> conv_head) == the XLA scan path, values AND grads."""
    from satmvs_tpu.nn.red import REDRegularizer

    b, d, h, w, c = 1, 4, 16, 24, 8
    vol = _rand((b, d, h, w, c), 10)
    reg = REDRegularizer(c)
    variables = reg.init(jax.random.PRNGKey(0), vol)

    ref = reg.apply(variables, vol, False)

    def loss_fused(variables, vol):
        return jnp.sum(jnp.sin(reg.apply(variables, vol, True)))

    def loss_scan(variables, vol):
        return jnp.sum(jnp.sin(reg.apply(variables, vol, False)))

    fused = reg.apply(variables, vol, True)
    np.testing.assert_allclose(fused, ref, atol=2e-4, rtol=1e-4)

    gf_v, gf_x = jax.grad(loss_fused, (0, 1))(variables, vol)
    gr_v, gr_x = jax.grad(loss_scan, (0, 1))(variables, vol)
    np.testing.assert_allclose(gf_x, gr_x, atol=2e-3, rtol=2e-3)
    flat_r = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gr_v)
    )
    for k, v in jax.tree_util.tree_leaves_with_path(gf_v):
        np.testing.assert_allclose(
            v, flat_r[jax.tree_util.keystr(k)], atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(k),
        )
