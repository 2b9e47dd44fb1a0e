"""Pallas kernel tests (interpret mode on CPU; bit-exactness vs the XLA
sampling path, gradient correctness, and coverage accounting)."""

import numpy as np
import jax
import jax.numpy as jnp

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.ops import warp as warplib
from satmvs_tpu.ops.pallas import sweep_gather as sg
from satmvs_tpu.ops.sampling import bilinear_sample


def _smooth_coords(H, W, D):
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    xs = np.stack([jj + 2.1 * d - 5 + 0.01 * ii for d in range(D)]).astype(np.float32)
    ys = np.stack([ii + 0.9 * d - 2 + 0.005 * jj for d in range(D)]).astype(np.float32)
    return jnp.asarray(xs), jnp.asarray(ys)


def test_sweep_gather_matches_xla_bilinear():
    H, W, C, D = 32, 64, 8, 4
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs, ys = _smooth_coords(H, W, D)
    assert int(sg.count_misses(xs, ys, H, W).sum()) == 0
    out = sg.sweep_gather(src, xs, ys, interpret=True)
    ref = jnp.stack([bilinear_sample(src, xs[d], ys[d]) for d in range(D)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sweep_gather_on_rpc_geometry():
    """The production geometry: RPC triplet sweep coords, exactness + zero
    misses at the default stencil."""
    H, W, C, D = 64, 64, 8, 8
    rpcs = synthetic.make_rpc_triplet(256, 256, seed=1)
    cams = warplib.build_rpc_warp_cams(np.stack([rpcs[2], rpcs[0]]), 0, stage_scale=0.25)
    h_min, h_max = rpclib.height_range(rpcs[2])
    depths = jnp.linspace(h_min, h_max, D, dtype=jnp.float32)
    xs, ys = warplib.rpc_sweep_coords(cams, 0, depths, H, W)
    assert int(sg.count_misses(xs, ys, H, W).sum()) == 0
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    out = sg.sweep_gather(src, xs, ys, interpret=True)
    ref = jnp.stack([bilinear_sample(src, xs[d], ys[d]) for d in range(D)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sweep_gather_gradient_matches_xla():
    H, W, C, D = 16, 32, 4, 2
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs, ys = _smooth_coords(H, W, D)

    g_pal = jax.grad(
        lambda s: jnp.sum(jnp.sin(sg.sweep_gather(s, xs, ys, 8, 8, True)))
    )(src)
    g_xla = jax.grad(
        lambda s: jnp.sum(jnp.sin(jax.vmap(lambda x, y: bilinear_sample(s, x, y))(xs, ys)))
    )(src)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla), atol=1e-5)


def test_count_misses_detects_nonsmooth_warp():
    H, W = 16, 32
    rng = np.random.default_rng(2)
    # random-jump coordinate field: definitely not stencil-coverable
    xs = jnp.asarray(rng.uniform(0, W - 1, (1, H, W)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(0, H - 1, (1, H, W)).astype(np.float32))
    assert int(sg.count_misses(xs, ys, H, W, 4, 4).sum()) > 0


def test_sweep_gather_zero_padding_borders():
    """Samples straddling the image border must blend with zeros exactly like
    the XLA path."""
    H, W, C, D = 16, 32, 4, 1
    src = jnp.ones((H, W, C), jnp.float32)
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    xs = jnp.asarray((jj - 10.5)[None].astype(np.float32))  # part outside left
    ys = jnp.asarray(ii[None].astype(np.float32))
    out = sg.sweep_gather(src, xs, ys, interpret=True)
    ref = bilinear_sample(src, xs[0], ys[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=1e-6)


def test_sweep_scatter_is_exact_transpose():
    """The Pallas scatter backward must be the exact adjoint of the gather:
    <g, gather(src)> == <scatter(g), src> for random g/src, and must agree
    with the XLA scatter on covered (zero-miss) geometry — including samples
    straddling the image border."""
    H, W, C, D = 32, 64, 8, 4
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    xs, ys = _smooth_coords(H, W, D)  # includes out-of-image samples (−5 px)
    assert int(sg.count_misses(xs, ys, H, W).sum()) == 0

    dsrc = sg._sweep_scatter_impl(g, xs, ys, H, W, interpret=True)
    ref = sg._bilinear_scatter(g, xs, ys, H, W)
    np.testing.assert_allclose(np.asarray(dsrc), np.asarray(ref), atol=1e-4)

    lhs = float(jnp.vdot(g, sg.sweep_gather(src, xs, ys, interpret=True)))
    rhs = float(jnp.vdot(dsrc, src))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_hcw_layout_matches_nhwc():
    """layout='hcw' (the kernels' native (D,H,C,W) output, round-3 relayout
    saver) must equal the NHWC path transposed — values AND grads, for both
    the gather and the fused variance."""
    from satmvs_tpu.ops.pallas.sweep_variance import sweep_variance

    H, W, C, D, S = 16, 32, 4, 3, 2
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    srcs = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs1, ys1 = _smooth_coords(H, W, D)
    xs = jnp.stack([xs1, xs1 + 0.7])
    ys = jnp.stack([ys1, ys1 - 0.4])

    out_h = sg.sweep_gather(src, xs1, ys1, 8, 8, True, "hcw")
    out_n = sg.sweep_gather(src, xs1, ys1, 8, 8, True)
    np.testing.assert_array_equal(np.asarray(out_h),
                                  np.asarray(jnp.swapaxes(out_n, 2, 3)))
    g_h = jax.grad(lambda s: jnp.sum(
        jnp.sin(sg.sweep_gather(s, xs1, ys1, 8, 8, True, "hcw"))))(src)
    g_n = jax.grad(lambda s: jnp.sum(
        jnp.sin(sg.sweep_gather(s, xs1, ys1, 8, 8, True))))(src)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_n), atol=1e-6)

    v_h = sweep_variance(ref, srcs, xs, ys, 8, 8, True, "hcw")
    v_n = sweep_variance(ref, srcs, xs, ys, 8, 8, True)
    np.testing.assert_allclose(np.asarray(v_h),
                               np.asarray(jnp.swapaxes(v_n, 2, 3)), atol=1e-6)
    gr_h, gs_h = jax.grad(lambda r, s: jnp.sum(jnp.sin(
        sweep_variance(r, s, xs, ys, 8, 8, True, "hcw"))), (0, 1))(ref, srcs)
    gr_n, gs_n = jax.grad(lambda r, s: jnp.sum(jnp.sin(
        sweep_variance(r, s, xs, ys, 8, 8, True))), (0, 1))(ref, srcs)
    np.testing.assert_allclose(np.asarray(gr_h), np.asarray(gr_n), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs_h), np.asarray(gs_n), atol=2e-5)


def test_sweep_variance_gradient_matches_xla():
    """Gradients of the fused variance volume w.r.t. ref and source features
    must match autodiff through the XLA path (bilinear_sample + moments)."""
    from satmvs_tpu.ops.cost_volume import variance_cost_volume
    from satmvs_tpu.ops.pallas.sweep_variance import sweep_variance

    H, W, C, D, S = 16, 32, 4, 3, 2
    rng = np.random.default_rng(4)
    ref = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    srcs = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
    xs1, ys1 = _smooth_coords(H, W, D)
    xs = jnp.stack([xs1, xs1 + 0.7])
    ys = jnp.stack([ys1, ys1 - 0.4])

    def loss_fused(ref, srcs):
        return jnp.sum(jnp.sin(sweep_variance(ref, srcs, xs, ys, 8, 8, True)))

    def loss_xla(ref, srcs):
        warped = [
            jax.vmap(lambda x, y: bilinear_sample(srcs[s], x, y))(xs[s], ys[s])
            for s in range(S)
        ]
        return jnp.sum(jnp.sin(variance_cost_volume(ref, warped)))

    gr_f, gs_f = jax.grad(loss_fused, argnums=(0, 1))(ref, srcs)
    gr_x, gs_x = jax.grad(loss_xla, argnums=(0, 1))(ref, srcs)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_x), atol=2e-4)


def test_red_recur_kernel_matches_xla_scan():
    """Fused per-scale GRU depth recurrence (ops/pallas/red_recur.py) vs
    scanning nn/blocks.ConvGRUCell.recur — same math, one kernel.  The cell
    input conv (x_contrib) now runs in-kernel, so the kernel consumes the
    raw x; covers cin == c and the stage-1 cin > c case."""
    from satmvs_tpu.nn.blocks import ConvGRUCell
    from satmvs_tpu.ops.pallas.red_recur import cell_params_matrices, red_recur

    rng = np.random.default_rng(3)
    for c, cin, d, h, w in ((8, 8, 5, 16, 24), (16, 16, 3, 8, 16),
                            (8, 32, 3, 16, 24)):
        cell = ConvGRUCell(c)
        params = cell.init(
            jax.random.PRNGKey(c),
            jnp.zeros((1, h, w, cin)), jnp.zeros((1, h, w, c)),
        )["params"]
        # random (non-degenerate) GN affine + biases
        params = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(0.1, 0.5, p.shape).astype(np.float32)),
            params,
        )
        x = jnp.asarray(rng.normal(size=(d, h, w, cin)).astype(np.float32))
        xc = cell.apply({"params": params}, x, method=ConvGRUCell.x_contrib)

        hs = jnp.zeros((1, h, w, c))
        want = []
        for i in range(d):
            out, hs = cell.apply(
                {"params": params}, xc[i][None], hs, method=ConvGRUCell.recur
            )
            want.append(np.asarray(out[0]))
        got = red_recur(x, *cell_params_matrices(params), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.stack(want), atol=2e-5,
            err_msg=f"c={c} cin={cin}",
        )


def test_red_recur_gradient_matches_scan():
    """The custom VJP (reverse-scan recompute from the state sequence) must
    match autodiff through a plain lax.scan of the same cell math."""
    from satmvs_tpu.ops.pallas.red_recur import _cell_step, red_recur

    c, cin, d, h, w = 8, 12, 4, 16, 24
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(d, h, w, cin)).astype(np.float32))
    wx = jnp.asarray(rng.normal(0, 0.3, (3, 3, cin, 3 * c)).astype(np.float32))
    wh = jnp.asarray(rng.normal(0, 0.3, (3, 3, c, 2 * c)).astype(np.float32))
    bh = jnp.asarray(rng.normal(0, 0.3, (2 * c,)).astype(np.float32))
    wc = jnp.asarray(rng.normal(0, 0.3, (3, 3, c, c)).astype(np.float32))
    bc = jnp.asarray(rng.normal(0, 0.3, (c,)).astype(np.float32))
    gn = jnp.asarray(rng.normal(0.5, 0.3, (6, c)).astype(np.float32))
    args0 = (x, wx, wh, bh, wc, bc, gn)
    argnums = tuple(range(7))
    names = "x wx wh bh wc bc gn".split()

    def ref_outs(x, wx, wh, bh, wc, bc, gn):
        def step(hst, x_d):
            hn = _cell_step(hst, x_d, wx, wh, bh, wc, bc, gn)
            return hn, hn
        _, outs = jax.lax.scan(step, jnp.zeros((h, w, c)), x)
        return outs

    def loss_ref(*args):
        return jnp.sum(jnp.sin(ref_outs(*args)))

    def loss_fused(*args):
        return jnp.sum(jnp.sin(red_recur(*args, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=argnums)(*args0)
    g_fus = jax.grad(loss_fused, argnums=argnums)(*args0)
    for a, b, name in zip(g_fus, g_ref, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3, err_msg=name
        )

    # the reverse-scan fallback (giant-plane shapes) must agree too
    from satmvs_tpu.ops.pallas import red_recur as rr

    cap = rr._BWD_VMEM_CAP
    try:
        rr._BWD_VMEM_CAP = 0
        rr_stream_cap = rr._STREAM_VMEM_CAP
        rr._STREAM_VMEM_CAP = 0
        g_fb = jax.grad(loss_fused, argnums=argnums)(*args0)
    finally:
        rr._BWD_VMEM_CAP = cap
        rr._STREAM_VMEM_CAP = rr_stream_cap
    for a, b, name in zip(g_fb, g_ref, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
            err_msg=f"fallback {name}",
        )

    # the slab-streamed kernel (stage-3 production planes) must agree too:
    # force its selection by zeroing only the dense cap
    try:
        rr._BWD_VMEM_CAP = 0
        assert rr._stream_vmem_bytes(d, h, w, c, cin) <= rr._STREAM_VMEM_CAP
        g_st = jax.grad(loss_fused, argnums=argnums)(*args0)
    finally:
        rr._BWD_VMEM_CAP = cap
    for a, b, name in zip(g_st, g_ref, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
            err_msg=f"streamed {name}",
        )


def test_sweep_gather_stencil4_exact_and_grad():
    """The narrow 25-tap stencil the training path auto-selects
    (train/loop.resolve_sweep_stencil): forward bit-exactness vs the XLA
    bilinear path and adjoint-exact backward at kv=ks=4 on a geometry that
    passes the stencil-4 coverage gate."""
    H, W, C, D = 32, 64, 8, 4
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    xs = jnp.asarray(np.stack([jj + 1.3 * d - 2 + 0.004 * ii for d in range(D)],
                              dtype=np.float32))
    ys = jnp.asarray(np.stack([ii + 0.7 * d - 1 + 0.002 * jj for d in range(D)],
                              dtype=np.float32))
    assert int(sg.count_misses(xs, ys, H, W, 4, 4).sum()) == 0

    out = sg.sweep_gather(src, xs, ys, 4, 4, True)
    ref = jnp.stack([bilinear_sample(src, xs[d], ys[d]) for d in range(D)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g_pal = jax.grad(
        lambda s: jnp.sum(jnp.sin(sg.sweep_gather(s, xs, ys, 4, 4, True)))
    )(src)
    g_xla = jax.grad(
        lambda s: jnp.sum(jnp.sin(jax.vmap(lambda x, y: bilinear_sample(s, x, y))(xs, ys)))
    )(src)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla), atol=1e-5)


def test_resolve_sweep_stencil_auto():
    """Auto mode: explicit values pass through; non-TPU backends resolve to
    the safe 8."""
    from satmvs_tpu.train.config import Config
    from satmvs_tpu.train.loop import resolve_sweep_stencil

    batch = synthetic.make_batch(batch_size=1, width=128, height=128, seed=0)
    assert resolve_sweep_stencil(Config(sweep_stencil=4), batch) == 4
    assert resolve_sweep_stencil(Config(sweep_stencil=8), batch) == 8
    # CPU test backend: auto falls back to 8 without touching the validator
    assert resolve_sweep_stencil(Config(sweep_stencil=0), batch) == 8


def test_sweep_gather_dual_path_mixed_tiles():
    """Tiles whose taps exceed the fast 25-tap grid take the slow in-kernel
    branch; result must equal the XLA bilinear path on every tile (coverage
    at the compile-time stencil 8 still holds)."""
    H, W, C, D = 32, 64, 8, 3
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    # rows 0-7 drift 6 px across the tile width (slow path); rows 8+ smooth
    drift = np.where(ii < 8, 6.0 * jj / (W - 1), 0.02 * jj / (W - 1))
    xs = np.stack([jj + 1.5 * d - 3 + drift for d in range(D)], dtype=np.float32)
    ys = np.stack([ii + 0.5 * d - 1 + 0.3 * np.where(ii < 8, jj / (W - 1), 0.0)
                   for d in range(D)], dtype=np.float32)
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    assert int(sg.count_misses(xs, ys, H, W, 8, 8).sum()) == 0
    assert int(sg.count_misses(xs, ys, H, W, 4, 4).sum()) > 0  # forces slow tiles

    out = sg.sweep_gather(src, xs, ys, 8, 8, True)
    ref = jnp.stack([bilinear_sample(src, xs[d], ys[d]) for d in range(D)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # scatter transpose stays exact through the same mixed branches
    # (elementwise vs the XLA scatter-add; fp32 summation-order tolerance)
    g = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    dsrc = sg._sweep_scatter_impl(g, xs, ys, H, W, 8, 8, True)
    dref = sg._bilinear_scatter(g, xs, ys, H, W)
    np.testing.assert_allclose(np.asarray(dsrc), np.asarray(dref), atol=2e-5)


def test_tile_bases_matches_in_kernel_placement():
    """tile_bases (the XLA mirror the kernels scalar-prefetch, also consumed
    by count_misses) must equal the in-kernel _TileGeom bases=None placement
    on arbitrary coords — the forward DMA windows and the backward scatter's
    in-kernel derivation must never drift apart."""
    H, W, D = 32, 64, 3
    rng = np.random.default_rng(7)
    # wild coords: in-bounds, out-of-bounds, and far-out-of-image points
    xs = jnp.asarray(rng.uniform(-30, W + 30, size=(D, H, W)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-30, H + 30, size=(D, H, W)).astype(np.float32))
    for kv, ks in ((8, 8), (4, 4)):
        rs, cs128, rc = [np.asarray(v)
                         for v in sg.tile_bases(xs, ys, H, W, kv, ks)]
        n_tiles = H // sg.BLOCK_ROWS
        for d in range(D):
            for t in range(n_tiles):
                r0 = t * sg.BLOCK_ROWS
                geom = sg._TileGeom(
                    xs[d, r0:r0 + sg.BLOCK_ROWS], ys[d, r0:r0 + sg.BLOCK_ROWS],
                    r0, kv=kv, ks=ks, height=H, width=W)
                assert int(geom.row_start) == rs[d, t], (d, t, kv)
                assert int(geom.col_start128) == cs128[d, t], (d, t, kv)
                assert int(geom.rc) == rc[d, t], (d, t, kv)


def test_red_recur_from_state_chaining():
    """Slab-streaming contract: running the recurrence in two slabs with the
    state handed over equals one full-volume run (interpret mode)."""
    from satmvs_tpu.ops.pallas.red_recur import red_recur, red_recur_from

    rng = np.random.default_rng(5)
    D, H, W, C = 8, 16, 16, 8
    x = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    wx = jnp.asarray(rng.normal(size=(3, 3, C, 3 * C)).astype(np.float32) * 0.2)
    wh = jnp.asarray(rng.normal(size=(3, 3, C, 2 * C)).astype(np.float32) * 0.2)
    bh = jnp.asarray(rng.normal(size=(2 * C,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.2)
    bc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    gn = jnp.asarray(rng.normal(size=(6, C)).astype(np.float32) * 0.3 + 0.5)

    full = red_recur(x, wx, wh, bh, wc, bc, gn, interpret=True)
    first = red_recur(x[:3], wx, wh, bh, wc, bc, gn, interpret=True)
    rest = red_recur_from(first[-1], x[3:], wx, wh, bh, wc, bc, gn, interpret=True)
    np.testing.assert_allclose(np.asarray(first), np.asarray(full[:3]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rest), np.asarray(full[3:]),
                               atol=1e-5)


def test_sweep_gather_bf16_transport():
    """out_dtype=bfloat16 (volume transport): the stored volume must be
    EXACTLY the f32 result cast once (f32 tap accumulation in-kernel, one
    cast at the store — never a low-precision accumulation), and the
    backward must accept a bf16 cotangent and return an f32 source
    cotangent matching the upcast-then-scatter oracle."""
    H, W, C, D = 32, 64, 8, 4
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs, ys = _smooth_coords(H, W, D)
    assert int(sg.count_misses(xs, ys, H, W).sum()) == 0

    out16 = sg.sweep_gather(src, xs, ys, 8, 8, True, "nhwc", jnp.bfloat16)
    out32 = sg.sweep_gather(src, xs, ys, 8, 8, True)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out16), np.asarray(out32.astype(jnp.bfloat16))
    )

    # hcw layout too (the training path's native form)
    out16h = sg.sweep_gather(src, xs, ys, 8, 8, True, "hcw", jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out16h), np.asarray(jnp.swapaxes(out16, 2, 3))
    )

    g16 = jnp.asarray(rng.normal(size=(D, H, W, C))).astype(jnp.bfloat16)
    _, pullback = jax.vjp(
        lambda s: sg.sweep_gather(s, xs, ys, 8, 8, True, "nhwc", jnp.bfloat16),
        src,
    )
    (dsrc,) = pullback(g16)
    assert dsrc.dtype == jnp.float32
    ref = sg._bilinear_scatter(g16.astype(jnp.float32), xs, ys, H, W)
    np.testing.assert_allclose(np.asarray(dsrc), np.asarray(ref), atol=1e-4)
