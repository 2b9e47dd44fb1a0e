"""Microbench: RED hoisted-conv formulations (scratch, not shipped).

The train-step cost map (NOTES.md) attributes ~77 ms/step to XLA convs,
dominated by the RED encoder/decoder/head convs at stage 3: NHWC with C=8
puts 8 channels into 128 lanes (~6% lane utilization).  Candidate fix:
fold the D-plane batch into the channel dim and run ONE grouped conv
(feature_group_count=D, weights tiled per group) so lanes hold D*C channels.

Times fwd and fwd+bwd for both formulations at the production cascade
shapes, INCLUDING the (D,H,W,C)->(H,W,D*C) layout transpose the grouped
form needs.  Data-chained fori_loop timing (see bench.py _time_fn).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from satmvs_tpu import cache as _cache

_cache.enable()


def _time_step(step, iters=16):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c0)

    jax.block_until_ready(run(jnp.float32(0)))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        out = run(jnp.float32(1 + rep))
        jax.block_until_ready(out)
        _ = float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv_plane_batch(x, w, stride):
    # x: (D, H, W, C); w: (3, 3, C, K)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_grouped(xg, w, stride, d):
    # xg: (1, H, W, D*C); w: (3, 3, C, K) tiled to (3, 3, C, D*K)
    wt = jnp.tile(w, (1, 1, 1, d))
    return jax.lax.conv_general_dilated(
        xg, wt, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=d,
    )


def deconv_plane_batch(x, w):
    # stride-2 transposed conv, torch pad k//2, out_pad 1 -> lhs_dilation form
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def deconv_grouped(xg, w, d):
    wt = jnp.tile(w, (1, 1, 1, d))
    return jax.lax.conv_general_dilated(
        xg, wt, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=d,
    )


def main():
    rng = np.random.default_rng(0)
    # (name, D, H, W, Cin, Cout, stride, kind)
    cases = [
        ("s3/enc1", 8, 384, 768, 8, 16, 2, "conv"),
        ("s3/up1 ", 8, 192, 384, 16, 8, 2, "deconv"),
        ("s3/head", 8, 384, 768, 8, 1, 1, "conv"),
        ("s2/enc1", 32, 192, 384, 16, 16, 2, "conv"),
        ("s2/up1 ", 32, 96, 192, 16, 8, 2, "deconv"),
        ("s1/enc1", 64, 96, 192, 32, 16, 2, "conv"),
    ]
    only = sys.argv[1:] or None
    for name, d, h, w_, cin, cout, stride, kind in cases:
        if only and not any(o in name for o in only):
            continue
        x = jnp.asarray(rng.normal(size=(d, h, w_, cin)).astype(np.float32))
        wk = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)

        if kind == "conv":
            base = lambda xx: conv_plane_batch(xx, wk, stride)
            grp_core = lambda xg: conv_grouped(xg, wk, stride, d)
        else:
            base = lambda xx: deconv_plane_batch(xx, wk)
            grp_core = lambda xg: deconv_grouped(xg, wk, d)

        def grp(xx):
            # include the layout change (D,H,W,C) -> (1,H,W,D*C) and back
            xg = jnp.transpose(xx, (1, 2, 0, 3)).reshape(1, h, w_, d * cin)
            o = grp_core(xg)
            oh, ow = o.shape[1], o.shape[2]
            return jnp.transpose(
                o.reshape(oh, ow, d, cout), (2, 0, 1, 3))

        # correctness
        ob = base(x)
        og = grp(x)
        err = float(jnp.max(jnp.abs(ob - og)))
        scale = float(jnp.max(jnp.abs(ob))) + 1e-9

        def mk_fwd(fn):
            def step(c):
                return fn(x + c * 1e-12).ravel()[0]
            return step

        tb_f = _time_step(mk_fwd(base))
        tg_f = _time_step(mk_fwd(grp))

        # bwd wrt x AND w (the training case)
        def base_loss(xx, ww):
            y = (conv_plane_batch(xx, ww, stride) if kind == "conv"
                 else deconv_plane_batch(xx, ww))
            return jnp.sum(y ** 2) * 1e-9

        def grp_loss(xx, ww):
            xg = jnp.transpose(xx, (1, 2, 0, 3)).reshape(1, h, w_, d * cin)
            y = (conv_grouped(xg, ww, stride, d) if kind == "conv"
                 else deconv_grouped(xg, ww, d))
            return jnp.sum(y ** 2) * 1e-9

        gb = jax.grad(base_loss, argnums=(0, 1))
        gg = jax.grad(grp_loss, argnums=(0, 1))

        def base_bwd(c):
            dx, dw = gb(x + c * 1e-12, wk)
            return dx.ravel()[0] + dw.ravel()[0]

        def grp_bwd(c):
            dx, dw = gg(x + c * 1e-12, wk)
            return dx.ravel()[0] + dw.ravel()[0]

        tb_b = _time_step(base_bwd)
        tg_b = _time_step(grp_bwd)

        print(
            f"{name} D={d:3d} {h}x{w_} {cin}->{cout}  rel-err {err/scale:.1e}  "
            f"fwd {tb_f*1e3:6.2f} -> {tg_f*1e3:6.2f} ms   "
            f"fwd+bwd {tb_b*1e3:6.2f} -> {tg_b*1e3:6.2f} ms",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
