"""TPU check: double-buffered sweep kernels — exactness + timing (scratch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from satmvs_tpu import cache as _cache

_cache.enable()

from satmvs_tpu.data import synthetic
from satmvs_tpu.geo import rpc as rpclib
from satmvs_tpu.ops import warp as warplib
from satmvs_tpu.ops.coarse_coords import rpc_sweep_coords_coarse
from satmvs_tpu.ops.pallas.sweep_gather import count_misses, sweep_gather
from satmvs_tpu.ops.pallas.sweep_variance import sweep_variance
from satmvs_tpu.ops.sampling import bilinear_sample

H, W, C, D, S = 96, 192, 32, 64, 2


def _time_step(step, iters=20):
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


def main():
    rpcs = synthetic.make_rpc_triplet(768, 384, seed=0)
    cams = warplib.build_stage_cams(
        np.stack([rpcs[2], rpcs[0], rpcs[1]]), ref_index=0, num_stage=3)[0]
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    srcs = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
    h_min, h_max = rpclib.height_range(rpcs[2])
    depths = jnp.linspace(h_min, h_max, D, dtype=jnp.float32)
    coords = [rpc_sweep_coords_coarse(cams, s, depths, H, W) for s in range(S)]
    xs = jnp.stack([x for x, _ in coords])
    ys = jnp.stack([y for _, y in coords])
    misses = sum(int(count_misses(xs[s], ys[s], H, W, 4, 4).sum()) for s in range(S))
    stencil = 4 if misses == 0 else 8
    print(f"stencil={stencil} misses={misses}", file=sys.stderr)

    # exactness: gather vs XLA bilinear (bit-exact contract)
    got = jax.jit(lambda: sweep_gather(srcs[0], xs[0], ys[0], stencil, stencil))()
    want = jax.jit(lambda: bilinear_sample(srcs[0], xs[0], ys[0]))()
    derr = float(jnp.max(jnp.abs(got - want)))
    print(f"gather max|err| = {derr:.3e}", file=sys.stderr)
    assert derr == 0.0, "gather not bit-exact"

    # exactness: fused variance vs moments of XLA-warped views
    def ref_var():
        vols = [bilinear_sample(srcs[s], xs[s], ys[s]) for s in range(S)]
        sm = ref[None] + sum(vols)
        sq = (ref * ref)[None] + sum(v * v for v in vols)
        m = sm / (S + 1)
        return sq / (S + 1) - m * m

    gv = jax.jit(lambda: sweep_variance(ref, srcs, xs, ys, stencil, stencil))()
    wv = jax.jit(ref_var)()
    verr = float(jnp.max(jnp.abs(gv - wv)))
    print(f"variance max|err| = {verr:.3e}", file=sys.stderr)
    assert verr < 1e-5, "variance mismatch"

    def sweep_step(c):
        d = depths + c * 1e-9
        cs = [rpc_sweep_coords_coarse(cams, s, d, H, W) for s in range(S)]
        vol = sweep_variance(ref, srcs, jnp.stack([x for x, _ in cs]),
                             jnp.stack([y for _, y in cs]),
                             kv=stencil, ks=stencil)
        return vol.ravel()[0]

    dt = _time_step(sweep_step)
    print(f"fused sweep+variance: {dt*1e3:.2f} ms/sweep ({S/dt:.0f} views/s)",
          file=sys.stderr)

    def gather_step(c):
        out = sweep_gather(srcs[0], xs[0] + c * 1e-12, ys[0], stencil, stencil)
        return out.ravel()[0]

    dtg = _time_step(gather_step)
    print(f"gather alone: {dtg*1e3:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
