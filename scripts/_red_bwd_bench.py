"""Microbench: red_recur fwd/bwd per-scale timings (scratch, not shipped).

Times the fused RED recurrence forward and its VJP backward at each
(D, H, W, C) scale of the 384x768 production cascade, flagging which scales
take the Pallas backward vs the XLA reverse-scan fallback.  Uses the
data-chained fori_loop timing pattern (host loops mis-measure through the
remote-TPU tunnel — see bench.py _time_fn).
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

from satmvs_tpu.ops.pallas.red_recur import red_recur, _bwd_vmem_bytes, _BWD_VMEM_CAP


def _time_step(step, iters=8):
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
    rng = np.random.default_rng(0)
    cases = [
        ("s1/sc0", 64, 96, 192, 8),
        ("s1/sc1", 64, 48, 96, 16),
        ("s2/sc0", 32, 192, 384, 8),
        ("s2/sc1", 32, 96, 192, 16),
        ("s3/sc0", 8, 384, 768, 8),
        ("s3/sc1", 8, 192, 384, 16),
        ("s3/sc2", 8, 96, 192, 32),
    ]
    for name, d, h, w, c in cases:
        x = jnp.asarray(rng.normal(size=(d, h, w, c)).astype(np.float32) * 0.1)
        wx = jnp.asarray(rng.normal(size=(3, 3, c, 3 * c)).astype(np.float32) * 0.1)
        wh = jnp.asarray(rng.normal(size=(3, 3, c, 2 * c)).astype(np.float32) * 0.1)
        bh = jnp.zeros((2 * c,), jnp.float32)
        wc = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.1)
        bc = jnp.zeros((c,), jnp.float32)
        gn = jnp.asarray(np.stack([np.ones(c), np.zeros(c)] * 3).astype(np.float32))
        vm = _bwd_vmem_bytes(d, h, w, c, c) / 1e6
        fb = "FALLBACK" if _bwd_vmem_bytes(d, h, w, c, c) > _BWD_VMEM_CAP else "pallas"

        def fwd_step(cc):
            out = red_recur(x + cc * 1e-12, wx, wh, bh, wc, bc, gn)
            return out.ravel()[0]

        tf = _time_step(fwd_step)

        def loss(x_, wh_):
            return jnp.sum(red_recur(x_, wx, wh_, bh, wc, bc, gn) ** 2)

        gradfn = jax.grad(loss, argnums=(0, 1))

        def bwd_step(cc):
            dx, dwh = gradfn(x + cc * 1e-12, wh)
            return dx.ravel()[0] + dwh.ravel()[0]

        tg = _time_step(bwd_step)
        print(
            f"{name}: D={d} {h}x{w} C={c}  vmem={vm:6.1f}MB [{fb:8s}]  "
            f"fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms   "
            f"bwd-only {(tg-tf)*1e3:7.2f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
