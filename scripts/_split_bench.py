import sys, os
sys.path.insert(0, "/root/repo")
variant = sys.argv[1] if len(sys.argv) > 1 else None
if variant is None:
    # driver: run each variant in its own subprocess with a timeout
    import subprocess
    for v in ["strided", "reshape_idx", "tr_slice", "merge_stack", "merge_rt"]:
        try:
            r = subprocess.run([sys.executable, __file__, v], timeout=420,
                               capture_output=True, text=True)
            out = [l for l in r.stdout.splitlines() if l.startswith("RES")]
            print(out[-1] if out else f"RES {v}: no output (rc={r.returncode})")
        except subprocess.TimeoutExpired:
            print(f"RES {v}: TIMEOUT (compile hang)")
        sys.stdout.flush()
    sys.exit(0)

import jax, jax.numpy as jnp, numpy as np
from satmvs_tpu import cache as _cache
_cache.enable()
import bench

D, P, C, RW = 8, 192, 8, 1536
x = jnp.asarray(np.random.default_rng(0).normal(size=(D, P, C, RW)).astype(np.float32))
H = RW // 2

fns = {
    "strided": lambda x: x[..., 0::2] + x[..., 1::2],
    "reshape_idx": lambda x: (lambda v: v[..., 0] + v[..., 1])(x.reshape(D, P, C, H, 2)),
    "tr_slice": lambda x: (lambda v: v[..., 0, :] + v[..., 1, :])(
        x.reshape(D, P, C, H, 2).transpose(0, 1, 2, 4, 3)),
    "merge_stack": lambda x: jnp.stack([x[..., :H], x[..., H:]], -1).reshape(D, P, C, RW),
    "merge_rt": lambda x: x.reshape(D, P, C, 2, H).transpose(0, 1, 2, 4, 3).reshape(D, P, C, RW),
}
fn = fns[variant]
dt = bench._time_fn(lambda c: fn(x + c * 0).ravel()[0] + c * 0, iters=20)
mb = x.size * 4 / 1e6
print(f"RES {variant:14s} {dt*1e6:8.1f} us  ({2*mb/(dt*1e3):5.0f} GB/s eff)")
