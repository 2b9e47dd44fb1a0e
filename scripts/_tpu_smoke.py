import sys, os
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from satmvs_tpu import cache as _cache
_cache.enable()
from satmvs_tpu.nn.red import REDRegularizer

b, d, h, w, c = 1, 8, 64, 128, 8
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
reg = REDRegularizer(c)
variables = reg.init(jax.random.PRNGKey(0), vol)

fused = jax.jit(lambda v: reg.apply(variables, v, True))(vol)
ref = jax.jit(lambda v: reg.apply(variables, v, False))(vol)
print("fwd max err vs scan:", float(jnp.max(jnp.abs(fused - ref))))

def loss(variables, v, fused):
    return jnp.sum(jnp.sin(reg.apply(variables, v, fused)))

gf = jax.jit(jax.grad(lambda vr: loss(vr, vol, True)))(variables)
gs = jax.jit(jax.grad(lambda vr: loss(vr, vol, False)))(variables)
def rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-8))
rels = jax.tree_util.tree_leaves_with_path(jax.tree.map(rel, gf, gs))
for k, v in sorted(rels, key=lambda kv: -kv[1])[:6]:
    print(f"rel {v:.2e}", jax.tree_util.keystr(k))
