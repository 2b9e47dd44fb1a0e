"""Remat option: gradients unchanged, training still works."""

import numpy as np
import jax
import jax.numpy as jnp

from satmvs_tpu.data import synthetic
from satmvs_tpu.models import CascadeMVSNet, cascade_loss
from satmvs_tpu.train.loop import numeric_batch


def test_remat_gradients_match():
    batch = numeric_batch(synthetic.make_batch(batch_size=1, width=32, height=32))
    gt = [jnp.asarray(batch["depth_stages"][i]) for i in range(3)]
    masks = [jnp.ones_like(g) for g in gt]

    def grads_for(remat):
        model = CascadeMVSNet(geo_model="rpc", ndepths=(8, 8, 8), remat=remat)
        variables = model.init(
            jax.random.PRNGKey(0), batch["imgs"], batch["cams"],
            batch["depth_values"], train=False,
        )

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["imgs"], batch["cams"], batch["depth_values"],
                train=True, mutable=["batch_stats"],
            )
            return cascade_loss(out, gt, masks)[0]

        return variables, jax.grad(loss_fn)(variables["params"])

    v0, g0 = grads_for(False)
    v1, g1 = grads_for(True)
    # same init (same rng) → same params; remat must not change gradients
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        g0, g1,
    )
    del chex_equal
