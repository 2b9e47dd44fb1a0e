"""Distribution tests on the 8-device virtual CPU mesh: sharded-vs-serial
equivalence of the train step and the driver's multichip dry run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from satmvs_tpu.data import synthetic
from satmvs_tpu.dist import make_mesh, replicate, shard_batch
from satmvs_tpu.models import cascade_loss
from satmvs_tpu.train import Config
from satmvs_tpu.train.loop import create_model_and_state, numeric_batch


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, spatial=4)
    assert mesh.shape == {"data": 2, "spatial": 4}
    with pytest.raises(ValueError):
        make_mesh(data=16, spatial=16)


def test_sharded_loss_matches_single_device():
    """Data+spatial-sharded forward/loss must equal the unsharded result."""
    batch = numeric_batch(synthetic.make_batch(batch_size=2, width=32, height=32))
    cfg = Config(model="casmvs", geo_model="rpc", ndepths=(8, 8, 8))
    model, state, _ = create_model_and_state(cfg, batch, steps_per_epoch=1)

    def loss_fn(state, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["cams"], batch["depth_values"], train=False,
        )
        total, _ = cascade_loss(out, batch["depth_stages"], batch["mask_stages"])
        return total

    single = float(jax.jit(loss_fn)(state, batch))

    mesh = make_mesh(data=2, spatial=4)
    with jax.set_mesh(mesh):
        sharded = float(
            jax.jit(loss_fn)(replicate(state, mesh), shard_batch(batch, mesh))
        )
    np.testing.assert_allclose(sharded, single, rtol=2e-4)


def test_dryrun_multichip_runs():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
