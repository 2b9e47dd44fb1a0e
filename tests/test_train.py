"""Train-loop tests: config parsing, optimizer schedule, end-to-end fit on a
synthetic on-disk dataset (loss decreases), checkpoint save/resume, metrics."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from satmvs_tpu.data import synthetic
from satmvs_tpu.data.dataset import MVSDataset
from satmvs_tpu.data.loader import Loader
from satmvs_tpu.train import Config, fit
from satmvs_tpu.train import metrics as metrics_lib
from satmvs_tpu.train.checkpoints import latest_epoch, restore_checkpoint
from satmvs_tpu.train.config import Config as Cfg
from satmvs_tpu.train.loop import make_optimizer


def test_config_from_args_reference_cli():
    cfg = Cfg.from_args(
        [
            "--mode=train", "--model=red", "--geo_model=rpc",
            "--ndepths", "48,32,8", "--depth_inter_r", "4,2,1",
            "--lrepochs", "10,12,14:2", "--min_interval", "5.0",
        ]
    )
    assert cfg.ndepths == (48, 32, 8)
    assert cfg.lr_milestones == (10, 12, 14)
    assert cfg.lr_gamma == 0.5
    assert cfg.min_interval == 5.0
    assert cfg.num_stage == 3


def test_lr_schedule_halves_at_epoch_boundaries():
    import optax

    cfg = Config(lr=1e-3, lr_milestones=(2, 3), lr_gamma=0.5)
    steps_per_epoch = 10
    boundaries = {int(m) * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones}
    sched = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)
    assert float(sched(25)) == pytest.approx(5e-4)
    assert float(sched(35)) == pytest.approx(2.5e-4)


def test_metrics_golden():
    est = jnp.asarray(np.array([[[0.0, 1.0], [2.0, 300.0]]], np.float32))
    gt = jnp.zeros((1, 2, 2), jnp.float32)
    mask = jnp.ones((1, 2, 2), jnp.float32)
    # errors: 0, 1, 2, 300(outlier-cut)
    mae = float(metrics_lib.abs_depth_error(est, gt, mask > 0.5, 250.0))
    assert mae == pytest.approx(1.0)  # mean(0,1,2)
    acc = float(metrics_lib.threshold_accuracy(est, gt, mask > 0.5, 2.5))
    assert acc == pytest.approx(3 / 4)
    ia = float(metrics_lib.interval_accuracy(est, gt, 1.0, mask > 0.5, 3.0))
    assert ia == pytest.approx(3 / 4)


@pytest.mark.slow
def test_fit_end_to_end(tmp_path):
    """The minimum end-to-end slice (SURVEY §7 step 4): synthetic data on
    disk → dataset → loader → 2 epochs of RED training → loss drops,
    checkpoint lands, resume restores."""
    root = synthetic.write_synthetic_dataset(str(tmp_path / "data"), num_scenes=2, width=32, height=32)
    ds_train = MVSDataset(root, "train", view_num=3, ref_view=2)
    ds_test = MVSDataset(root, "test", view_num=3, ref_view=2)
    tl = Loader(ds_train, batch_size=1, shuffle=True, prefetch=0, seed=0)
    el = Loader(ds_test, batch_size=1, prefetch=0)

    workdir = str(tmp_path / "ckpt")
    cfg = Config(
        model="red", geo_model="rpc", ndepths=(8, 4, 4), epochs=2,
        lr=1e-3, summary_freq=1, save_freq=1,
    )
    model, state = fit(cfg, tl, el, workdir, log_fn=None)

    # metrics.jsonl has train + fulltest records and loss decreased
    recs = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    train_losses = [r["loss"] for r in recs if r["mode"] == "train"]
    assert len(train_losses) >= 4
    assert train_losses[-1] < train_losses[0]

    # checkpoints + resume
    assert latest_epoch(workdir) == 2
    restored, ep = restore_checkpoint(workdir, state)
    assert ep == 2
    np.testing.assert_allclose(
        np.asarray(jnp.ravel(list(restored.params.values())[0]["Conv_0"]["kernel"])
                   if isinstance(restored.params, dict) else 0),
        np.asarray(jnp.ravel(list(state.params.values())[0]["Conv_0"]["kernel"])),
    )
    assert os.path.exists(os.path.join(workdir, "train_record.txt"))


@pytest.mark.slow
def test_fit_mesh_sharded(tmp_path):
    """--mesh_data/--mesh_depth training: fit() over a 2x1x2 mesh (batch
    sharded over data, stage-1 volume over depth slabs) runs and
    checkpoints; depth sharding is refused for the RED recurrence."""
    root = synthetic.write_synthetic_dataset(str(tmp_path / "data"), num_scenes=2, width=32, height=32)
    ds_train = MVSDataset(root, "train", view_num=3, ref_view=2)
    ds_test = MVSDataset(root, "test", view_num=3, ref_view=2)
    tl = Loader(ds_train, batch_size=2, prefetch=0, seed=0)
    el = Loader(ds_test, batch_size=2, prefetch=0)

    workdir = str(tmp_path / "ckpt_mesh")
    cfg = Config(
        model="casmvs", geo_model="rpc", ndepths=(16, 8, 8), epochs=1,
        batch_size=2, summary_freq=1, mesh_data=2, mesh_depth=2,
    )
    model, state = fit(cfg, tl, el, workdir, log_fn=None)
    assert latest_epoch(workdir) == 1

    with pytest.raises(ValueError, match="RED"):
        fit(Config(model="red", geo_model="rpc", ndepths=(16, 8, 8),
                   epochs=1, batch_size=2, mesh_depth=2),
            tl, el, str(tmp_path / "x"), log_fn=None)
