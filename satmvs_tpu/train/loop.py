"""Training / evaluation loops: jitted steps, RMSprop + stepped LR, logging.

Counterpart of /root/reference/train.py:163-345.  Deliberate fixes of
reference quirks (SURVEY.md §7): the LR schedule decays at epoch *boundaries*
(the reference stepped a MultiStepLR with epoch-valued milestones once per
iteration, decaying the LR within the first 14 iterations); metrics use
mask-weighted means for jit-static shapes.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import build_model, cascade_loss
from . import metrics as metrics_lib
from .config import Config


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """RMSprop(α=0.9) with LR halved at epoch milestones
    (ref train.py:135-136,164-167)."""
    boundaries = {
        int(m) * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones
    }
    sched = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    tx = optax.rmsprop(learning_rate=sched, decay=0.9, eps=1e-8)
    if cfg.wd > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.wd), tx)
    return tx


def numeric_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if k not in ("out_view", "out_name")}


def resolve_sweep_stencil(cfg: Config, sample_batch: dict) -> int:
    """Pallas sweep tap width for this run: cfg.sweep_stencil, or when 0
    (auto) the narrow 4-stencil iff the sample's camera geometry passes the
    coverage gate (ops.warp.sweep_coverage_misses_from_cams) — ~2x faster
    gathers/scatters; falls back to the always-safe 8 otherwise."""
    if cfg.sweep_stencil:
        return cfg.sweep_stencil
    if cfg.geo_model != "rpc" or jax.default_backend() != "tpu":
        return 8
    try:
        from ..ops.warp import sweep_coverage_misses_from_cams

        nb = numeric_batch(sample_batch)
        cams0 = jax.tree.map(lambda x: jnp.asarray(x)[0], nb["cams"])
        _, _, h, w, _ = nb["imgs"].shape
        dv = jnp.asarray(nb["depth_values"])[0]
        misses = sweep_coverage_misses_from_cams(
            cams0, h, w, (float(dv[0]), float(dv[-1])), stencil=4
        )
        return 4 if sum(misses.values()) == 0 else 8
    except Exception:
        return 8


def create_model_and_state(cfg: Config, sample_batch: dict, steps_per_epoch: int,
                           rng: Optional[jax.Array] = None,
                           abstract_init: bool = False):
    """Build the configured model and initialize TrainState from one batch.

    abstract_init=True builds the state TEMPLATE via jax.eval_shape + zeros
    instead of executing the init forward — for restore paths (the predict
    CLIs), where a real init at production tile shapes costs a full ~3 min
    device compile just to produce parameters the checkpoint immediately
    overwrites (params are image/D-shape-independent)."""
    import os

    model = build_model(
        cfg.model, cfg.geo_model,
        ndepths=tuple(cfg.ndepths),
        cr_base_chs=tuple(cfg.cr_base_chs),
        sweep_stencil=resolve_sweep_stencil(cfg, sample_batch),
        compute_dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None),
        volume_dtype=(jnp.bfloat16 if cfg.volume_dtype == "bfloat16" else None),
        torch_compat=cfg.torch_compat,
        # env read ONCE at model build (a trace-time read would be silently
        # cached by the first jitted step) — the A/B knob for training with
        # the fused sweep kernel instead of per-view gathers
        train_fused_sweep=os.environ.get("SATMVS_TRAIN_FUSED_SWEEP") == "1",
        fused_red=cfg.fused_red,
        fused_sweep=cfg.fused_sweep,
        **({"min_interval": cfg.min_interval,
            "depth_intervals_ratio": tuple(cfg.depth_inter_r)}
           if cfg.model in ("red", "casmvs") else {"lamb": cfg.lamb}),
    )
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    nb = numeric_batch(sample_batch)
    if abstract_init:
        shapes = jax.eval_shape(
            lambda i, c, d: model.init(rng, i, c, d, train=False),
            nb["imgs"], nb["cams"], nb["depth_values"],
        )
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes,
        )
    else:
        variables = model.init(rng, nb["imgs"], nb["cams"], nb["depth_values"], train=False)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, state, tx


def make_train_step(model, tx, dlossw) -> Callable:
    """Jitted (state, batch) → (state, scalars)."""

    @jax.jit
    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["cams"], batch["depth_values"],
                train=True, mutable=["batch_stats"],
            )
            total, depth_loss = cascade_loss(
                out, batch["depth_stages"], batch["mask_stages"], dlossw
            )
            return total, (out, updates, depth_loss)

        (loss, (out, updates, depth_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        upd, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        new_state = TrainState(
            params=new_params,
            batch_stats=updates["batch_stats"],
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        final = out["depth"]
        gt = batch["depth_stages"][-1]
        mask = batch["mask_stages"][-1]
        scalars = {
            "loss": loss,
            "depth_loss": depth_loss,
            "abs_depth_error": metrics_lib.abs_depth_error(final, gt, mask > 0.5),
        }
        return new_state, scalars

    return train_step


def make_eval_step(model, dlossw, min_interval: float) -> Callable:
    """Jitted (state, batch) → scalars + depth/confidence maps."""

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["cams"], batch["depth_values"], train=False,
        )
        total, depth_loss = cascade_loss(
            out, batch["depth_stages"], batch["mask_stages"], dlossw
        )
        final = out["depth"]
        gt = batch["depth_stages"][-1]
        mask = batch["mask_stages"][-1]
        scalars = {"loss": total, "depth_loss": depth_loss}
        scalars.update(metrics_lib.standard_metrics(final, gt, mask, min_interval))
        return scalars, final, out["photometric_confidence"]

    return eval_step


def fit(cfg: Config, train_loader, test_loader, workdir: str,
        log_fn: Optional[Callable[[str], None]] = print):
    """Full training run: epochs of train steps + a test pass per epoch,
    checkpoint per `save_freq` epochs, per-epoch record file
    (ref train.py:163-222)."""
    import os

    from . import checkpoints as ckpt_lib
    from .logging import MetricLogger

    steps_per_epoch = max(len(train_loader), 1)
    first = next(iter(train_loader))
    model, state, tx = create_model_and_state(cfg, first, steps_per_epoch)

    # ---- SPMD training over a named mesh (--mesh_data/--mesh_spatial/
    # --mesh_depth; the comm layer the reference lacks, SURVEY §2.2):
    # batch sharded over `data`, cost volumes constrained over
    # `spatial`/`depth` (per-stage guarded specs), params replicated.
    mesh = None
    shard_in = numeric_batch
    if cfg.mesh_data * cfg.mesh_spatial * cfg.mesh_depth > 1:
        from ..dist import make_mesh, replicate, shard_batch, stage_volume_specs

        if cfg.mesh_depth > 1 and cfg.model == "red":
            raise ValueError(
                "depth-slab sharding (--mesh_depth) applies to the 3-D conv "
                "regularizers (casmvs/ucs); the RED recurrence scans depth "
                "sequentially on-chip by design"
            )
        if cfg.mesh_depth > 1 and cfg.mesh_spatial > 1:
            raise ValueError(
                "combined depth+spatial sharding of the same cost volume "
                "miscomputes gradients through XLA GSPMD's strided-conv "
                "backward (~1.3% of grad scale measured at 2x2 shards even "
                "with every pyramid level at extent >= shards — NOTES.md); "
                "use --mesh_depth or --mesh_spatial, not both"
            )
        if cfg.batch_size % cfg.mesh_data:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh_data {cfg.mesh_data}"
            )
        mesh = make_mesh(cfg.mesh_data, cfg.mesh_spatial, cfg.mesh_depth)
        if cfg.mesh_spatial > 1 or cfg.mesh_depth > 1:
            # guarded per-stage specs: BOTH conv dims (depth hypotheses and
            # image rows) shard only where every strided-conv-pyramid level
            # keeps extent ≥ shards (the GSPMD backward trap, NOTES.md);
            # combined depth+spatial under these guards is gradient-parity
            # tested (tests/test_dist.py::test_combined_depth_spatial_…)
            model = model.clone(volume_partition=stage_volume_specs(
                tuple(cfg.ndepths), spatial=cfg.mesh_spatial > 1,
                depth_shards=cfg.mesh_depth,
                spatial_shards=cfg.mesh_spatial,
                height=int(numeric_batch(first)["imgs"].shape[2]),
            ))
        state = replicate(state, mesh)
        shard_in = lambda b: shard_batch(numeric_batch(b), mesh)

    start_epoch = 1
    if cfg.resume:
        restored, ep = ckpt_lib.restore_checkpoint(workdir, state)
        if restored is not None:
            state, start_epoch = restored, ep + 1
            if log_fn:
                log_fn(f"resumed from epoch {ep}")

    train_step = make_train_step(model, tx, tuple(cfg.dlossw))
    eval_step = make_eval_step(model, tuple(cfg.dlossw), cfg.min_interval)
    logger = MetricLogger(workdir)
    keeper = ckpt_lib.CheckpointKeeper(workdir)  # async epoch saves

    import contextlib

    mesh_ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with mesh_ctx:
        state = _fit_epochs(cfg, train_loader, test_loader, workdir, log_fn,
                            state, train_step, eval_step, logger, keeper,
                            steps_per_epoch, start_epoch, shard_in)
    keeper.close()
    logger.close()
    return model, state


def _fit_epochs(cfg, train_loader, test_loader, workdir, log_fn, state,
                train_step, eval_step, logger, keeper, steps_per_epoch,
                start_epoch, shard_in):
    import os

    from . import metrics as metrics_lib

    for epoch in range(start_epoch, cfg.epochs + 1):
        for it, batch in enumerate(train_loader):
            t0 = time.time()
            state, scalars = train_step(state, shard_in(batch))
            gstep = (epoch - 1) * steps_per_epoch + it
            if gstep % cfg.summary_freq == 0:
                scal = {k: float(v) for k, v in scalars.items()}
                logger.scalars("train", scal, gstep)
                if log_fn:
                    log_fn(
                        f"epoch {epoch}/{cfg.epochs} iter {it}/{steps_per_epoch} "
                        f"loss={scal['loss']:.3f} time={time.time() - t0:.3f}s"
                    )

        meter = metrics_lib.DictAverageMeter()
        logged_images = False
        for batch in test_loader:
            nb = numeric_batch(batch)
            scalars, depth_est, _conf = eval_step(state, shard_in(batch))
            meter.update({k: float(v) for k, v in scalars.items()})
            if not logged_images:
                # reference logs depth_est/gt, ref img, mask, errormap
                # (train.py:290-295) — once per test pass, first sample
                import numpy as np

                step_i = epoch * steps_per_epoch
                de = np.asarray(depth_est[0])
                gt = np.asarray(nb["depth_stages"][-1][0])
                mk = np.asarray(nb["mask_stages"][-1][0]) > 0.5
                logger.image("fulltest", "depth_est", de, step_i)
                logger.image("fulltest", "depth_gt", gt, step_i)
                logger.image("fulltest", "ref_img", np.asarray(nb["imgs"][0, 0]).transpose(2, 0, 1), step_i)
                logger.image("fulltest", "mask", mk.astype(np.float32), step_i)
                logger.image("fulltest", "errormap", np.abs(de - gt) * mk, step_i)
                logged_images = True
        means = meter.mean()
        logger.scalars("fulltest", means, epoch * steps_per_epoch)
        if log_fn:
            log_fn(f"epoch {epoch} test: {means}")
        with open(os.path.join(workdir, "train_record.txt"), "a") as f:
            f.write(f"{epoch} {means}\n")

        if epoch % cfg.save_freq == 0:
            keeper.save(epoch, state)
    return state
