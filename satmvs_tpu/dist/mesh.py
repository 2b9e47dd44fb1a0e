"""Device mesh + sharding helpers — the communication layer the reference
lacks (it ships single-process nn.DataParallel only, ref train.py:128-130;
SURVEY.md §2.2).

Mesh axes:
  data     batch-parallel (gradient psum inserted by XLA)
  spatial  height-axis sharding of images / cost volumes (halo exchange for
           convs is inserted by GSPMD) — the "tile/SP" axis
Extra axes (view, depth) are exercised at the op level (ops/cost_volume.py
psum moments; infer tiling) — see tests/test_dist.py.

Usage: put the batch on `batch_sharding(mesh)`-placed arrays, the state on
`replicated(mesh)`, and call a normally-jitted step inside `use_mesh(mesh)`;
XLA compiles one SPMD program from the argument shardings.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (DCN) and return the global device count.

    Thin wrapper over jax.distributed.initialize — on single-host runs it is
    a no-op returning the local device count.  Mesh axes then span all hosts'
    devices; XLA routes collectives over ICI within a slice and DCN across
    hosts (SURVEY §2.2).  Untested on real multi-host here (1 chip available).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def make_mesh(data: int = 1, spatial: int = 1, depth: int = 1, devices=None) -> Mesh:
    """3-axis mesh: data (batch), spatial (H of images/volumes), depth
    (depth-hypothesis slabs of cost volumes — SURVEY §2.2's sequence axis).
    Singleton axes cost nothing; most runs use one or two axes."""
    devices = list(jax.devices()) if devices is None else list(devices)
    need = data * spatial * depth
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, spatial, depth)
    return Mesh(arr, ("data", "spatial", "depth"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    """Leading-axis (batch) sharding over the data axis."""
    return P("data")


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of a batch with its leading axis over 'data'."""
    sh = NamedSharding(mesh, batch_spec())
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def volume_spec(spatial: bool = True, depth: bool = False) -> P:
    """PartitionSpec for a (B, D, H, W, C) cost volume: batch over 'data',
    H over 'spatial', D over 'depth' (GSPMD inserts conv halo exchanges on
    every sharded conv axis).  Depth-slab sharding fits the 3-D-conv
    regularizers (casmvs/ucs); the RED recurrence scans D sequentially
    on-chip by design (SURVEY §2.2)."""
    return P("data", "depth" if depth else None,
             "spatial" if spatial else None, None, None)


def stage_volume_specs(ndepths, spatial: bool = False, depth_shards: int = 1,
                       levels: int = 3, spatial_shards: int = 0,
                       height: int = 0):
    """Per-cascade-stage volume PartitionSpecs with validity guards on the
    sharded conv dims: a dim is sharded only at stages where every level of
    the `levels`-deep strided conv pyramid keeps extent ≥ the shard count
    (extent ≥ shards·2^levels).  Below that, XLA GSPMD's backward for the
    strided down/up conv chain miscomputes gradients (measured in fp64 on
    the CPU backend: ~6% bias-grad error at extent<shards, bit-exact at
    extent≥shards — see NOTES.md); production D=64 supports up to 8-way
    depth sharding at stage 1.

    The depth guard uses `ndepths`; the spatial guard needs `spatial_shards`
    and the image `height` (stage H = height/scale, coarsest stage first) —
    when those aren't given (legacy callers), spatial is applied unguarded,
    which is safe for the production geometries (384+ rows) but combined
    depth+spatial MUST go through the guarded form (fit() does)."""
    num = len(ndepths)
    scales = {3: (4, 2, 1), 2: (4, 1), 1: (4,)}[num]

    def spatial_ok(i):
        if not spatial:
            return False
        if not (spatial_shards and height):
            return True  # legacy unguarded form
        return height // scales[i] >= spatial_shards * 2 ** levels

    return tuple(
        P(
            "data",
            "depth" if depth_shards > 1 and nd >= depth_shards * 2 ** levels else None,
            "spatial" if spatial_ok(i) else None,
            None,
            None,
        )
        for i, nd in enumerate(ndepths)
    )


def constrain(x, spec: Optional[P]):
    """Apply a sharding constraint when a spec is given (no-op otherwise)."""
    if spec is None:
        return x
    return jax.lax.with_sharding_constraint(x, spec)
