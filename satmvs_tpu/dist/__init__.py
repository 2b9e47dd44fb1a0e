"""Distribution layer: device mesh, shardings, collectives (new vs reference)."""

from .mesh import (  # noqa: F401
    batch_spec,
    init_multihost,
    constrain,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    stage_volume_specs,
    volume_spec,
)
