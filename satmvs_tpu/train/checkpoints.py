"""Orbax checkpointing: save/restore {params, batch_stats, opt_state, epoch}.

Counterpart of the reference's torch.save/resume-latest logic
(/root/reference/train.py:140-157,215-220), with the same semantic content.
Async-capable Orbax replaces filename-sort resume with a CheckpointManager.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
    )


def save_checkpoint(directory: str, epoch: int, state: Any) -> None:
    """Save a pytree state under `directory/<epoch>` (blocking)."""
    mgr = _manager(directory)
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, state_template: Any, epoch: Optional[int] = None):
    """Restore a state pytree; `epoch=None` → latest (resume semantics).

    Returns (state, epoch) or (None, None) if nothing is saved.
    """
    mgr = _manager(directory)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state_template))
    mgr.close()
    return restored, step
