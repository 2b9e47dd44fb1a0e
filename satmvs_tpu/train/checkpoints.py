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


class CheckpointKeeper:
    """Async checkpointing for a training run (SURVEY §5 failure-recovery).

    One CheckpointManager held for the run: `save` enqueues the write and
    returns immediately (training overlaps the serialization — orbax async);
    `close` drains pending writes.  Restore-side preemption tolerance is
    `restore_checkpoint(epoch=None)` = latest committed step (a preempted
    half-written save is never committed by orbax, so resume always sees a
    consistent checkpoint).
    """

    def __init__(self, directory: str):
        self._mgr = _manager(directory)

    def save(self, epoch: int, state: Any) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


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
