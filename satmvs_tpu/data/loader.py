"""Batching iterator with shuffling and threaded prefetch.

Replaces the reference's torch DataLoader (train.py:97-101, which ran with
num_workers=0, i.e. synchronous loading on the training thread).  Here sample
assembly runs on a background thread pool and batches are double-buffered so
host I/O overlaps device compute — the input-pipeline half of SURVEY.md §7's
"hard parts".
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np
import jax

from ..ops import warp as warplib


def collate(samples: list[dict]) -> dict:
    """Stack a list of dataset samples into one batched sample."""
    out = {
        "imgs": np.stack([s["imgs"] for s in samples]),
        "depth_values": np.stack([s["depth_values"] for s in samples]),
        "out_view": [s["out_view"] for s in samples],
        "out_name": [s["out_name"] for s in samples],
    }
    first = samples[0]["cams"]
    if isinstance(first[0], (warplib.RpcWarpCams, warplib.QcWarpCams)):
        out["cams"] = tuple(
            warplib.stack_cams([s["cams"][i] for s in samples])
            for i in range(len(first))
        )
    else:
        out["cams"] = tuple(
            np.stack([s["cams"][i] for s in samples]) for i in range(len(first))
        )
    if "depth_stages" in samples[0]:
        n = len(samples[0]["depth_stages"])
        out["depth_stages"] = [
            np.stack([s["depth_stages"][i] for s in samples]) for i in range(n)
        ]
        out["mask_stages"] = [
            np.stack([s["mask_stages"][i] for s in samples]) for i in range(n)
        ]
    return out


class Loader:
    """Iterate batches of a dataset with optional shuffle + prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(len(self)):
            idxs = order[i * self.batch_size : (i + 1) * self.batch_size]
            yield collate([self.dataset[int(j)] for j in idxs])

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list[BaseException] = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as exc:  # re-raised on the consumer thread
                error.append(exc)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                break
            yield item


def device_put_batch(batch: dict, sharding: Optional[jax.sharding.Sharding] = None):
    """Move the numeric leaves of a batch onto device(s), leaving the string
    routing fields on host."""
    numeric = {k: v for k, v in batch.items() if k not in ("out_view", "out_name")}
    if sharding is None:
        moved = jax.device_put(numeric)
    else:
        moved = jax.tree.map(lambda x: jax.device_put(x, sharding), numeric)
    moved.update({k: batch[k] for k in ("out_view", "out_name") if k in batch})
    return moved
