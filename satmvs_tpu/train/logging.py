"""Metric logging: TensorBoard when available, JSONL always.

Counterpart of the reference's tensorboardX SummaryWriter + stdout prints
(/root/reference/train.py:91,178-212; tools/utils.py:94-124).  The JSONL
stream (`metrics.jsonl`) is the machine-readable record the bench harness and
tests consume.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, workdir: str):
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # pragma: no cover - tensorboardX optional
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(workdir)
        except ImportError:
            pass

    def scalars(self, mode: str, scalar_dict: dict, step: int) -> None:
        rec = {"mode": mode, "step": step, "time": time.time(), **scalar_dict}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalar_dict.items():
                self._tb.add_scalar(f"{mode}/{k}", v, step)

    def image(self, mode: str, name: str, img, step: int) -> None:
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[None]
            lo, hi = arr.min(), arr.max()
            arr = (arr - lo) / (hi - lo + 1e-9)
            self._tb.add_image(f"{mode}/{name}", arr, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
