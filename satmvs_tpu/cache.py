"""Persistent XLA compilation cache.

Mosaic compiles of the big fused kernels (ops/pallas/) take minutes on the
remote TPU service; the persistent cache makes every later process start
(bench runs, CLIs, notebooks) hit disk instead.  Verified to work across
processes on this image's tunneled 'axon' backend.

Call `enable()` BEFORE the first jax computation (config flips after backend
init are ignored for already-compiled executables).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")


def enable(path: str | None = None, min_compile_secs: float = 1.0) -> str:
    import jax

    path = path or os.environ.get("SATMVS_COMPILE_CACHE", DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
