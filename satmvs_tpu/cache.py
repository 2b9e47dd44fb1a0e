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


def _host_tag() -> str:
    """Fingerprint of the host CPU feature set.

    XLA:CPU AOT cache entries embed the COMPILE machine's feature flags;
    loading an entry produced on a different microarchitecture SIGILLs /
    segfaults (measured: a full-suite crash in
    compilation_cache.get_executable_and_time deserializing a stale entry
    from an earlier round's host).  Partitioning the cache dir by a flags
    hash makes entries from other hosts invisible instead of fatal; TPU
    entries are unaffected (device code, but the partition is harmless)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable(path: str | None = None, min_compile_secs: float = 1.0) -> str:
    """Enable the persistent compile cache — TPU backends only.

    On the CPU backend the cache is a net LOSS and unsafe: XLA:CPU AOT
    deserialization segfaults on this image for the big 8-virtual-device
    SPMD programs (reproduced 3x at the same test, fresh cache dir —
    the 'Loading XLA:CPU AOT result ... could lead to SIGILL' warnings are
    fatal there), and CPU compiles are cheap anyway.  The cache's entire
    value is the multi-minute TPU Mosaic kernel compiles."""
    import jax

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    # the platform list is an ordered preference ("axon,cpu" means axon with
    # a cpu fallback) — only the SELECTED (first) platform matters.  A plain
    # `"cpu" in platforms` substring test disabled the cache on every TPU
    # process of this image (jax_platforms defaults to "axon,cpu" here) and
    # silently cost ~190 s of recompile per CLI run (NOTES round-5).
    selected = str(platforms).split(",")[0].strip().lower()
    if os.environ.get("SATMVS_PLATFORM") == "cpu" or selected == "cpu":
        return ""
    path = path or os.environ.get("SATMVS_COMPILE_CACHE", DEFAULT_DIR)
    path = os.path.join(path, _host_tag())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path


def disable() -> None:
    """Hard-disable the persistent cache for this process.

    Required by any code that flips the backend to CPU AFTER an import-time
    `enable()` ran under the TPU platform (e.g. __graft_entry__'s dryrun):
    with the cache left on, the CPU backend both writes XLA:CPU AOT entries
    into the TPU cache dir and LOADS them — the machine-feature-mismatch
    deserialization that segfaulted the round-4 suite ("could lead to
    SIGILL" loader warnings)."""
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
