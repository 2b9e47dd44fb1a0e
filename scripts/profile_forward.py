#!/usr/bin/env python
"""Trace-driven profiling of the model forward on TPU.

Captures a jax.profiler device trace of N forwards and prints an aggregated
per-op breakdown parsed from the Chrome-trace JSON — works headless (no
TensorBoard).  This is the real `--mode=profile` companion: the reference's
profile flag was never implemented (ref train.py:25,341-345).

Usage: python scripts/profile_forward.py [--model red] [--size 384x768]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])


def _bucket(name: str) -> str:
    """Classify an XLA-op trace name into a cost-map pool (the NOTES.md
    cost maps use exactly these buckets)."""
    import re

    if re.match(r"^(copy|bitcast|transpose)", name):
        return "copies/relayout"
    if "REDRegularizer" in name:
        return "pallas: RED pipeline"
    if name.startswith("vmap__") or "sweep" in name:
        return "pallas: sweep kernels"
    if re.match(r"^(convolution|conv|dot)", name):
        return "XLA convs/dots"
    return "XLA elementwise/fusions/other"


def aggregate_trace(trace_dir: str, top: int = 25):
    """Parse the newest chrome trace under trace_dir → (device_total, per-op
    rows, counts, bucket table).  Only the device 'XLA Ops' thread is
    counted (module/step container rows would double count); each bucket
    row carries (time_us, op_count, hbo_bytes) — bytes from the profiler's
    per-op `bytes_accessed` (custom calls report 0: their traffic is
    in-kernel DMA the profiler cannot see)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    proc, tname = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    buckets = collections.defaultdict(lambda: [0.0, 0, 0.0])
    device_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc.get(e["pid"], "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        if tname.get((e["pid"], e["tid"]), "") != "XLA Ops":
            continue
        name = e["name"]
        dur = e.get("dur", 0)
        device_total += dur
        agg[name] += dur
        cnt[name] += 1
        b = buckets[_bucket(name)]
        b[0] += dur
        b[1] += 1
        b[2] += float(e.get("args", {}).get("bytes_accessed", 0) or 0)
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return device_total, rows, cnt, dict(buckets)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="red", choices=["red", "casmvs", "ucs"])
    p.add_argument("--size", default="384x768")
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--train", action="store_true",
                   help="profile the full train step (loss+grads+update)")
    a = p.parse_args()

    import jax

    from satmvs_tpu import cache as _cache

    _cache.enable()  # persistent compile cache (Mosaic kernel compiles are minutes)

    import jax.numpy as jnp

    from satmvs_tpu.data import synthetic
    from satmvs_tpu.models import build_model
    from satmvs_tpu.train.loop import numeric_batch

    h, w = (int(x) for x in a.size.split("x"))
    batch = numeric_batch(synthetic.make_batch(batch_size=1, width=w, height=h, seed=0))
    model = build_model(a.model, "rpc", ndepths=tuple(int(x) for x in a.ndepths.split(",")))
    variables = model.init(jax.random.PRNGKey(0), batch["imgs"], batch["cams"],
                           batch["depth_values"], train=False)
    imgs = jnp.asarray(batch["imgs"])
    dvals = jnp.asarray(batch["depth_values"])

    if a.train:
        from satmvs_tpu.train.config import Config
        from satmvs_tpu.train.loop import create_model_and_state, make_train_step

        cfg = Config(model=a.model, geo_model="rpc",
                     ndepths=tuple(int(x) for x in a.ndepths.split(",")))
        model, state, tx = create_model_and_state(cfg, batch, steps_per_epoch=100)
        train_step = make_train_step(model, tx, tuple(cfg.dlossw))

        @jax.jit
        def fwd(c):
            b = dict(batch, imgs=imgs + c * 1e-12)
            new_state, scalars = train_step(state, b)
            leaf = jax.tree.leaves(new_state.params)[0]
            return scalars["loss"] + leaf.ravel()[0] * 1e-20
    else:
        @jax.jit
        def fwd(c):
            out = model.apply(variables, imgs + c * 1e-12, batch["cams"], dvals,
                              train=False)
            return out["depth"].ravel()[0]

    fwd(jnp.float32(0)).block_until_ready()
    trace_dir = a.trace_dir or tempfile.mkdtemp(prefix="satmvs_trace_")
    with jax.profiler.trace(trace_dir):
        for i in range(a.iters):
            fwd(jnp.float32(i + 1)).block_until_ready()

    device_total, rows, cnt, buckets = aggregate_trace(trace_dir)
    print(f"device total: {device_total / 1e3 / a.iters:.1f} ms/forward "
          f"({a.model} {a.size}, ndepths {a.ndepths})")
    print("cost map (pool, ms, ops, HBM GB — custom-call DMA not visible):")
    for pool, (dur, n, by) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        print(f"  {dur / 1e3 / a.iters:7.1f} ms {n // a.iters:6d} ops "
              f"{by / a.iters / 1e9:6.2f} GB  {pool}")
    print(f"{'ms/fwd':>9}  {'count':>6}  op")
    for name, dur in rows:
        print(f"{dur / 1e3 / a.iters:9.2f}  {cnt[name] // a.iters:6d}  {name[:70]}")
    print(f"trace: {trace_dir}")


if __name__ == "__main__":
    main()
