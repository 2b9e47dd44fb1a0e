#!/usr/bin/env python
"""Probe: can Mosaic lower strided LANE slices / stores, and at what cost?

Decides the column-subsampling strategy for the row-packed stride-2
conv/deconv kernels (ops/pallas/plane_conv.py):
  a) strided lane read   pad[row, :, dx : dx + 2*W2 : 2]
  b) reshape trick       row.reshape(C, W2, 2)[:, :, 0]
  c) selection matmul    row @ S  with S[x, x2] = (x == 2*x2 + dx)
  d) strided lane store  out[row, :, 0 : W : 2] = v   (deconv interleave)

Run on TPU: python scripts/_stride_probe.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SATMVS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SATMVS_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench

H, W, C = 384, 768, 8
W2 = W // 2


def _try(name, fn, ref_fn):
    try:
        out = jax.jit(fn)(X)
        out.block_until_ready()
        ref = ref_fn(X)
        err = float(jnp.max(jnp.abs(out - ref)))
        dt = bench._time_fn(lambda c: fn(X + c * 0).ravel()[0] + c * 0, iters=20)
        print(f"{name:28s} OK   err={err:.2e}  {dt*1e6:8.1f} us")
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:28s} FAIL {msg}")


rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(H, C, W)).astype(np.float32))


def k_strided_read(x_ref, o_ref):
    def body(y, _):
        o_ref[pl.ds(y, 1), :, :] = x_ref[pl.ds(y, 1), :, 0:W:2]
        return 0

    jax.lax.fori_loop(0, H, body, 0)


def strided_read(x):
    return pl.pallas_call(
        k_strided_read,
        out_shape=jax.ShapeDtypeStruct((H, C, W2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def k_strided_read_bulk(x_ref, o_ref):
    o_ref[...] = x_ref[:, :, 0:W:2]


def strided_read_bulk(x):
    return pl.pallas_call(
        k_strided_read_bulk,
        out_shape=jax.ShapeDtypeStruct((H, C, W2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def k_reshape(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(H, C, W2, 2)[:, :, :, 0]


def reshape_trick(x):
    return pl.pallas_call(
        k_reshape,
        out_shape=jax.ShapeDtypeStruct((H, C, W2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def k_selmat(x_ref, s_ref, o_ref):
    def body(y, _):
        o_ref[pl.ds(y, 1), :, :] = jnp.dot(
            x_ref[y], s_ref[...], preferred_element_type=jnp.float32
        ).reshape(1, C, W2)
        return 0

    jax.lax.fori_loop(0, H, body, 0)


def selmat(x):
    s = (
        (jax.lax.broadcasted_iota(jnp.int32, (W, W2), 0)
         == 2 * jax.lax.broadcasted_iota(jnp.int32, (W, W2), 1))
        .astype(jnp.float32)
    )
    return pl.pallas_call(
        k_selmat,
        out_shape=jax.ShapeDtypeStruct((H, C, W2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)


def k_strided_store(x_ref, o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)

    def body(y, _):
        o_ref[pl.ds(y, 1), :, 0:W:2] = x_ref[pl.ds(y, 1), :, 0:W2]
        return 0

    jax.lax.fori_loop(0, H, body, 0)


def strided_store(x):
    return pl.pallas_call(
        k_strided_store,
        out_shape=jax.ShapeDtypeStruct((H, C, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def ref_even(x):
    return x[:, :, 0::2]


def ref_scatter(x):
    out = jnp.zeros((H, C, W), jnp.float32)
    return out.at[:, :, 0::2].set(x[:, :, :W2])


def main():
    _try("strided_read(per-row)", strided_read, ref_even)
    _try("strided_read(bulk)", strided_read_bulk, ref_even)
    _try("reshape_trick", reshape_trick, ref_even)
    _try("selection_matmul", selmat, ref_even)
    _try("strided_store(per-row)", strided_store, ref_scatter)
    # XLA baseline for the same deinterleave
    _try("xla_slice", lambda x: x[:, :, 0::2], ref_even)


if __name__ == "__main__":
    from satmvs_tpu import cache as _cache

    _cache.enable()
    main()
