"""satmvs_tpu — a TPU-native satellite multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of WHU-GPCV/SatMVS
(reference: /root/reference — ICCV 2021 "Rational Polynomial Camera Model Warping
for Deep Learning Based Satellite Multi-View Stereo Matching").

Layers (bottom → top):
  geo/     rational-polynomial & pinhole camera models, map projections   (ref L0)
  data/    file formats, sample lists, preprocessing, datasets            (ref L1)
  ops/     plane-sweep warping, cost volumes, depth samplers, regression  (ref L2)
  nn/      flax building blocks: FeatureNet, CostRegNet, RED recurrence   (ref L3)
  models/  CascadeRED / CascadeMVS / UCS networks + losses                (ref L4)
  dist/    device mesh, shardings, collectives, spatial tiling            (new layer)
  train/   config, train/eval loops, optimizer, checkpoints, metrics      (ref L5)
  infer/   streaming whole-scene prediction, fusion, DSM output           (ref L6)

Design (TPU-first, not a port):
  * channels-last (NHWC / NDHWC) layouts everywhere — native for XLA:TPU convs.
  * RPC plane-sweep math runs in float32 *normalized* coordinates; cross-view
    renormalization constants are precomputed in float64 on host so absolute
    lat/lon never materialize on device (sub-0.01 px vs the reference's fp64).
  * recurrences (RED) are `lax.scan`s; streaming inference is a scan with an
    online-softmax carry; no data-dependent Python control flow under jit.
  * multi-chip scaling via `jax.sharding.Mesh` + XLA collectives, with mesh
    axes (data, depth) and spatial tiling for whole-scene inference.
"""

__version__ = "0.1.0"
