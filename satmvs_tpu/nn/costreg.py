"""3-D cost-volume regularization U-Net.

Counterpart of CostRegNet (/root/reference/modules/module.py:546-577):
3 stride-2 downsamples over (D, H, W), 3 transposed-conv upsamples with skip
additions, 1-channel logit head.  Channels-last (B, D, H, W, C); D, H, W must
be divisible by 8.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import Conv3DVia2D, ConvBlock, DeconvBlock

_BN_EPS = 1e-5  # flax nn.BatchNorm default


def packed_costreg_feasible(h: int, w: int, cin: int,
                            base_channels: int = 8, d: int = 8) -> bool:
    """True iff the row-packed CostRegNet forward can run at (d, h, w)
    volumes — same constraints as nn.red.packed_pipeline_feasible (even
    phase packs for the deconv geometries, per-kernel VMEM caps), plus D
    divisible by 8 (three stride-2 D halvings)."""
    from ..ops.pallas import plane_conv as pcv

    if h % 8 or w % 8 or d % 8:
        return False
    if not all(pcv.phase_pack_ok(h // s, w // s) for s in (1, 2, 4)):
        return False
    cap = 127 * 1024 * 1024
    b = base_channels
    heads = [(h, w, cin, b), (h // 2, w // 2, 2 * b, 2 * b),
             (h // 4, w // 4, 4 * b, 4 * b), (h // 8, w // 8, 8 * b, 8 * b),
             (h, w, b, 1)]
    if any(pcv.conv_head_vmem_bytes(*e, False) > cap for e in heads):
        return False
    dns = [(h, w, b, 2 * b), (h // 2, w // 2, 2 * b, 4 * b),
           (h // 4, w // 4, 4 * b, 8 * b)]
    if any(pcv.conv_dn_vmem_bytes(*e, False) > cap for e in dns):
        return False
    dec = [(h // 8, w // 8, 8 * b, 4 * b), (h // 4, w // 4, 4 * b, 2 * b),
           (h // 2, w // 2, 2 * b, b)]
    return all(pcv.deconv_up_vmem_bytes(*e, False) <= cap for e in dec)


def _bn_fold(p: dict, s: dict):
    """Inference BatchNorm as a per-channel affine: (scale, bias) such that
    bn(z) = z*scale + bias with the running statistics."""
    sc = p["scale"] * jax.lax.rsqrt(s["var"] + _BN_EPS)
    return sc, p["bias"] - s["mean"] * sc


def packed_costreg_forward(params: dict, stats: dict, vol: jnp.ndarray,
                           base_channels: int = 8,
                           interpret: bool = False) -> jnp.ndarray:
    """One batch element of the row-packed CostRegNet inference forward.

    vol (D, h, w, C) → logits (D, h, w).  Every 3-D conv runs as per-D-tap
    row-packed 2-D Pallas kernels (ops/pallas/plane_conv.py) with the D taps
    composed at the XLA boundary:

      conv3d s=1:  out[d]  = Σ_t conv2d(x[d+t−1], k[t])       (conv_head)
      conv3d s=2:  out[do] = Σ_t conv2d(x[2do+t−1], k[t])     (conv_dn)
      convT3d s=2: out[2m]   = convT2d(x[m],   k[1])          (deconv_up)
                   out[2m+1] = convT2d(x[m+1], k[0]) + convT2d(x[m], k[2])

    (derivations verified vs lax conv3d/conv_transpose, NOTES round-5).
    Inference BatchNorm folds into the kernels' output channels + a bias
    (+ReLU) applied at the XLA boundary.  Rationale: XLA's conv3d emitters
    run the whole 83 ms CostRegNet conv stack at <5% MXU for these C=8..64
    volume shapes (traced cost map) — the same lane-starvation the RED
    pipeline escaped with these W-in-lanes kernels."""
    from ..ops.pallas import plane_conv as pcv

    d, h, w, cin = vol.shape
    f32 = lambda t: t.astype(jnp.float32)

    def conv_w(name):
        """BN-folded ConvBlock weights: (kernel (3,3,3,ci,co)·scale, bias)."""
        k = f32(params[name]["Conv_0"]["kernel"])
        sc, bias = _bn_fold(
            jax.tree.map(f32, params[name]["BatchNorm_0"]),
            jax.tree.map(f32, stats[name]["BatchNorm_0"]),
        )
        return k * sc, bias

    def deconv_w(name):
        """BN-folded DeconvBlock weights: kernel (3,3,3,co,ci) (transposed
        layout — scale over axis 3), bias."""
        k = f32(params[name]["ConvTranspose_0"]["kernel"])
        sc, bias = _bn_fold(
            jax.tree.map(f32, params[name]["BatchNorm_0"]),
            jax.tree.map(f32, stats[name]["BatchNorm_0"]),
        )
        return k * sc[:, None], bias

    def shift_prev(x):  # plane d reads x[d-1]
        return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]])

    def shift_next(x):  # plane d reads x[d+1]
        return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])])

    def bias_relu(y, bias, relu=True):
        y = y + bias[None, None, :, None]
        return jnp.maximum(y, 0.0) if relu else y

    def c3d_s1(xpk, k3d, bias, hh, ww, relu=True):
        cout = k3d.shape[-1]
        zb = jnp.zeros((cout,), jnp.float32)
        taps = (shift_prev(xpk), xpk, shift_next(xpk))
        y = None
        for t in range(3):
            yt = pcv.conv_head(taps[t], k3d[t], zb, hh, ww,
                               interpret=interpret)
            y = yt if y is None else y + yt
        return bias_relu(y, bias, relu)

    def c3d_s2(xpk, k3d, bias, hh, ww):
        dd = xpk.shape[0]
        xp_d = jnp.concatenate(
            [jnp.zeros_like(xpk[:1]), xpk, jnp.zeros_like(xpk[:1])])
        y = None
        for t in range(3):
            xs = xp_d[t:t + dd:2]                      # (D/2, ...) planes
            yt = pcv.conv_dn(*pcv.split_cols(xs), k3d[t], hh, ww,
                             relu=False, interpret=interpret)
            y = yt if y is None else y + yt
        return bias_relu(y, bias)

    def d3dT(xpk, kt3d, bias, hh, ww, skip):
        dd = xpk.shape[0]
        up = lambda x, kt: pcv.deconv_up(x, kt, hh, ww, relu=False,
                                         interpret=interpret)
        ee, eo = up(xpk, kt3d[1])
        o1e, o1o = up(shift_next(xpk), kt3d[0])
        o2e, o2o = up(xpk, kt3d[2])
        even = pcv.merge_cols(ee, eo)
        odd = pcv.merge_cols(o1e + o2e, o1o + o2o)
        y = jnp.stack([even, odd], axis=1).reshape((2 * dd,) + even.shape[1:])
        return bias_relu(y, bias) + skip

    xp = pcv.pack_planes(f32(vol))
    conv0 = c3d_s1(xp, *conv_w("ConvBlock_0"), h, w)
    down1 = c3d_s2(conv0, *conv_w("ConvBlock_1"), h, w)
    conv2 = c3d_s1(down1, *conv_w("ConvBlock_2"), h // 2, w // 2)
    down3 = c3d_s2(conv2, *conv_w("ConvBlock_3"), h // 2, w // 2)
    conv4 = c3d_s1(down3, *conv_w("ConvBlock_4"), h // 4, w // 4)
    down5 = c3d_s2(conv4, *conv_w("ConvBlock_5"), h // 4, w // 4)
    x = c3d_s1(down5, *conv_w("ConvBlock_6"), h // 8, w // 8)
    x = d3dT(x, *deconv_w("DeconvBlock_0"), h // 8, w // 8, conv4)
    x = d3dT(x, *deconv_w("DeconvBlock_1"), h // 4, w // 4, conv2)
    x = d3dT(x, *deconv_w("DeconvBlock_2"), h // 2, w // 2, conv0)
    head_k = f32(params["Conv_0"]["kernel"])
    lg = c3d_s1(x, head_k, jnp.zeros((1,), jnp.float32), h, w, relu=False)
    # 1-channel row-packed output keeps rows in order → plain reshape
    return lg.reshape(d, h, w)


class CostRegNet(nn.Module):
    base_channels: int = 8
    dtype: object = None  # compute dtype (e.g. bf16); params + norms stay fp32
    # row-packed Pallas inference forward (packed_costreg_forward): None =
    # auto (on when the backend is TPU and the geometry is feasible); the
    # training/init path always uses the XLA convs (the packed form has no
    # VJP and folds inference BatchNorm)
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        dt = self.dtype
        fused = (jax.default_backend() == "tpu"
                 if self.fused is None else bool(self.fused))
        batch, d, dh, dw, cin = x.shape
        if (fused and not train and not self.is_initializing()
                and packed_costreg_feasible(dh, dw, cin, b, d)):
            p = self.variables["params"]
            s = self.variables["batch_stats"]
            return jnp.stack([
                packed_costreg_forward(p, s, x[i], b) for i in range(batch)
            ]).astype(jnp.float32)
        # sequential statements so flax module names follow dataflow order
        # (conv0..conv6 ↔ ConvBlock_0..6 — the converter relies on this)
        conv0 = ConvBlock(b, 3, dims=3, dtype=dt)(x, train)
        down1 = ConvBlock(b * 2, 3, stride=2, dims=3, dtype=dt)(conv0, train)
        conv2 = ConvBlock(b * 2, 3, dims=3, dtype=dt)(down1, train)
        down3 = ConvBlock(b * 4, 3, stride=2, dims=3, dtype=dt)(conv2, train)
        conv4 = ConvBlock(b * 4, 3, dims=3, dtype=dt)(down3, train)
        down5 = ConvBlock(b * 8, 3, stride=2, dims=3, dtype=dt)(conv4, train)
        x = ConvBlock(b * 8, 3, dims=3, dtype=dt)(down5, train)
        x = conv4 + DeconvBlock(b * 4, 3, dims=3, dtype=dt)(x, train)
        x = conv2 + DeconvBlock(b * 2, 3, dims=3, dtype=dt)(x, train)
        x = conv0 + DeconvBlock(b, 3, dims=3, dtype=dt)(x, train)
        # the 1-channel logit head runs the same 2-D-decomposed conv path
        # (the native cout=1 conv3d traced at 7-15 ms/stage — NOTES round-5)
        logits = Conv3DVia2D(1, (3, 3, 3), padding=[(1, 1)] * 3,
                             use_bias=False, name="Conv_0")(x)
        return logits[..., 0].astype(jnp.float32)  # (B, D, H, W)
