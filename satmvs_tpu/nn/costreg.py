"""3-D cost-volume regularization U-Net.

Counterpart of CostRegNet (/root/reference/modules/module.py:546-577):
3 stride-2 downsamples over (D, H, W), 3 transposed-conv upsamples with skip
additions, 1-channel logit head.  Channels-last (B, D, H, W, C); D, H, W must
be divisible by 8.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ConvBlock, DeconvBlock


class CostRegNet(nn.Module):
    base_channels: int = 8
    dtype: object = None  # compute dtype (e.g. bf16); params + norms stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        dt = self.dtype
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
        logits = nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False)(x)
        return logits[..., 0].astype(jnp.float32)  # (B, D, H, W)
