"""Shared multi-scale feature encoder (unet / fpn decoder modes).

Counterpart of FeatureNet (/root/reference/modules/module.py:442-543):
stride-4 encoder (two stride-2 5×5 convs), 3 output scales with channel
widths [4b, 2b, b] — stage 1 is 1/4 resolution, stage 3 full resolution.
Channels-last; returns a list [stage1, stage2, ..] coarsest-first.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import ConvBlock, DeconvFuse


class FeatureNet(nn.Module):
    base_channels: int = 8
    num_stage: int = 3
    arch_mode: str = "unet"  # "unet" (RED models) or "fpn" (CasMVS default)
    dtype: object = None  # conv compute dtype (e.g. jnp.bfloat16); params and
    # the returned feature maps stay fp32 (the sweep kernels and the variance
    # moments are fp32)

    @property
    def out_channels(self) -> list[int]:
        b = self.base_channels
        return [4 * b, 2 * b, b][: self.num_stage]

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.arch_mode in ("unet", "fpn")
        b = self.base_channels
        dt = self.dtype

        conv0 = ConvBlock(b, 3, dtype=dt)(x, train)
        conv0 = ConvBlock(b, 3, dtype=dt)(conv0, train)

        conv1 = ConvBlock(b * 2, 5, stride=2, dtype=dt)(conv0, train)
        conv1 = ConvBlock(b * 2, 3, dtype=dt)(conv1, train)
        conv1 = ConvBlock(b * 2, 3, dtype=dt)(conv1, train)

        conv2 = ConvBlock(b * 4, 5, stride=2, dtype=dt)(conv1, train)
        conv2 = ConvBlock(b * 4, 3, dtype=dt)(conv2, train)
        conv2 = ConvBlock(b * 4, 3, dtype=dt)(conv2, train)

        outputs = [nn.Conv(b * 4, (1, 1), use_bias=False, dtype=dt)(conv2)]
        if self.num_stage == 1:
            return [o.astype(jnp.float32) for o in outputs]

        if self.arch_mode == "unet":
            intra = DeconvFuse(b * 2, dtype=dt)(conv1, conv2, train)
            outputs.append(nn.Conv(b * 2, (1, 1), use_bias=False, dtype=dt)(intra))
            if self.num_stage == 3:
                intra = DeconvFuse(b, dtype=dt)(conv0, intra, train)
                outputs.append(nn.Conv(b, (1, 1), use_bias=False, dtype=dt)(intra))
        else:  # fpn: nearest-upsample + lateral 1x1, 3x3 heads
            final_chs = b * 4
            intra = _upsample2x(conv2) + nn.Conv(final_chs, (1, 1), use_bias=True,
                                                 dtype=dt)(conv1)
            head_chs = b * 2 if self.num_stage == 3 else b
            outputs.append(
                nn.Conv(head_chs, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=dt)(intra)
            )
            if self.num_stage == 3:
                intra = _upsample2x(intra) + nn.Conv(final_chs, (1, 1), use_bias=True,
                                                     dtype=dt)(conv0)
                outputs.append(
                    nn.Conv(b, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=dt)(intra)
                )
        return [o.astype(jnp.float32) for o in outputs]


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample of (B, H, W, C)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
