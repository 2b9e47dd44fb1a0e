"""Recurrent Encoder-Decoder (RED) cost regularization as a `lax.scan`.

Counterpart of RED_Regularization / slice_RED_Regularization
(/root/reference/modules/module.py:595-693).  The reference iterates depth
planes with a Python for-loop (train) or streams one plane per call (infer);
here ONE step module (`REDStep`) serves both:

  * `REDRegularizer` — nn.scan of REDStep over the depth axis of a full
    (B, D, H, W, C) variance volume, producing (B, D, H, W) logits.  This is
    the train/test form.
  * streaming inference (infer/predict.py) scans REDStep together with the
    per-plane warp and an online-softmax carry, so the full volume never
    materializes (the reference's compute_depth_when_pred design,
    casred.py:161-238).

Per plane: a 3-level strided conv pyramid over the negated cost, a ConvGRU at
each of 4 scales carrying state across planes, transposed-conv decoding with
additive skips, 1-channel logit head.  H, W must be divisible by 8.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ConvBlock, ConvGRUCell, DeconvBlock

REDStates = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def init_red_states(batch: int, height: int, width: int, base_channels: int = 8,
                    dtype=jnp.float32) -> REDStates:
    """Zero GRU states at the 4 pyramid scales (ref module.py:617-620)."""
    b = base_channels
    return tuple(
        jnp.zeros((batch, height // s, width // s, b * s), dtype)
        for s in (1, 2, 4, 8)
    )


class REDStep(nn.Module):
    """One depth-plane regularization step: (states, cost) → (states, logits).

    cost: (B, H, W, C) variance-cost slice; logits: (B, H, W).
    Layer inventory mirrors module.py:595-649 (ConvReLU encoders and
    ConvTransReLU decoders are bias-free; the final head has bias).
    """

    base_channels: int = 8

    @nn.compact
    def __call__(self, states: REDStates, cost: jnp.ndarray):
        s1, s2, s3, s4 = states
        b = self.base_channels
        neg = -cost

        c1 = ConvBlock(b * 2, 3, stride=2, norm="none", use_bias=False)(neg)
        c2 = ConvBlock(b * 4, 3, stride=2, norm="none", use_bias=False)(c1)
        c3 = ConvBlock(b * 8, 3, stride=2, norm="none", use_bias=False)(c2)

        r4, s4 = ConvGRUCell(b * 8)(c3, s4)
        u3 = DeconvBlock(b * 4, 3, norm="none", use_bias=False)(r4)
        r3, s3 = ConvGRUCell(b * 4)(c2, s3)
        u2 = DeconvBlock(b * 2, 3, norm="none", use_bias=False)(u3 + r3)
        r2, s2 = ConvGRUCell(b * 2)(c1, s2)
        u1 = DeconvBlock(b, 3, norm="none", use_bias=False)(u2 + r2)
        r1, s1 = ConvGRUCell(b)(neg, s1)

        logits = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)(u1 + r1)
        return (s1, s2, s3, s4), logits[..., 0]


class REDRegularizer(nn.Module):
    """Full-volume form: (B, D, H, W, C) variance volume → (B, D, H, W) logits."""

    base_channels: int = 8

    @nn.compact
    def __call__(self, volume: jnp.ndarray) -> jnp.ndarray:
        batch, _, height, width, _ = volume.shape
        states = init_red_states(batch, height, width, self.base_channels, volume.dtype)
        scanned = nn.scan(
            REDStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(base_channels=self.base_channels)
        _, logits = scanned(states, volume)
        return logits
