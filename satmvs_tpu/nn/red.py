"""Recurrent Encoder-Decoder (RED) cost regularization as a `lax.scan`.

Counterpart of RED_Regularization / slice_RED_Regularization
(/root/reference/modules/module.py:595-693).  The reference iterates depth
planes with a Python for-loop (train) or streams one plane per call (infer);
here ONE step module (`REDStep`) serves both:

  * `REDRegularizer` — the train/full-volume form.  The per-plane encoder
    convs (conv1-3) don't touch the recurrent state, so they are *hoisted out
    of the scan* and run once, batched over all D planes (one large MXU-
    friendly conv batch instead of D small sequential ones).  The decoder
    deconvs + head only couple the scales of one plane (never across planes),
    so they are hoisted out the same way; ONLY the 4 ConvGRU cells — the
    irreducibly sequential recurrence — stay inside the nn.scan over depth.
  * streaming inference (infer/predict.py) calls the same `REDStep.__call__`
    (encode + recur fused) per plane with explicit carried state, matching
    the reference's compute_depth_when_pred design (casred.py:161-238).

Submodule names are pinned so the parameter tree is identical to the
original compact layout ("ScanREDStep_0"/ConvBlock_0.. etc.) — streaming
inference and the reference-checkpoint converter (train/convert.py) rely on
it.

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
    dtype: object = None  # compute dtype of the hoisted (non-recurrent)
    # encoder/decoder/x-contrib convs; the in-scan recurrence stays fp32

    def setup(self):
        b = self.base_channels
        dt = self.dtype
        # names pinned to the historical compact auto-names (ckpt compat)
        self.enc1 = ConvBlock(b * 2, 3, stride=2, norm="none", use_bias=False,
                              dtype=dt, name="ConvBlock_0")
        self.enc2 = ConvBlock(b * 4, 3, stride=2, norm="none", use_bias=False,
                              dtype=dt, name="ConvBlock_1")
        self.enc3 = ConvBlock(b * 8, 3, stride=2, norm="none", use_bias=False,
                              dtype=dt, name="ConvBlock_2")
        self.gru4 = ConvGRUCell(b * 8, dtype=dt, name="ConvGRUCell_0")
        self.up3 = DeconvBlock(b * 4, 3, norm="none", use_bias=False,
                               dtype=dt, name="DeconvBlock_0")
        self.gru3 = ConvGRUCell(b * 4, dtype=dt, name="ConvGRUCell_1")
        self.up2 = DeconvBlock(b * 2, 3, norm="none", use_bias=False,
                               dtype=dt, name="DeconvBlock_1")
        self.gru2 = ConvGRUCell(b * 2, dtype=dt, name="ConvGRUCell_2")
        self.up1 = DeconvBlock(b, 3, norm="none", use_bias=False,
                               dtype=dt, name="DeconvBlock_2")
        self.gru1 = ConvGRUCell(b, dtype=dt, name="ConvGRUCell_3")
        self.head = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                            dtype=dt, name="Conv_0")

    def encode(self, cost: jnp.ndarray):
        """Recurrence-independent encoder pyramid of one (or many) planes."""
        neg = -cost
        c1 = self.enc1(neg)
        c2 = self.enc2(c1)
        c3 = self.enc3(c2)
        return neg, c1, c2, c3

    def x_contribs(self, neg, c1, c2, c3):
        """Recurrence-independent GRU input contributions per scale
        (conv_x halves of the cells' concat-convs — see ConvGRUCell)."""
        return (
            self.gru1.x_contrib(neg),
            self.gru2.x_contrib(c1),
            self.gru3.x_contrib(c2),
            self.gru4.x_contrib(c3),
        )

    def decode(self, r1, r2, r3, r4):
        """Recurrence-independent decoder of one (or many) planes."""
        u3 = self.up3(r4)
        u2 = self.up2(u3 + r3)
        u1 = self.up1(u2 + r2)
        logits = self.head(u1 + r1)
        return logits[..., 0]

    def recur(self, states: REDStates, neg, c1, c2, c3):
        """Recurrent decode of one plane given its precomputed encoding.

        Uses the cells' concat-conv form (2 convs per cell — see
        ConvGRUCell.__call__): the depth scan is latency-bound by sequential
        op count, so fewer-but-wider convs beat the split halved-FLOP form
        here (measured 98 vs 108 ms full forward).  GRU/decoder ops are
        interleaved coarse→fine so each deconv can start as soon as its
        scale's recurrence finishes.
        """
        s1, s2, s3, s4 = states
        r4, s4 = self.gru4(c3, s4)
        u3 = self.up3(r4)
        r3, s3 = self.gru3(c2, s3)
        u2 = self.up2(u3 + r3)
        r2, s2 = self.gru2(c1, s2)
        u1 = self.up1(u2 + r2)
        r1, s1 = self.gru1(neg, s1)
        logits = self.head(u1 + r1)
        return (s1, s2, s3, s4), logits[..., 0]

    def __call__(self, states: REDStates, cost: jnp.ndarray):
        neg, c1, c2, c3 = self.encode(cost)
        return self.recur(states, neg, c1, c2, c3)


class REDRegularizer(nn.Module):
    """Full-volume form: (B, D, H, W, C) variance volume → (B, D, H, W) logits.

    fused=True (TPU): each scale's ConvGRU depth recurrence runs as ONE
    Pallas kernel with the hidden state resident in VMEM
    (ops/pallas/red_recur.py) instead of an XLA lax.scan; the kernel has a
    custom VJP (reverse-grid adjoint), so training uses it too.
    """

    base_channels: int = 8
    dtype: object = None  # compute dtype of the hoisted encoder/decoder convs

    @nn.compact
    def __call__(self, volume: jnp.ndarray, fused: bool = False) -> jnp.ndarray:
        batch, d, height, width, cin = volume.shape
        step = REDStep(self.base_channels, dtype=self.dtype, name="ScanREDStep_0")

        # hoisted encoder: one batched pass over all planes (large MXU-
        # friendly convs instead of D sequential ones)
        flat = volume.reshape(batch * d, height, width, cin)
        pyr = step.encode(flat)

        if fused and not self.is_initializing():
            # the fused kernels consume the raw per-scale encoder outputs and
            # compute the cells' input conv (x_contrib) in-kernel — only the
            # C-channel x crosses the NHWC → W-in-lanes layout boundary
            enc = tuple(
                t.astype(jnp.float32).reshape(batch, d, *t.shape[1:])
                for t in pyr
            )
            from ..ops.pallas.red_recur import cell_params_matrices, red_recur

            cells = self.variables["params"]["ScanREDStep_0"]
            # gru1..gru4 ↔ ConvGRUCell_3..0 (creation order, nn/red.REDStep)
            mats = [cell_params_matrices(cells[f"ConvGRUCell_{k}"])
                    for k in (3, 2, 1, 0)]
            rs = tuple(
                jnp.stack([red_recur(x[b], *m) for b in range(batch)])
                for x, m in zip(enc, mats)
            )
            flat_rs = [r.reshape(batch * d, *r.shape[2:]) for r in rs]
            # decoder: batched over all planes at once
            logits = step.decode(*flat_rs).astype(jnp.float32)
            return logits.reshape(batch, d, height, width)

        # scan path (training + CPU): streams the raw encoder pyramid
        # (15·HW floats/plane; streaming precomputed xc instead is 45·HW and
        # measured ~10% slower end-to-end) and carries the GRU recurrences +
        # the cheap in-plane decode.  Only the logits map leaves the scan
        # (stacking the 4 per-scale GRU outputs costs a further ~2%).
        enc = tuple(t.reshape(batch, d, *t.shape[1:]) for t in pyr)
        states = init_red_states(
            batch, height, width, self.base_channels, volume.dtype
        )
        scanned = nn.scan(
            lambda mdl, carry, xs: mdl.recur(carry, *xs),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, logits = scanned(step, states, enc)
        return logits.astype(jnp.float32)
