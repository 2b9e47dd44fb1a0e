"""Flax building blocks (channels-last) — reference L3 counterparts.

Re-designs /root/reference/modules/module.py for NHWC/NDHWC and functional
norm handling.  Conventions:
  * all activations channels-last; 2-D blocks take (B, H, W, C), 3-D blocks
    (B, D, H, W, C) — XLA:TPU's native conv layouts.
  * torch-style explicit padding (kernel 3 → pad 1, kernel 5 → pad 2) so
    output sizes and receptive-field geometry match the reference exactly.
  * BatchNorm carries running stats in the `batch_stats` collection
    (train=True updates them); GroupNorm variants are stateless.

The reference's dead/broken modules (RefineNet's F.cat, ChannelAttentionModule,
the bn=None fallthrough of Deconv2d/3d, unused Hourglass3d — SURVEY.md §2 C6)
are intentionally not reproduced.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pad(kernel_size: int) -> int:
    return kernel_size // 2


class Conv3DVia2D(nn.Conv):
    """3-D conv computed as a sum of per-D-tap 2-D convs (D folded into the
    batch axis).

    XLA:TPU's conv3d emitter picks `EmitAllBatchInSublanes` for the
    CostRegNet volume shapes (traced: 29/29 convs, 1-15 ms each at <1% MXU —
    NOTES round-5); the identical contraction as kd 2-D convs over D-shifted
    slices runs the well-tuned image-conv emitters (the FeatureNet path).
    conv3d(x, k) = Σ_t conv2d(x[:, t-pad : t-pad+D·s : s], k[t]) — exact up
    to f32 reassociation (~1e-5, verified for stride 1 and 2).

    Keeps nn.Conv's exact parameter contract (kernel (kd, kh, kw, Cin, Cout),
    optional bias) so checkpoints and the reference converter are unchanged;
    call sites pass name="Conv_0" to preserve flax auto-names."""

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        sd, sh, sw = (self.strides if isinstance(self.strides, (tuple, list))
                      else (self.strides,) * 3)
        b, d, h, w, cin = x.shape
        assert d % sd == 0, (d, sd)
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, cin, self.features),
            self.param_dtype,
        )
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from flax.linen import dtypes as _dtypes

        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        pd = kd // 2
        do = d // sd
        xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
        y = None
        for t in range(kd):
            xs = xp[:, t::sd][:, :do] if sd > 1 else xp[:, t:t + d]
            yt = jax.lax.conv_general_dilated(
                xs.reshape(b * do, h, w, cin), kernel[t], (sh, sw),
                [(kh // 2, kh // 2), (kw // 2, kw // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = yt if y is None else y + yt
        y = y.reshape(b, do, h // sh, w // sw, self.features)
        if bias is not None:
            y = y + bias
        return y


class ConvTranspose3DVia2D(nn.ConvTranspose):
    """Transposed 3-D conv (kernel 3, stride 2, torch-exact padding) as
    per-D-parity 2-D transposed convs — same rationale/limits as
    `Conv3DVia2D`; derivation verified vs lax.conv_transpose:
    even D outputs = convT2d(x[m], k[1]); odd = convT2d(x[m+1], k[0]) +
    convT2d(x[m], k[2]); interleave even-first."""

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        assert (kd, self.strides[0]) == (3, 2), "derivation fixed at k=3,s=2"
        b, d, h, w, cin = x.shape
        # transpose_kernel=True layout: (*k, features, in) — matches
        # nn.ConvTranspose so converted checkpoints drop in unchanged
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, self.features, cin),
            self.param_dtype,
        )
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from flax.linen import dtypes as _dtypes

        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        lo = kh - 1 - kh // 2
        pad2 = [(lo, lo + 1)] * 2

        def t2d(xs, wt):
            return jax.lax.conv_transpose(
                xs.reshape(-1, h, w, cin), wt, (2, 2), pad2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )

        x_next = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:]
        even = t2d(x, kernel[1]).reshape(b, d, 2 * h, 2 * w, self.features)
        odd = (t2d(x_next, kernel[0]) + t2d(x, kernel[2])).reshape(
            b, d, 2 * h, 2 * w, self.features)
        y = jnp.stack([even, odd], axis=2).reshape(
            b, 2 * d, 2 * h, 2 * w, self.features)
        if bias is not None:
            y = y + bias
        return y


class ConvBlock(nn.Module):
    """Conv → (norm) → (ReLU).  `dims` chooses 2-D or 3-D.

    norm: "bn" | "gn" | "none".  Counterpart of Conv2d/Conv3d/ConvBnReLU/
    ConvGnReLU (/root/reference/modules/module.py:78-119,168-194,218-269).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dims: int = 2
    norm: str = "bn"
    relu: bool = True
    bn_momentum: float = 0.9  # flax momentum = 1 − torch momentum (torch 0.1)
    use_bias: bool | None = None  # default: bias iff no norm
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel_size,) * self.dims
        p = _pad(self.kernel_size)
        bias = (self.norm == "none") if self.use_bias is None else self.use_bias
        conv_cls = Conv3DVia2D if self.dims == 3 else nn.Conv
        x = conv_cls(
            self.features,
            k,
            strides=(self.stride,) * self.dims,
            padding=[(p, p)] * self.dims,
            use_bias=bias,
            dtype=self.dtype,
            name="Conv_0",
        )(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum
            )(x)
        elif self.norm == "gn":
            groups = max(1, self.features // 8)
            x = nn.GroupNorm(num_groups=groups, epsilon=1e-5)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBlock(nn.Module):
    """Transposed conv ×2 upsample → (norm) → (ReLU).

    Counterpart of Deconv2d/Deconv3d/ConvTransReLU (module.py:121-165,197-215).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    dims: int = 2
    norm: str = "bn"
    relu: bool = True
    bn_momentum: float = 0.9
    use_bias: bool | None = None  # default: bias iff no norm
    dtype: object = None  # compute dtype; params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = (self.norm == "none") if self.use_bias is None else self.use_bias
        # torch-exact ConvTranspose semantics (kernel k, stride s, padding k//2,
        # output_padding s−1): pad (k−1−k//2, k−1−k//2+s−1) per spatial dim with
        # transpose_kernel=True — bit-equal to nn.ConvTranspose2d/3d, so
        # reference checkpoints convert exactly (see train/convert.py).
        k = self.kernel_size
        lo = k - 1 - k // 2
        pad = [(lo, lo + self.stride - 1)] * self.dims
        deconv_cls = (ConvTranspose3DVia2D
                      if self.dims == 3 and (k, self.stride) == (3, 2)
                      else nn.ConvTranspose)
        x = deconv_cls(
            self.features,
            (k,) * self.dims,
            strides=(self.stride,) * self.dims,
            padding=pad,
            transpose_kernel=True,
            use_bias=bias,
            dtype=self.dtype,
            name="ConvTranspose_0",
        )(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum
            )(x)
        elif self.norm == "gn":
            groups = max(1, self.features // 8)
            x = nn.GroupNorm(num_groups=groups, epsilon=1e-5)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvGRUCell(nn.Module):
    """Convolutional GRU with GroupNorm-ed gates and tanh candidate.

    Counterpart of ConvGRUCell2 (/root/reference/modules/module.py:6-58):
      r, u = σ(GN(conv([x, h])));  y = tanh(GN(conv([x, r·h])))
      out  = u·h + (1 − u)·y       (returned as both output and new state)

    TPU re-design: each concat-conv splits exactly by linearity into an
    x-half and an h-half — conv([x,h]) = conv_x(x) + conv_h(h) + bias.  The
    x-halves carry no recurrent state, so callers scanning the cell over a
    sequence (the RED depth scan) can precompute them for ALL steps in one
    large batched conv via `x_contrib`, leaving only the halved-FLOP h-convs
    inside the sequential scan (`recur`).  `Conv_x` packs the gates-x and
    candidate-x kernels into one 3·C-channel conv; biases live on the h-side
    convs so the sum is exactly the reference's concat-conv.
    """

    features: int
    kernel_size: int = 3
    dtype: object = None  # compute dtype of the batched x-side conv only
    # (x_contrib runs once over all planes — MXU/bandwidth heavy); the
    # recurrent h-side convs always run fp32: the GRU state feedback loop
    # compounds rounding across D steps.

    def setup(self):
        k = (self.kernel_size,) * 2
        p = _pad(self.kernel_size)
        pad = [(p, p)] * 2
        self.x_conv = nn.Conv(self.features * 3, k, padding=pad,
                              use_bias=False, dtype=self.dtype, name="Conv_x")
        self.gates_h_conv = nn.Conv(self.features * 2, k, padding=pad,
                                    use_bias=True, name="Conv_h")
        self.cand_h_conv = nn.Conv(self.features, k, padding=pad,
                                   use_bias=True, name="Conv_c")
        self.gn_r = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="GroupNorm_0")
        self.gn_u = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="GroupNorm_1")
        self.gn_y = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="GroupNorm_2")

    def x_contrib(self, x):
        """Recurrence-independent input contribution: (..., 3·features) =
        [gates-x (2C) | candidate-x (C)]."""
        return self.x_conv(x)

    def recur(self, xc, h):
        """One recurrent step given the precomputed input contribution."""
        c = self.features
        gates = xc[..., : 2 * c] + self.gates_h_conv(h)
        r, u = jnp.split(gates, 2, axis=-1)
        r = nn.sigmoid(self.gn_r(r))
        u = nn.sigmoid(self.gn_u(u))
        y = xc[..., 2 * c :] + self.cand_h_conv(r * h)
        y = jnp.tanh(self.gn_y(y))
        out = u * h + (1.0 - u) * y
        return out, out

    def __call__(self, x, h):
        """Concat-conv form: ONE conv per gate on concat([x, h]), built by
        concatenating the split kernels along input channels at trace time
        (loop-invariant, so XLA hoists the concat out of a depth scan).
        Mathematically identical to recur(x_contrib(x), h), but 2 convs per
        step instead of 3 — wins in the latency-bound RED depth scan where
        the sequential op count, not FLOPs, sets the clock (measured: 98 ms
        vs 108 ms full forward)."""
        if self.is_initializing():
            return self.recur(self.x_contrib(x), h)
        c = self.features
        p = self.variables["params"]
        wx = p["Conv_x"]["kernel"]
        pd = _pad(self.kernel_size)

        def conv(inp, kern):
            return jax.lax.conv_general_dilated(
                inp, kern.astype(inp.dtype), (1, 1), [(pd, pd)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        xh = jnp.concatenate([x, h], axis=-1)
        wg = jnp.concatenate([wx[..., : 2 * c], p["Conv_h"]["kernel"]], axis=2)
        gates = conv(xh, wg) + p["Conv_h"]["bias"]
        r, u = jnp.split(gates, 2, axis=-1)
        r = nn.sigmoid(self.gn_r(r))
        u = nn.sigmoid(self.gn_u(u))
        wc = jnp.concatenate([wx[..., 2 * c :], p["Conv_c"]["kernel"]], axis=2)
        y = conv(jnp.concatenate([x, r * h], axis=-1), wc) + p["Conv_c"]["bias"]
        y = jnp.tanh(self.gn_y(y))
        out = u * h + (1.0 - u) * y
        return out, out


class DeconvFuse(nn.Module):
    """Upsample + skip-concat + conv — the unet decoder step
    (DeConv2dFuse, module.py:303-321)."""

    features: int
    kernel_size: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x_skip, x, train: bool = False):
        x = DeconvBlock(self.features, self.kernel_size, norm="bn",
                        dtype=self.dtype)(x, train)
        x = jnp.concatenate([x, x_skip], axis=-1)
        x = ConvBlock(self.features, self.kernel_size, norm="bn",
                      dtype=self.dtype)(x, train)
        return x
