"""Shared building blocks: conv/BN/ReLU, residual blocks, heads.

Structural parity targets: BasicBlock / Bottleneck
(deep_hrnet/lib/models/pose_hrnet.py:29-101), the SimpleBaseline deconv head
(pose_resnet.py:168-193), and the pixel-shuffle decoder
(lib/models/decoders/pixelshuffle.py:7-31, DUC.py:9-28).

Layout is NHWC (TPU-native); BatchNorm momentum 0.9 == torch 0.1
(pose_hrnet.py:19 BN_MOMENTUM with the inverted convention), eps 1e-5.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # flax convention: ema = m*ema + (1-m)*batch  (torch 0.1)


class ConvBN(nn.Module):
    """Conv → BatchNorm (+ optional ReLU)."""
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (pose_hrnet.py:29-59); optional PSA insert
    ``deattn`` between conv1 and conv2 (pose_hrnet_psa.py:37,:49)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    attention: Optional[Callable[..., nn.Module]] = None
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, 3, self.stride, relu=True,
                     dtype=self.dtype, name="cb1")(x, train)
        if self.attention is not None:
            out = self.attention(self.planes, dtype=self.dtype,
                                 name="deattn")(out)
        out = ConvBN(self.planes, 3, 1, relu=False,
                     dtype=self.dtype, name="cb2")(out, train)
        if self.downsample:
            residual = ConvBN(self.planes, 1, self.stride, relu=False,
                              dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 residual block, expansion 4 (pose_hrnet.py:62-101)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    attention: Optional[Callable[..., nn.Module]] = None
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, 1, 1, relu=True, dtype=self.dtype,
                     name="cb1")(x, train)
        out = ConvBN(self.planes, 3, self.stride, relu=True, dtype=self.dtype,
                     name="cb2")(out, train)
        if self.attention is not None:
            out = self.attention(self.planes, dtype=self.dtype,
                                 name="attn")(out)
        out = ConvBN(self.planes * 4, 1, 1, relu=False, dtype=self.dtype,
                     name="cb3")(out, train)
        if self.downsample:
            residual = ConvBN(self.planes * 4, 1, self.stride, relu=False,
                              dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(3, 2, padding=1) parity (NHWC)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def upsample_nearest(x, factor: int):
    """Exact nearest ×factor upsample (torch nn.Upsample mode='nearest')."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def add_upsampled(acc, y, factor: int):
    """``acc + upsample_nearest(y, factor)`` without materializing the
    upsampled tensor.

    The HRNet fuse-add is the hot consumer (hrnet.py): XLA materializes
    ``jnp.repeat``'s broadcast as a standalone full-resolution HBM write
    running at 14-30% of its own HBM roofline (tools/profile_roofline.py;
    DESIGN.md round-5).  The shipped formulation replicates WIDTH with a
    concatenate (memcpy-class emitter, writes only the 1/factor-height
    intermediate) and folds the HEIGHT replication into the add through
    a free row-major blocked view of ``acc``.  Measured on the isolated
    w48 last-module fuse-add (48x96x72x192 bf16): repeat 1.83 ms →
    blocked view 1.27 ms → **concat-w + blocked-h 0.97 ms** (all three
    bit-identical; asserted in the A/B).  Elementwise math equals
    ``upsample_nearest(y, factor) + acc`` exactly (same pairs, same
    order).
    """
    if factor == 1:
        return acc + y
    B, H, W, C = acc.shape
    _, h, w, _ = y.shape
    u = jnp.concatenate([y[:, :, :, None, :]] * factor,
                        axis=3).reshape(B, h, W, C)
    out = acc.reshape(B, h, factor, W, C) + u[:, :, None, :, :]
    return out.reshape(B, H, W, C)


class DeconvHead(nn.Module):
    """SimpleBaseline head: N × (ConvTranspose s2 + BN + ReLU)
    (pose_resnet.py:168-193; kernel/pad table :156-166)."""
    num_filters: Sequence[int] = (256, 256, 256)
    num_kernels: Sequence[int] = (4, 4, 4)
    with_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, k) in enumerate(zip(self.num_filters, self.num_kernels)):
            # torch (k=4,p=1,op=0), (k=3,p=1,op=1), (k=2,p=0,op=0) all give
            # exact 2x; lax conv_transpose 'SAME' matches that geometry.
            x = nn.ConvTranspose(f, (k, k), strides=(2, 2), padding="SAME",
                                 use_bias=self.with_bias, dtype=self.dtype,
                                 name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=1e-5,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class DUC(nn.Module):
    """Dense Upsampling Conv: conv-BN-ReLU then ×2 pixel shuffle
    (decoders/DUC.py:9-28)."""
    planes: int          # channels *before* the shuffle (must be 4k)
    upscale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.planes, 3, 1, relu=True, dtype=self.dtype,
                   name="cb")(x, train)
        return pixel_shuffle(x, self.upscale)


def pixel_shuffle(x, factor: int):
    """NHWC pixel shuffle (torch nn.PixelShuffle channel-order parity).

    torch shuffles NCHW (C r² , H, W) → (C, H r, W r) with channel-major
    blocks; in NHWC the equivalent reshape keeps (C, r, r) ordering on the
    last axis.
    """
    B, H, W, C = x.shape
    r = factor
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, c
    return x.reshape(B, H * r, W * r, c)


class PixelShuffleDecoder(nn.Module):
    """Bias-free 1×1 compress + DUC chain (decoders/pixelshuffle.py:7-31).

    ``architecture[i]`` is the conv width of DUC i (÷4 after each ×2
    shuffle); default (512, 256, 128) gives the ×8 upsample with 32 output
    channels used by the mobile backbones.
    """
    start_channels: int = 256
    architecture: Sequence[int] = (512, 256, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.start_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_compress")(x)
        for i, planes in enumerate(self.architecture):
            x = DUC(planes, dtype=self.dtype, name=f"duc{i}")(x, train)
        return x
