"""YOLOv5 (v6.0 architecture) person detector in Flax NHWC.

The reference consumes yolov5 as a git *submodule* (.gitmodules:1-3,
inference_engine.py:36-37 ``attempt_load``) — the detector network is not
part of its own code either.  Here the full architecture is native so the
detect-then-pose path can be one jit graph: CSP backbone (6×6 stem, C3
blocks, SPPF), PANet head, anchor-based decode to the raw ``(B, N, 5+nc)``
prediction format consumed by ops/yolo.non_max_suppression.

Variants: n (d=0.33, w=0.25), s (0.33, 0.50), m (0.67, 0.75),
l (1.0, 1.0).  Weight conversion from ultralytics ``.pt`` files follows the
same Conv→(kh,kw,I,O) rules as utils/torch_convert (converter hookup left
for when checkpoint files are available).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ANCHORS = (  # per level (P3/8, P4/16, P5/32), (w, h) pixel units
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)

VARIANTS = {"n": (0.33, 0.25), "s": (0.33, 0.50), "m": (0.67, 0.75),
            "l": (1.0, 1.0)}


def _make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


def silu(x):
    return x * nn.sigmoid(x)


class ConvBnSiLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.features, 1, dtype=self.dtype,
                       name="cv1")(x, train)
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype,
                       name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class C3(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        a = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, dtype=self.dtype,
                           name=f"m{i}")(a, train)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype,
                          name="cv3")(jnp.concatenate([a, b], -1), train)


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2
        mp = lambda v: nn.max_pool(v, (self.pool, self.pool),   # noqa: E731
                                   strides=(1, 1),
                                   padding=((p, p), (p, p)))
        y1 = mp(x)
        y2 = mp(y1)
        y3 = mp(y2)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], -1), train)


def _up2(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class YOLOv5(nn.Module):
    """Returns raw sigmoided predictions (B, N, 5+nc), xywh in pixels."""
    variant: str = "n"
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, w = VARIANTS[self.variant]
        ch = lambda c: _make_divisible(c * w)            # noqa: E731
        dn = lambda n: max(round(n * d), 1)              # noqa: E731

        x = ConvBnSiLU(ch(64), 6, 2, dtype=self.dtype, name="b0")(x, train)
        x = ConvBnSiLU(ch(128), 3, 2, dtype=self.dtype, name="b1")(x, train)
        x = C3(ch(128), dn(3), dtype=self.dtype, name="b2")(x, train)
        x = ConvBnSiLU(ch(256), 3, 2, dtype=self.dtype, name="b3")(x, train)
        p3 = C3(ch(256), dn(6), dtype=self.dtype, name="b4")(x, train)
        x = ConvBnSiLU(ch(512), 3, 2, dtype=self.dtype, name="b5")(p3, train)
        p4 = C3(ch(512), dn(9), dtype=self.dtype, name="b6")(x, train)
        x = ConvBnSiLU(ch(1024), 3, 2, dtype=self.dtype, name="b7")(p4, train)
        x = C3(ch(1024), dn(3), dtype=self.dtype, name="b8")(x, train)
        p5 = SPPF(ch(1024), 5, dtype=self.dtype, name="b9")(x, train)

        # PANet
        h10 = ConvBnSiLU(ch(512), 1, dtype=self.dtype, name="h10")(p5, train)
        x = jnp.concatenate([_up2(h10), p4], -1)
        h13 = C3(ch(512), dn(3), False, dtype=self.dtype, name="h13")(x, train)
        h14 = ConvBnSiLU(ch(256), 1, dtype=self.dtype, name="h14")(h13, train)
        x = jnp.concatenate([_up2(h14), p3], -1)
        out3 = C3(ch(256), dn(3), False, dtype=self.dtype,
                  name="h17")(x, train)
        x = ConvBnSiLU(ch(256), 3, 2, dtype=self.dtype, name="h18")(out3, train)
        out4 = C3(ch(512), dn(3), False, dtype=self.dtype,
                  name="h20")(jnp.concatenate([x, h14], -1), train)
        x = ConvBnSiLU(ch(512), 3, 2, dtype=self.dtype, name="h21")(out4, train)
        out5 = C3(ch(1024), dn(3), False, dtype=self.dtype,
                  name="h23")(jnp.concatenate([x, h10], -1), train)

        # Detect head + anchor decode
        preds = []
        no = 5 + self.num_classes
        for li, feat in enumerate((out3, out4, out5)):
            na = len(ANCHORS[li])
            t = nn.Conv(na * no, (1, 1), dtype=self.dtype,
                        name=f"detect{li}")(feat)
            B, H, W, _ = t.shape
            t = t.reshape(B, H, W, na, no).astype(jnp.float32)
            t = nn.sigmoid(t)
            gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
            stride = float(STRIDES[li])
            anchors = jnp.asarray(ANCHORS[li], jnp.float32)  # (na, 2)
            xy = (t[..., 0:2] * 2.0 - 0.5
                  + jnp.stack([gx, gy], -1)[:, :, None, :]) * stride
            wh = (t[..., 2:4] * 2.0) ** 2 * anchors[None, None, :, :]
            pred = jnp.concatenate([xy, wh, t[..., 4:]], -1)
            preds.append(pred.reshape(B, H * W * na, no))
        return jnp.concatenate(preds, axis=1)
