"""Mobile backbones in Flax NHWC: ShuffleNetV2, ShuffleNetV2+, MobileNetV3.

Structural parity:
* ShuffleNetV2   — backbones/shufflenetv2.py:33-207 (even/odd channel
  split, stride-2 dual-branch blocks, conv_last 1×1)
* ShuffleNetV2+  — backbones/shufflenetv2_plus.py:34-355 (HS activation,
  SE with hard-sigmoid, Shuffle3x3/5x5/7x7 + Xception blocks, fixed
  architecture list :356)
* MobileNetV3-Small — torchvision spec (the reference wraps
  torchvision.models.mobilenet_v3_small and strips the classifier,
  backbones/mobilenetv3.py:5-16); BN eps 1e-3 as in torchvision.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


def channel_split_even_odd(x):
    """The torch channel_shuffle trick (shufflenetv2.py:85-91): returns
    (even channels, odd channels)."""
    return x[..., 0::2], x[..., 1::2]


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "relu"     # relu | hs | none
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.bn_eps, dtype=self.dtype, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "hs":
            x = hard_swish(x)
        return x


class SEHardSigmoid(nn.Module):
    """ShuffleNetV2+ SELayer (shufflenetv2_plus.py:34-60): pooled 1×1
    conv→BN→ReLU→1×1 conv, hard-sigmoid gate."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.channels // 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc1")(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(a)
        a = nn.relu(a)
        a = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc2")(a)
        return x * hard_sigmoid(a)


class ShuffleV2Block(nn.Module):
    """shufflenetv2.py:33-91; ``act``/``use_se`` extend it to the '+'
    variant's Shufflenet block (shufflenetv2_plus.py:74-140)."""
    inp: int
    oup: int
    mid: int
    ksize: int = 3
    stride: int = 1
    act: str = "relu"
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = self.oup - self.inp
        if self.stride == 1:
            x_proj, b = channel_split_even_odd(x)
        else:
            x_proj, b = x, x
        m = _ConvBNAct(self.mid, 1, 1, act=self.act, dtype=self.dtype,
                       name="pw")(b, train)
        m = _ConvBNAct(self.mid, self.ksize, self.stride, groups=self.mid,
                       act="none", dtype=self.dtype, name="dw")(m, train)
        m = _ConvBNAct(outputs, 1, 1, act=self.act, dtype=self.dtype,
                       name="pwl")(m, train)
        if self.use_se:
            m = SEHardSigmoid(outputs, dtype=self.dtype, name="se")(m, train)
        if self.stride == 2:
            p = _ConvBNAct(self.inp, self.ksize, 2, groups=self.inp,
                           act="none", dtype=self.dtype,
                           name="proj_dw")(x_proj, train)
            x_proj = _ConvBNAct(self.inp, 1, 1, act=self.act,
                                dtype=self.dtype, name="proj_pw")(p, train)
        return jnp.concatenate([x_proj, m], axis=-1)


class ShuffleXception(nn.Module):
    """Shuffle_Xception (shufflenetv2_plus.py:143-219): dw-pw ×3 chain."""
    inp: int
    oup: int
    mid: int
    stride: int = 1
    act: str = "hs"
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = self.oup - self.inp
        if self.stride == 1:
            x_proj, b = channel_split_even_odd(x)
        else:
            x_proj, b = x, x
        m = _ConvBNAct(self.inp, 3, self.stride, groups=self.inp, act="none",
                       dtype=self.dtype, name="dw1")(b, train)
        m = _ConvBNAct(self.mid, 1, 1, act=self.act, dtype=self.dtype,
                       name="pw1")(m, train)
        m = _ConvBNAct(self.mid, 3, self.stride, groups=self.mid, act="none",
                       dtype=self.dtype, name="dw2")(m, train)
        m = _ConvBNAct(self.mid, 1, 1, act=self.act, dtype=self.dtype,
                       name="pw2")(m, train)
        m = _ConvBNAct(self.mid, 3, self.stride, groups=self.mid, act="none",
                       dtype=self.dtype, name="dw3")(m, train)
        m = _ConvBNAct(outputs, 1, 1, act=self.act, dtype=self.dtype,
                       name="pw3")(m, train)
        if self.use_se:
            m = SEHardSigmoid(outputs, dtype=self.dtype, name="se")(m, train)
        if self.stride == 2:
            p = _ConvBNAct(self.inp, 3, 2, groups=self.inp, act="none",
                           dtype=self.dtype, name="proj_dw")(x_proj, train)
            x_proj = _ConvBNAct(self.inp, 1, 1, act=self.act,
                                dtype=self.dtype, name="proj_pw")(p, train)
        return jnp.concatenate([x_proj, m], axis=-1)


SHUFFLENETV2_CHANNELS = {
    "0.5x": (24, 48, 96, 192, 1024),
    "1.0x": (24, 116, 232, 464, 1024),
    "1.5x": (24, 176, 352, 704, 1024),
    "2.0x": (24, 244, 488, 976, 2048),
}


class ShuffleNetV2(nn.Module):
    """shufflenetv2.py:95-207; returns stride-32 features (conv_last out)."""
    model_size: str = "1.0x"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = SHUFFLENETV2_CHANNELS[self.model_size]
        x = _ConvBNAct(chans[0], 3, 2, dtype=self.dtype,
                       name="first_conv")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = chans[0]
        bi = 0
        for si, repeats in enumerate((4, 8, 4)):
            out_ch = chans[si + 1]
            for i in range(repeats):
                if i == 0:
                    x = ShuffleV2Block(in_ch, out_ch, out_ch // 2, 3, 2,
                                       dtype=self.dtype,
                                       name=f"block{bi}")(x, train)
                else:
                    x = ShuffleV2Block(in_ch // 2, out_ch, out_ch // 2, 3, 1,
                                       dtype=self.dtype,
                                       name=f"block{bi}")(x, train)
                in_ch = out_ch
                bi += 1
        x = _ConvBNAct(chans[4], 1, 1, dtype=self.dtype,
                       name="conv_last")(x, train)
        return x


SHUFFLENETV2_PLUS_CHANNELS = {
    "Large": (16, 68, 168, 336, 672),
    "Medium": (16, 48, 128, 256, 512),
    "Small": (16, 36, 104, 208, 416),
}
# fixed block-type sequence (shufflenetv2_plus.py:356)
SHUFFLENETV2_PLUS_ARCH = (0, 0, 3, 1, 1, 1, 0, 0, 2, 0, 2, 1, 1, 0, 2, 0, 2,
                          1, 3, 2)


class ShuffleNetV2Plus(nn.Module):
    """shufflenetv2_plus.py:233-355; returns 1280-ch stride-32 features."""
    model_size: str = "Small"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = SHUFFLENETV2_PLUS_CHANNELS[self.model_size]
        x = _ConvBNAct(chans[0], 3, 2, act="hs", dtype=self.dtype,
                       name="first_conv")(x, train)
        in_ch = chans[0]
        ai = 0
        for si, repeats in enumerate((4, 4, 8, 4)):
            out_ch = chans[si + 1]
            act = "hs" if si >= 1 else "relu"
            use_se = si >= 2
            for i in range(repeats):
                inp = in_ch if i == 0 else in_ch // 2
                stride = 2 if i == 0 else 1
                btype = SHUFFLENETV2_PLUS_ARCH[ai]
                ai += 1
                if btype == 3:
                    x = ShuffleXception(inp, out_ch, out_ch // 2, stride,
                                        act, use_se, dtype=self.dtype,
                                        name=f"block{ai - 1}")(x, train)
                else:
                    ksize = {0: 3, 1: 5, 2: 7}[btype]
                    x = ShuffleV2Block(inp, out_ch, out_ch // 2, ksize,
                                       stride, act, use_se, dtype=self.dtype,
                                       name=f"block{ai - 1}")(x, train)
                in_ch = out_ch
        x = _ConvBNAct(1280, 1, 1, act="hs", dtype=self.dtype,
                       name="conv_last")(x, train)
        return x


# torchvision mobilenet_v3_small inverted-residual spec:
# (expand, out, kernel, stride, use_se, activation)
MOBILENETV3_SMALL_SPEC = (
    (16, 16, 3, 2, True, "relu"),
    (72, 24, 3, 2, False, "relu"),
    (88, 24, 3, 1, False, "relu"),
    (96, 40, 5, 2, True, "hs"),
    (240, 40, 5, 1, True, "hs"),
    (240, 40, 5, 1, True, "hs"),
    (120, 48, 5, 1, True, "hs"),
    (144, 48, 5, 1, True, "hs"),
    (288, 96, 5, 2, True, "hs"),
    (576, 96, 5, 1, True, "hs"),
    (576, 96, 5, 1, True, "hs"),
)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MNV3SqueezeExcite(nn.Module):
    """torchvision SqueezeExcitation: biased 1×1 convs, hard-sigmoid."""
    channels: int
    squeeze: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(a)
        a = nn.relu(a)
        a = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(a)
        return x * hard_sigmoid(a)


class MobileNetV3Small(nn.Module):
    """torchvision mobilenet_v3_small features (classifier stripped):
    output 576 channels at stride 32."""
    dtype: Any = jnp.float32
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNAct(16, 3, 2, act="hs", bn_eps=self.bn_eps,
                       dtype=self.dtype, name="stem")(x, train)
        in_ch = 16
        for bi, (exp, out, k, s, se, act) in enumerate(MOBILENETV3_SMALL_SPEC):
            residual = x
            y = x
            if exp != in_ch:
                y = _ConvBNAct(exp, 1, 1, act=act, bn_eps=self.bn_eps,
                               dtype=self.dtype, name=f"b{bi}_expand")(y, train)
            y = _ConvBNAct(exp, k, s, groups=exp, act=act,
                           bn_eps=self.bn_eps, dtype=self.dtype,
                           name=f"b{bi}_dw")(y, train)
            if se:
                y = MNV3SqueezeExcite(exp, _make_divisible(exp // 4),
                                      dtype=self.dtype, name=f"b{bi}_se")(y)
            y = _ConvBNAct(out, 1, 1, act="none", bn_eps=self.bn_eps,
                           dtype=self.dtype, name=f"b{bi}_project")(y, train)
            if s == 1 and in_ch == out:
                y = y + residual
            x = y
            in_ch = out
        x = _ConvBNAct(576, 1, 1, act="hs", bn_eps=self.bn_eps,
                       dtype=self.dtype, name="conv_last")(x, train)
        return x
