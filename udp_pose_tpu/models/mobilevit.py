"""MobileViT and MobileViTv2 backbones in Flax NHWC.

Structural parity:
* MobileViT  — backbones/mobilevit.py (MV2 inverted residuals + MobileViT
  blocks :517-679: local 3×3+1×1, per-intra-patch-pixel transformer over
  patch positions, fold, 1×1 proj, 3×3 fusion on concat; swish activation,
  num_heads=4 per the experiment yaml) with the xxs/xs/s width tables from
  backbones/configs/mobilevit.py.
* MobileViTv2 — backbones/mobilevitv2.py (depthwise local rep :897-917,
  separable linear attention :547-690: softmax context scores over patches,
  relu(value)·context, LayerNorm2D == per-sample GroupNorm(1)) with the
  width-multiplier config from configs/mobilevitv2.py:39-105.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    return x * nn.sigmoid(x)


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_norm: bool = True
    use_act: bool = True
    use_bias: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        bias = (not self.use_norm) if self.use_bias is None else self.use_bias
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=bias,
                    dtype=self.dtype, name="conv")(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.use_act:
            x = swish(x)
        return x


class MV2Block(nn.Module):
    """corenet InvertedResidual: expand→dw→project, residual when shapes
    allow."""
    features: int
    stride: int = 1
    expand_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        y = x
        if self.expand_ratio != 1:
            y = ConvNormAct(hidden, 1, dtype=self.dtype,
                            name="exp_1x1")(y, train)
        y = ConvNormAct(hidden, 3, self.stride, groups=hidden,
                        dtype=self.dtype, name="conv_3x3")(y, train)
        y = ConvNormAct(self.features, 1, use_act=False, dtype=self.dtype,
                        name="red_1x1")(y, train)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


def unfold_patches(x, ph, pw):
    """NHWC (B,H,W,C) → (B, P, N, C): P = intra-patch pixel (row-major),
    N = patch position (row-major) — torch unfolding order parity
    (mobilevit.py:594-625).  Non-divisible sizes are bilinearly resized to
    the ceil multiple (reference :600-607, align_corners=False); callers
    resize back via :func:`fold_patches` with the original hw."""
    B, H, W, C = x.shape
    nh = -(-H // ph)
    nw = -(-W // pw)
    if (nh * ph, nw * pw) != (H, W):
        x = jax.image.resize(x, (B, nh * ph, nw * pw, C), method="bilinear",
                             antialias=False)  # torch F.interpolate parity
    x = x.reshape(B, nh, ph, nw, pw, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)           # B, ph, pw, nh, nw, C
    return x.reshape(B, ph * pw, nh * nw, C)


def fold_patches(p, hw, ph, pw):
    B, P, N, C = p.shape
    H, W = hw
    nh = -(-H // ph)
    nw = -(-W // pw)
    x = p.reshape(B, ph, pw, nh, nw, C)
    x = x.transpose(0, 3, 1, 4, 2, 5)           # B, nh, ph, nw, pw, C
    x = x.reshape(B, nh * ph, nw * pw, C)
    if (nh * ph, nw * pw) != (H, W):
        x = jax.image.resize(x, (B, H, W, C), method="bilinear",
                             antialias=False)  # torch: no AA on downscale
    return x


class TransformerEncoder(nn.Module):
    """Pre-norm MHA + FFN (mobilevit.py:469-514), swish FFN."""
    dim: int
    ffn_dim: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            out_features=self.dim, use_bias=True, dtype=self.dtype,
            name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = swish(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class MobileViTBlock(nn.Module):
    """mobilevit.py:517-679."""
    dim: int
    ffn_dim: int
    n_blocks: int = 2
    num_heads: int = 4
    patch: Tuple[int, int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        in_ch = x.shape[-1]
        fm = ConvNormAct(in_ch, 3, dtype=self.dtype,
                         name="local_3x3")(x, train)
        fm = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                     name="local_1x1")(fm)
        ph, pw = self.patch
        H, W = fm.shape[1], fm.shape[2]
        p = unfold_patches(fm, ph, pw)              # (B, P, N, d)
        B, P, N, d = p.shape
        p = p.reshape(B * P, N, d)
        for i in range(self.n_blocks):
            p = TransformerEncoder(self.dim, self.ffn_dim, self.num_heads,
                                   dtype=self.dtype, name=f"tr{i}")(p)
        p = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_out")(p)
        fm = fold_patches(p.reshape(B, P, N, d), (H, W), ph, pw)
        fm = ConvNormAct(in_ch, 1, dtype=self.dtype,
                         name="conv_proj")(fm, train)
        fm = ConvNormAct(in_ch, 3, dtype=self.dtype, name="fusion")(
            jnp.concatenate([res, fm], axis=-1), train)
        return fm


MOBILEVIT_SPEC = {
    # (mv2_exp, l1_out, l2_out, (l3 out,d,ffn,L), (l4...), (l5...), last_exp)
    "xx_small": (2, 16, 24, (48, 64, 128, 2), (64, 80, 160, 4),
                 (80, 96, 192, 3), 4),
    "x_small": (4, 32, 48, (64, 96, 192, 2), (80, 120, 240, 4),
                (96, 144, 288, 3), 4),
    "small": (4, 32, 64, (96, 144, 288, 2), (128, 192, 384, 4),
              (160, 240, 480, 3), 4),
}


class MobileViT(nn.Module):
    """Full backbone; returns stride-32 features after the exp 1×1 conv
    (640/384/320 channels for s/xs/xxs — pose wrapper inplanes)."""
    mode: str = "small"
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp, l1, l2, l3, l4, l5, last_exp = MOBILEVIT_SPEC[self.mode]
        x = ConvNormAct(16, 3, 2, dtype=self.dtype, name="conv_1")(x, train)
        x = MV2Block(l1, 1, exp, dtype=self.dtype, name="layer1_0")(x, train)
        for i in range(3):
            x = MV2Block(l2, 2 if i == 0 else 1, exp, dtype=self.dtype,
                         name=f"layer2_{i}")(x, train)
        for li, spec in zip(("3", "4", "5"), (l3, l4, l5)):
            out, d, ffn, L = spec
            x = MV2Block(out, 2, exp, dtype=self.dtype,
                         name=f"layer{li}_mv2")(x, train)
            x = MobileViTBlock(d, ffn, L, self.num_heads, dtype=self.dtype,
                               name=f"layer{li}_vit")(x, train)
        x = ConvNormAct(l5[0] * last_exp, 1, dtype=self.dtype,
                        name="conv_1x1_exp")(x, train)
        return x


# ---------------------------------------------------------------------------
# MobileViTv2
# ---------------------------------------------------------------------------

def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class LayerNorm2D(nn.Module):
    """corenet layer_norm_2d == GroupNorm(1): per-sample normalisation over
    ALL non-batch dims, per-channel affine."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        mean = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True)
        var = jnp.var(x, axis=tuple(range(1, x.ndim)), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return y * scale + bias


class LinearSelfAttention(nn.Module):
    """mobilevitv2.py:547-690: q (1ch) softmax over patches, context =
    Σ scores·key, out = relu(value)·context."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, P, N, d)
        qkv = nn.Conv(1 + 2 * self.dim, (1, 1), use_bias=True,
                      dtype=self.dtype, name="qkv_proj")(x)
        q = qkv[..., :1]
        k = qkv[..., 1:1 + self.dim]
        v = qkv[..., 1 + self.dim:]
        scores = nn.softmax(q, axis=2)              # over patch positions N
        ctx = jnp.sum(k * scores, axis=2, keepdims=True)   # (B, P, 1, d)
        out = nn.relu(v) * ctx
        return nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                       name="out_proj")(out)


class LinearAttnFFN(nn.Module):
    """mobilevitv2.py:748-840: pre-norm linear attention + conv FFN."""
    dim: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNorm2D(dtype=self.dtype, name="norm1")(x)
        x = x + LinearSelfAttention(self.dim, dtype=self.dtype,
                                    name="attn")(h)
        h = LayerNorm2D(dtype=self.dtype, name="norm2")(x)
        h = nn.Conv(self.ffn_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name="ffn1")(h)
        h = swish(h)
        h = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name="ffn2")(h)
        return x + h


def _resize_align_corners(x, size):
    """NHWC bilinear resize with torch align_corners=True semantics
    (separable interpolation matrices — rides the MXU)."""
    B, H, W, C = x.shape
    nh, nw = size

    def mat(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.full((n_out, n_in), 1.0 / n_in)
        pos = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(jnp.float32)
        m = jnp.zeros((n_out, n_in), jnp.float32)
        m = m.at[jnp.arange(n_out), lo].add(1 - w)
        m = m.at[jnp.arange(n_out), hi].add(w)
        return m

    y = jnp.einsum("oh,bhwc->bowc", mat(H, nh), x.astype(jnp.float32))
    y = jnp.einsum("ow,bwhc->bohc",
                   mat(W, nw), y.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    return y.astype(x.dtype)


class MobileViTBlockv2(nn.Module):
    """mobilevitv2.py:858-1040: depthwise local rep, linear-attention
    global rep, 1×1 proj back (no fusion concat).

    Non-patch-divisible inputs are resized UP front (bilinear,
    align_corners=True — resize_input_if_needed :1095-1103) and the block
    output keeps the resized size (the reference never resizes back)."""
    dim: int
    ffn_dim: int
    n_blocks: int = 2
    patch: Tuple[int, int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ph, pw = self.patch
        in_ch = x.shape[-1]
        H, W = x.shape[1], x.shape[2]
        nh, nw = -(-H // ph) * ph, -(-W // pw) * pw
        if (nh, nw) != (H, W):
            x = _resize_align_corners(x, (nh, nw))
        fm = ConvNormAct(in_ch, 3, groups=in_ch, dtype=self.dtype,
                         name="local_dw")(x, train)
        fm = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                     name="local_1x1")(fm)
        p = unfold_patches(fm, ph, pw)              # (B, P, N, d)
        for i in range(self.n_blocks):
            p = LinearAttnFFN(self.dim, self.ffn_dim, dtype=self.dtype,
                              name=f"attn{i}")(p)
        p = LayerNorm2D(dtype=self.dtype, name="norm_out")(p)
        fm = fold_patches(p, (nh, nw), ph, pw)
        fm = ConvNormAct(in_ch, 1, use_act=False, dtype=self.dtype,
                         name="conv_proj")(fm, train)
        return fm


class MobileViTv2(nn.Module):
    """Width-multiplier family (0.5 / 0.75 / 1.0)."""
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        stem = _make_divisible(max(16, min(64, 32 * w)), 8, 16)
        l1 = _make_divisible(64 * w, 16)
        l2 = _make_divisible(128 * w, 8)
        specs = [  # (out, attn_dim, n_blocks)
            (_make_divisible(256 * w, 8), _make_divisible(128 * w, 8), 2),
            (_make_divisible(384 * w, 8), _make_divisible(192 * w, 8), 4),
            (_make_divisible(512 * w, 8), _make_divisible(256 * w, 8), 3),
        ]
        x = ConvNormAct(stem, 3, 2, dtype=self.dtype, name="conv_1")(x, train)
        x = MV2Block(l1, 1, 2, dtype=self.dtype, name="layer1_0")(x, train)
        for i in range(2):
            x = MV2Block(l2, 2 if i == 0 else 1, 2, dtype=self.dtype,
                         name=f"layer2_{i}")(x, train)
        for li, (out, d, L) in zip(("3", "4", "5"), specs):
            x = MV2Block(out, 2, 2, dtype=self.dtype,
                         name=f"layer{li}_mv2")(x, train)
            ffn = int((2 * d) // 16 * 16)
            x = MobileViTBlockv2(d, ffn, L, dtype=self.dtype,
                                 name=f"layer{li}_vit")(x, train)
        return x
