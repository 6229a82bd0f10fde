"""Residual Steps Network (RSN / MSPN family) in Flax NHWC.

Structural parity: RSN/exps/RSN18.coco/network.py — conv_bn_relu :14-46
(``efficient`` → jax.checkpoint), residual-steps Bottleneck :49-122
(branch_ch = in_planes*26//64, dense inter-branch adds), ResNet_top
:125-137, ResNet_downsample_module :140-199 (dual skip injection),
Upsample_unit :202-267 (align-corners bilinear), Upsample_module :270-310,
Single_stage_module :313-334, RSN :337-412.  PRM head:
RSN18.coco.e1.se...prm/network.py:267-302.  SE layer: same file :51-67.

Torch ``F.interpolate(mode='bilinear', align_corners=True)`` is reproduced
as two small interpolation matmuls (MXU-friendly, exact).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix_ac(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners bilinear interpolation matrix."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        A[:, 0] = 1.0
        return A
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        f = src - lo
        A[i, lo] += 1.0 - f
        A[i, hi] += f
    return A


def resize_bilinear_ac(x, out_hw):
    """NHWC align-corners bilinear resize (torch F.interpolate parity)."""
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        return x
    Ah = jnp.asarray(_interp_matrix_ac(H, oh))
    Aw = jnp.asarray(_interp_matrix_ac(W, ow))
    return jnp.einsum("oh,bhwc,pw->bopc", Ah, x, Aw,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(x.dtype)


class ConvBnRelu(nn.Module):
    """conv_bn_relu (network.py:14-46): conv *with bias*, optional BN/ReLU;
    ``remat`` reproduces the efficient/checkpoint flag via jax.checkpoint."""
    features: int
    kernel: int = 3
    stride: int = 1
    has_bn: bool = True
    has_relu: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups,
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        if self.has_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.has_relu:
            x = nn.relu(x)
        return x


class SELayer(nn.Module):
    """Squeeze-excitation (prm variant network.py:51-67)."""
    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                     name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class RSNBottleneck(nn.Module):
    """Residual-steps bottleneck (network.py:49-122).

    1×1 expand to 4·branch_ch, split 4 ways, densely-connected 3×3 steps
    (branch i applies i convs, each fed by the previous step of the same
    branch plus the matching step of the previous branch), concat, 1×1
    project.  ``plain=True`` gives the Res18 ablation's 1-3-1 block
    (Res18.coco/network.py:55-69).
    """
    in_planes: int
    planes: int
    stride: int = 1
    downsample: bool = False
    plain: bool = False
    se: bool = False
    bc_planes: bool = False
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        if self.plain:
            # Res18 places the stride on the 3x3 (Res18.coco/network.py:
            # 55-62: conv1 1x1 stride=1, conv2 3x3 stride=stride), unlike
            # the RSN block which strides its 1x1 expand.
            out = ConvBnRelu(self.planes, 1, 1, dtype=self.dtype,
                             name="cbr1")(x, train)
            out = ConvBnRelu(self.planes, 3, self.stride, dtype=self.dtype,
                             name="cbr2")(out, train)
            out = ConvBnRelu(self.planes, 1, 1, has_relu=False,
                             dtype=self.dtype, name="cbr3")(out, train)
        else:
            # base RSN: branch_ch from in_planes (RSN18.coco/network.py:55);
            # the SE/PRM experiment derives it from planes instead
            # (RSN18.coco.e1.se...prm/network.py:73)
            bc = (self.planes if self.bc_planes
                  else self.in_planes) * 26 // 64
            out = ConvBnRelu(4 * bc, 1, self.stride, dtype=self.dtype,
                             name="cbr1")(x, train)
            spx = [out[..., i * bc:(i + 1) * bc] for i in range(4)]

            def step(name, v):
                return ConvBnRelu(bc, 3, 1, dtype=self.dtype,
                                  name=name)(v, train)

            o11 = step("cbr2_1_1", spx[0])
            o21 = step("cbr2_2_1", spx[1] + o11)
            o22 = step("cbr2_2_2", o21)
            o31 = step("cbr2_3_1", spx[2] + o21)
            o32 = step("cbr2_3_2", o31 + o22)
            o33 = step("cbr2_3_3", o32)
            o41 = step("cbr2_4_1", spx[3] + o31)
            o42 = step("cbr2_4_2", o41 + o32)
            o43 = step("cbr2_4_3", o42 + o33)
            o44 = step("cbr2_4_4", o43)
            out = jnp.concatenate([o11, o22, o33, o44], axis=-1)
            out = ConvBnRelu(self.planes, 1, 1, has_relu=False,
                             dtype=self.dtype, name="cbr3")(out, train)
        if self.se:
            # reduction=8 per the SE/PRM experiment (its network.py:113)
            out = SELayer(self.planes, reduction=8, dtype=self.dtype,
                          name="se")(out)
        if self.downsample:
            residual = ConvBnRelu(self.planes, 1, self.stride, has_relu=False,
                                  dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


class DownsampleModule(nn.Module):
    """ResNet_downsample_module (network.py:140-199)."""
    layers: Sequence[int] = (2, 2, 2, 2)
    has_skip: bool = False
    plain: bool = False
    se: bool = False
    bc_planes: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip1, skip2, train: bool = False):
        feats = []
        in_planes = 64
        block_cls = RSNBottleneck
        if self.remat:
            block_cls = nn.checkpoint(RSNBottleneck,
                                      static_argnums=(2,))
        for li, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_down = (bi == 0 and
                             (s != 1 or in_planes != planes))
                x = block_cls(in_planes, planes, s, downsample=need_down,
                              plain=self.plain, se=self.se,
                              bc_planes=self.bc_planes, dtype=self.dtype,
                              name=f"layer{li + 1}_{bi}")(x, train)
                in_planes = planes
            if self.has_skip:
                x = x + skip1[li] + skip2[li]
            feats.append(x)
        x1, x2, x3, x4 = feats
        return x4, x3, x2, x1


class UpsampleUnit(nn.Module):
    """Upsample_unit (network.py:202-267)."""
    ind: int
    up_size: Tuple[int, int]
    output_chl_num: int
    output_shape: Tuple[int, int]
    chl_num: int = 256
    gen_skip: bool = False
    gen_cross_conv: bool = False
    use_prm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, up_x, train: bool = False):
        out = ConvBnRelu(self.chl_num, 1, 1, has_relu=False,
                         dtype=self.dtype, name="u_skip")(x, train)
        if self.ind > 0:
            up = resize_bilinear_ac(up_x, self.up_size)
            up = ConvBnRelu(self.chl_num, 1, 1, has_relu=False,
                            dtype=self.dtype, name="up_conv")(up, train)
            out = out + up
        out = nn.relu(out)
        if self.use_prm and self.ind == 3:
            # PRM gates the fused 256-ch feature, pre-res-convs
            # (prm variant network.py:343-357)
            out = PRM(self.chl_num, dtype=self.dtype, name="prm")(out, train)

        res = ConvBnRelu(self.chl_num, 1, 1, dtype=self.dtype,
                         name="res_conv1")(out, train)
        res = ConvBnRelu(self.output_chl_num, 3, 1, has_relu=False,
                         dtype=self.dtype, name="res_conv2")(res, train)
        res = resize_bilinear_ac(res, self.output_shape)

        skip1 = skip2 = cross = None
        if self.gen_skip:
            in_ch = x.shape[-1]
            skip1 = ConvBnRelu(in_ch, 1, 1, dtype=self.dtype,
                               name="skip1")(x, train)
            skip2 = ConvBnRelu(in_ch, 1, 1, dtype=self.dtype,
                               name="skip2")(out, train)
        if self.ind == 3 and self.gen_cross_conv:
            cross = ConvBnRelu(64, 1, 1, dtype=self.dtype,
                               name="cross_conv")(out, train)
        return out, res, skip1, skip2, cross


class PRM(nn.Module):
    """Pose Refine Machine (prm variant network.py:267-302):
    ``out₁ · (1 + channel_gate · spatial_gate)``."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out1 = ConvBnRelu(self.channels, 3, 1, dtype=self.dtype,
                          name="prm1")(x, train)
        g2 = jnp.mean(out1, axis=(1, 2), keepdims=True)
        g2 = ConvBnRelu(self.channels, 1, 1, dtype=self.dtype,
                        name="prm2_1")(g2, train)
        g2 = ConvBnRelu(self.channels, 1, 1, dtype=self.dtype,
                        name="prm2_2")(g2, train)
        g2 = nn.sigmoid(g2)
        g3 = ConvBnRelu(self.channels, 1, 1, dtype=self.dtype,
                        name="prm3_1")(out1, train)
        g3 = ConvBnRelu(self.channels, 9, 1, groups=self.channels,
                        dtype=self.dtype, name="prm3_2")(g3, train)
        g3 = nn.sigmoid(g3)
        return out1 * (1.0 + g2 * g3)


class UpsampleModule(nn.Module):
    """Upsample_module (network.py:270-310)."""
    output_chl_num: int
    output_shape: Tuple[int, int]      # (h, w)
    chl_num: int = 256
    gen_skip: bool = False
    gen_cross_conv: bool = False
    use_prm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x4, x3, x2, x1, train: bool = False):
        h, w = self.output_shape
        sizes = [(h // 8, w // 8), (h // 4, w // 4), (h // 2, w // 2), (h, w)]
        units_out = []
        up_x = None
        xs = [x4, x3, x2, x1]
        cross = None
        for i in range(4):
            out, res, s1, s2, cc = UpsampleUnit(
                i, sizes[i], self.output_chl_num, self.output_shape,
                self.chl_num, self.gen_skip, self.gen_cross_conv,
                use_prm=self.use_prm, dtype=self.dtype,
                name=f"up{i + 1}")(xs[i], up_x, train)
            units_out.append((res, s1, s2))
            up_x = out
            if cc is not None:
                cross = cc
        res = [u[0] for u in units_out]                  # small → large
        skip1 = [u[1] for u in units_out][::-1]
        skip2 = [u[2] for u in units_out][::-1]
        return res, skip1, skip2, cross


class RSN(nn.Module):
    """Multi-stage RSN (network.py:337-412).  Returns the list of per-stage
    4-scale heatmap outputs (NCHW at the codec boundary is the caller's
    job); inference uses ``outputs[-1][-1]``."""
    stage_num: int = 1
    output_chl_num: int = 17
    output_shape: Tuple[int, int] = (64, 48)
    upsample_chl_num: int = 256
    layers: Sequence[int] = (2, 2, 2, 2)
    plain: bool = False
    se: bool = False
    bc_planes: bool = False
    conv_stem: bool = False
    use_prm: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, all_stages: bool = False):
        if self.conv_stem:
            # SE/PRM experiment stem: 3 convs, no maxpool
            # (RSN18.coco.e1.se...prm/network.py:188-202)
            x = ConvBnRelu(64, 3, 2, dtype=self.dtype,
                           name="top_conv0")(x, train)
            x = ConvBnRelu(64, 7, 1, dtype=self.dtype,
                           name="top_conv1")(x, train)
            x = ConvBnRelu(64, 3, 2, dtype=self.dtype,
                           name="top_conv2")(x, train)
        else:
            x = ConvBnRelu(64, 7, 2, dtype=self.dtype, name="top")(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        skip1 = skip2 = None
        outputs = []
        for i in range(self.stage_num):
            has_skip = i > 0
            last = i == self.stage_num - 1
            x4, x3, x2, x1 = DownsampleModule(
                tuple(self.layers), has_skip, self.plain, self.se,
                self.bc_planes, self.remat, dtype=self.dtype,
                name=f"stage{i}_down")(x, skip1, skip2, train)
            res, skip1, skip2, cross = UpsampleModule(
                self.output_chl_num, self.output_shape,
                self.upsample_chl_num, gen_skip=not last,
                gen_cross_conv=not last, use_prm=self.use_prm,
                dtype=self.dtype, name=f"stage{i}_up")(x4, x3, x2, x1, train)
            outputs.append(res)
            x = cross
        if all_stages or train:
            return outputs
        return outputs[-1][-1]


class RSNStem(nn.Module):
    """The RSN stem alone (ResNet_top, network.py:125-137) — split out so
    the pipeline-parallel path (parallel/pipeline.py) can run it outside
    the stage pipeline.  Param names match :class:`RSN` ('top' /
    'top_conv{0,1,2}') so stem weights move between the two layouts
    verbatim."""
    conv_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_stem:
            x = ConvBnRelu(64, 3, 2, dtype=self.dtype,
                           name="top_conv0")(x, train)
            x = ConvBnRelu(64, 7, 1, dtype=self.dtype,
                           name="top_conv1")(x, train)
            x = ConvBnRelu(64, 3, 2, dtype=self.dtype,
                           name="top_conv2")(x, train)
        else:
            x = ConvBnRelu(64, 7, 2, dtype=self.dtype, name="top")(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        return x


class RSNUniformStage(nn.Module):
    """One PIPELINE-UNIFORM RSN stage: downsample + upsample with ALL
    inter-stage plumbing always generated (gen_skip / gen_cross_conv on)
    and skips always consumed.

    Two observations make every stage structurally identical (so stage
    params stack on a leading axis and shard over a mesh pipeline axis,
    parallel/pipeline.py):

    * the skip injection in the downsample module is a parameter-free add
      (network.py:168-170) — feeding ZERO skips reproduces the first
      stage's ``has_skip=False`` bit-for-bit;
    * the last stage merely *discards* its skip/cross outputs
      (network.py:383-391) — computing them changes nothing downstream.

    Inter-stage payload: ``cross`` (B, H/4, W/4, 64) — the same shape the
    stem produces — plus the two 4-level skip pyramids, which is exactly
    what :func:`jax.lax.ppermute` shifts between pipeline neighbours.
    """
    output_chl_num: int
    output_shape: Tuple[int, int]
    chl_num: int = 256
    layers: Sequence[int] = (2, 2, 2, 2)
    plain: bool = False
    se: bool = False
    bc_planes: bool = False
    use_prm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip1, skip2, train: bool = False):
        x4, x3, x2, x1 = DownsampleModule(
            tuple(self.layers), True, self.plain, self.se,
            self.bc_planes, False, dtype=self.dtype,
            name="down")(x, skip1, skip2, train)
        res, s1, s2, cross = UpsampleModule(
            self.output_chl_num, self.output_shape, self.chl_num,
            gen_skip=True, gen_cross_conv=True, use_prm=self.use_prm,
            dtype=self.dtype, name="up")(x4, x3, x2, x1, train)
        return res, s1, s2, cross


def stem_from_cfg(cfg):
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    return RSNStem(conv_stem=extra.get("CONV_STEM",
                                       extra.get("USE_SE", False)),
                   dtype=dtype)


def uniform_stage_from_cfg(cfg):
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    w, h = cfg.MODEL.HEATMAP_SIZE
    return RSNUniformStage(
        output_chl_num=cfg.MODEL.NUM_JOINTS,
        output_shape=(h, w),
        chl_num=extra.get("UPSAMPLE_CHANNEL_NUM", 256),
        layers=tuple(extra.get("LAYERS", (2, 2, 2, 2))),
        plain=extra.get("PLAIN_BOTTLENECK", False),
        se=extra.get("USE_SE", False),
        bc_planes=extra.get("BC_FROM_PLANES", extra.get("USE_SE", False)),
        use_prm=extra.get("USE_PRM", False),
        dtype=dtype,
    )


def rsn_from_cfg(cfg):
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    w, h = cfg.MODEL.HEATMAP_SIZE
    return RSN(
        stage_num=extra.get("STAGE_NUM", 1),
        output_chl_num=cfg.MODEL.NUM_JOINTS,
        output_shape=(h, w),
        upsample_chl_num=extra.get("UPSAMPLE_CHANNEL_NUM", 256),
        layers=tuple(extra.get("LAYERS", (2, 2, 2, 2))),
        plain=extra.get("PLAIN_BOTTLENECK", False),
        se=extra.get("USE_SE", False),
        # the reference SE/PRM experiment couples these with USE_SE
        bc_planes=extra.get("BC_FROM_PLANES", extra.get("USE_SE", False)),
        conv_stem=extra.get("CONV_STEM", extra.get("USE_SE", False)),
        use_prm=extra.get("USE_PRM", False),
        remat=cfg.TPU.REMAT,
        dtype=dtype,
    )
