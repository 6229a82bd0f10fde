"""PoseResNet (SimpleBaseline) in Flax NHWC.

Structural parity: deep_hrnet/lib/models/pose_resnet.py — stem :113-118,
stages via resnet_spec :254-260, deconv head :124-130/:168-193, final 1×1
(×3 channels for UDP offset) :130-136.  `psa=True` inserts PSA_s after
conv2 of every BasicBlock (pose_resnet_psa.py:39,:51).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BasicBlock, Bottleneck, ConvBN, DeconvHead, max_pool_3x3_s2
from .psa import PSA_s

RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNetBackbone(nn.Module):
    num_layers: int = 50
    psa: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layers = RESNET_SPEC[self.num_layers]
        attn = PSA_s if (self.psa and block_cls is BasicBlock) else None
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), layers, (1, 2, 2, 2))):
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_down = (bi == 0 and
                             (s != 1 or inplanes != planes * block_cls.expansion))
                x = block_cls(planes, s, downsample=need_down, attention=attn,
                              dtype=self.dtype,
                              name=f"layer{li + 1}_{bi}")(x, train)
            inplanes = planes * block_cls.expansion
        return x


class PoseResNet(nn.Module):
    """Backbone + deconv head + final conv.  Output NHWC (B, H/4, W/4, C)."""
    num_layers: int = 50
    num_joints: int = 17
    target_type: str = "gaussian"
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    num_deconv_kernels: Sequence[int] = (4, 4, 4)
    deconv_with_bias: bool = False
    final_conv_kernel: int = 1
    psa: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNetBackbone(self.num_layers, psa=self.psa, dtype=self.dtype,
                           name="backbone")(x, train)
        x = DeconvHead(self.num_deconv_filters, self.num_deconv_kernels,
                       self.deconv_with_bias, dtype=self.dtype,
                       name="deconv")(x, train)
        out_ch = (self.num_joints * 3 if self.target_type == "offset"
                  else self.num_joints)
        pad = 1 if self.final_conv_kernel == 3 else 0
        x = nn.Conv(out_ch, (self.final_conv_kernel,) * 2,
                    padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                    name="final_layer")(x)
        return x.astype(jnp.float32)


def pose_resnet_from_cfg(cfg, psa: bool = False):
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    return PoseResNet(
        num_layers=extra.NUM_LAYERS,
        num_joints=cfg.MODEL.NUM_JOINTS,
        target_type=cfg.MODEL.TARGET_TYPE,
        num_deconv_filters=tuple(extra.NUM_DECONV_FILTERS),
        num_deconv_kernels=tuple(extra.NUM_DECONV_KERNELS),
        deconv_with_bias=extra.DECONV_WITH_BIAS,
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        psa=psa,
        dtype=dtype,
    )
