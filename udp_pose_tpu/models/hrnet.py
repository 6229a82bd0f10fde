"""PoseHRNet (HRNet-w32/w48) in Flax NHWC.

Structural parity: deep_hrnet/lib/models/pose_hrnet.py — stem :290-297,
layer1 (4×Bottleneck-64) :297, transitions :346-386, HighResolutionModule
:103-273 (branches :141-188, fuse layers :189-255), stage4 last module with
``multi_scale_output=False`` whose branch-0 fuse *quadruples* the output
channels (:198-222: j==i is a bias-free 1×1 C→4C conv, j>i convs emit 4C),
and the final 1×1 conv (×3 channels for UDP offset) :330-340.

``psa=True`` inserts PSA_s in every BasicBlock (pose_hrnet_psa.py:37,:49).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BasicBlock, Bottleneck, ConvBN, add_upsampled
from .psa import PSA_s

BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


class HRModule(nn.Module):
    """One HighResolutionModule: parallel branches + full fuse."""
    num_branches: int
    block: str
    num_blocks: Sequence[int]
    in_channels: Sequence[int]     # per-branch input channels
    num_channels: Sequence[int]    # per-branch block width
    multi_scale_output: bool = True
    psa: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        block_cls = BLOCKS[self.block]
        attn = PSA_s if (self.psa and block_cls is BasicBlock) else None
        exp = block_cls.expansion
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            for bi in range(self.num_blocks[i]):
                need_down = (bi == 0 and
                             self.in_channels[i] != self.num_channels[i] * exp)
                x = block_cls(self.num_channels[i], 1, downsample=need_down,
                              attention=attn, dtype=self.dtype,
                              name=f"branch{i}_{bi}")(x, train)
            outs.append(x)
        ch = [c * exp for c in self.num_channels]

        if self.num_branches == 1:
            return outs

        # fuse: out[i] = relu(sum_j fuse_{i,j}(x_j))  (pose_hrnet.py:258-272)
        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            # last-module channel widening (pose_hrnet.py:198-202)
            out_ch = ch[i] * 4 if not self.multi_scale_output else ch[i]
            acc = None
            for j in range(self.num_branches):
                xj = outs[j]
                if j > i:
                    y = nn.Conv(out_ch, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"fuse{i}_{j}")(xj)
                    y = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     name=f"fuse{i}_{j}_bn")(y)
                    # acc is never None here: j > i >= 0, so the j==i (or
                    # j<i) branch already seeded it.  add_upsampled fuses
                    # the nearest-upsample into the add (bit-identical;
                    # see layers.py — the materialized repeat was the
                    # top non-conv cost on the serving graph).
                    acc = add_upsampled(acc, y, 2 ** (j - i))
                    continue
                elif j == i:
                    if not self.multi_scale_output:
                        # bias-free 1×1 C→4C, no BN (pose_hrnet.py:212-219)
                        y = nn.Conv(out_ch, (1, 1), use_bias=False,
                                    dtype=self.dtype, name=f"fuse{i}_{j}")(xj)
                    else:
                        y = xj
                else:
                    y = xj
                    for k in range(i - j):
                        last = k == i - j - 1
                        kch = out_ch if last else ch[j]
                        y = nn.Conv(kch, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)), use_bias=False,
                                    dtype=self.dtype,
                                    name=f"fuse{i}_{j}_{k}")(y)
                        y = nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype,
                                         name=f"fuse{i}_{j}_{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


def stage_cfg(num_modules, num_branches, block, num_blocks, num_channels):
    """Hashable stage spec: (num_modules, num_branches, block,
    num_blocks tuple, num_channels tuple)."""
    return (int(num_modules), int(num_branches), str(block),
            tuple(num_blocks), tuple(num_channels))


class PoseHRNet(nn.Module):
    """Full HRNet pose network.  Output NHWC (B, H/4, W/4, C_out)."""
    stages_cfg: Tuple[tuple, ...]  # STAGE2..4 specs via :func:`stage_cfg`
    num_joints: int = 17
    target_type: str = "gaussian"
    final_conv_kernel: int = 1
    psa: bool = False
    #: remat the hi-res stem/layer1 activations in the backward pass
    #: (trades recompute FLOPs for HBM traffic on the memory-bound
    #: 128×96/64×48 tensors; perf knob, math-identical, param paths
    #: unchanged — see DESIGN.md train study)
    remat_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ConvBN_ = (nn.remat(ConvBN, static_argnums=(2,))
                   if self.remat_stem else ConvBN)
        Bottleneck_ = (nn.remat(Bottleneck, static_argnums=(2,))
                       if self.remat_stem else Bottleneck)
        # stem: two 3x3/s2 convs (pose_hrnet.py:290-297)
        x = ConvBN_(64, 3, 2, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBN_(64, 3, 2, dtype=self.dtype, name="stem2")(x, train)
        for bi in range(4):
            x = Bottleneck_(64, 1, downsample=(bi == 0), dtype=self.dtype,
                            name=f"layer1_{bi}")(x, train)
        xs = [x]
        prev_ch = [256]

        for si, scfg in enumerate(self.stages_cfg):
            num_modules, nb, block, num_blocks, num_channels = scfg
            exp = BLOCKS[block].expansion
            width = [c * exp for c in num_channels]
            # transition (pose_hrnet.py:346-386): branch i<len(prev): 3x3
            # conv iff channels differ else passthrough; new branches:
            # stride-2 conv chain from the last prev branch.
            new_xs = []
            for i in range(nb):
                if i < len(prev_ch):
                    if prev_ch[i] != width[i]:
                        y = ConvBN(width[i], 3, 1, dtype=self.dtype,
                                   name=f"transition{si + 1}_{i}")(xs[i], train)
                    else:
                        y = xs[i]
                else:
                    y = xs[-1]
                    for j in range(i + 1 - len(prev_ch)):
                        out_c = width[i] if j == i - len(prev_ch) else prev_ch[-1]
                        y = ConvBN(out_c, 3, 2, dtype=self.dtype,
                                   name=f"transition{si + 1}_{i}_{j}")(y, train)
                new_xs.append(y)
            xs = new_xs
            last_stage = si == len(self.stages_cfg) - 1
            for mi in range(num_modules):
                mso = not (last_stage and mi == num_modules - 1)
                xs = HRModule(nb, block, num_blocks,
                              tuple(width), num_channels,
                              multi_scale_output=mso, psa=self.psa,
                              dtype=self.dtype,
                              name=f"stage{si + 2}_{mi}")(xs, train)
            prev_ch = list(width)

        out_ch = (self.num_joints * 3 if self.target_type == "offset"
                  else self.num_joints)
        pad = 1 if self.final_conv_kernel == 3 else 0
        x = nn.Conv(out_ch, (self.final_conv_kernel,) * 2,
                    padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                    name="final_layer")(xs[0])
        return x.astype(jnp.float32)


def pose_hrnet_from_cfg(cfg, psa: bool = False):
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    stages = tuple(
        stage_cfg(extra[k]["NUM_MODULES"], extra[k]["NUM_BRANCHES"],
                  extra[k]["BLOCK"], extra[k]["NUM_BLOCKS"],
                  extra[k]["NUM_CHANNELS"])
        for k in ("STAGE2", "STAGE3", "STAGE4"))
    return PoseHRNet(
        stages_cfg=stages,
        num_joints=cfg.MODEL.NUM_JOINTS,
        target_type=cfg.MODEL.TARGET_TYPE,
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        psa=psa,
        dtype=dtype,
    )
