"""Per-family ONNX graph emitters for the pose-model zoo.

Each emitter walks the SAME architecture the flax model defines (and the
reference torch model implements) and emits an opset-11 NCHW graph whose
initializers are the reference-format state_dict produced by
utils/torch_convert.flax_to_torch — so initializer names match the
reference torch keys exactly and the graph is the artifact the
reference's own torch→ONNX export would produce
(deep_hrnet/tools/export.py:21-56; RSN network.py topologies).

Numerical equivalence to the flax forward is asserted by
export/onnx_eval.check_model in tests/test_onnx_export.py.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .onnx_build import GraphBuilder

# torch _get_deconv_cfg (pose_resnet.py:156-166): kernel → (pad, out_pad)
_DECONV_GEOM = {4: (1, 0), 3: (1, 1), 2: (0, 0)}


def _basic_block(g: GraphBuilder, x: str, tp: str, stride: int) -> str:
    """BasicBlock (pose_hrnet.py:29-59)."""
    out = g.conv_bn_relu(x, f"{tp}.conv1", f"{tp}.bn1", stride=stride)
    out = g.conv(out, f"{tp}.conv2")
    out = g.bn(out, f"{tp}.bn2")
    res = x
    if f"{tp}.downsample.0.weight" in g.sd:
        res = g.conv(x, f"{tp}.downsample.0", stride=stride, pad=0)
        res = g.bn(res, f"{tp}.downsample.1")
    return g.relu(g.add(out, res))


def _bottleneck(g: GraphBuilder, x: str, tp: str, stride: int) -> str:
    """Bottleneck (pose_hrnet.py:62-101)."""
    out = g.conv_bn_relu(x, f"{tp}.conv1", f"{tp}.bn1")
    out = g.conv_bn_relu(out, f"{tp}.conv2", f"{tp}.bn2", stride=stride)
    out = g.conv(out, f"{tp}.conv3")
    out = g.bn(out, f"{tp}.bn3")
    res = x
    if f"{tp}.downsample.0.weight" in g.sd:
        res = g.conv(x, f"{tp}.downsample.0", stride=stride, pad=0)
        res = g.bn(res, f"{tp}.downsample.1")
    return g.relu(g.add(out, res))


def build_pose_resnet(sd: Dict[str, np.ndarray], num_layers: int,
                      num_joints: int, target_type: str,
                      image_size: Sequence[int],
                      final_conv_kernel: int = 1,
                      batch: int = 1) -> bytes:
    """pose_resnet → ONNX (reference lib/models/pose_resnet.py)."""
    from ..models.resnet import RESNET_SPEC
    _block, layers = RESNET_SPEC[num_layers]
    bottleneck = num_layers >= 50
    w, h = int(image_size[0]), int(image_size[1])

    g = GraphBuilder(sd, f"pose_resnet_{num_layers}")
    x = g.conv("images", "conv1", stride=2, pad=3)
    x = g.relu(g.bn(x, "bn1"))
    x = g.maxpool(x)
    for li, (blocks, stride) in enumerate(zip(layers, (1, 2, 2, 2))):
        for bi in range(blocks):
            fn = _bottleneck if bottleneck else _basic_block
            x = fn(g, x, f"layer{li + 1}.{bi}", stride if bi == 0 else 1)
    i = 0
    while f"deconv_layers.{i}.weight" in sd:
        k = int(sd[f"deconv_layers.{i}.weight"].shape[2])
        pad, out_pad = _DECONV_GEOM[k]
        x = g.conv_transpose(x, f"deconv_layers.{i}", stride=2, pad=pad)
        if out_pad:
            g.nodes[-1].attrs["output_padding"] = [out_pad, out_pad]
        x = g.relu(g.bn(x, f"deconv_layers.{i + 1}"))
        i += 3
    pad = 1 if final_conv_kernel == 3 else 0
    x = g.conv(x, "final_layer", pad=pad, out="output")

    out_ch = num_joints * 3 if target_type == "offset" else num_joints
    return g.finish("images", (batch, 3, h, w), "output",
                    (batch, out_ch, h // 4, w // 4),
                    doc=f"pose_resnet_{num_layers} {w}x{h}")


def build_pose_hrnet(sd: Dict[str, np.ndarray], stages_cfg,
                     num_joints: int, target_type: str,
                     image_size: Sequence[int],
                     final_conv_kernel: int = 1,
                     batch: int = 1) -> bytes:
    """pose_hrnet → ONNX (reference lib/models/pose_hrnet.py; same walk
    as models/hrnet.PoseHRNet incl. the last-module ×4 widening)."""
    w, h = int(image_size[0]), int(image_size[1])
    expansion = {"BASIC": 1, "BOTTLENECK": 4}

    g = GraphBuilder(sd, "pose_hrnet")
    x = g.conv_bn_relu("images", "conv1", "bn1", stride=2)
    x = g.conv_bn_relu(x, "conv2", "bn2", stride=2)
    for bi in range(4):
        x = _bottleneck(g, x, f"layer1.{bi}", 1)
    xs = [x]
    prev_ch = [256]

    for si, (num_modules, nb, block, num_blocks, num_channels) in \
            enumerate(stages_cfg):
        t = si + 1
        exp = expansion[block]
        width = [c * exp for c in num_channels]
        # transition (pose_hrnet.py:346-386)
        new_xs = []
        for i in range(nb):
            if i < len(prev_ch):
                if f"transition{t}.{i}.0.weight" in g.sd:
                    y = g.conv_bn_relu(xs[i], f"transition{t}.{i}.0",
                                       f"transition{t}.{i}.1")
                else:
                    y = xs[i]
            else:
                y = xs[-1]
                for j in range(i + 1 - len(prev_ch)):
                    y = g.conv_bn_relu(y, f"transition{t}.{i}.{j}.0",
                                       f"transition{t}.{i}.{j}.1", stride=2)
            new_xs.append(y)
        xs = new_xs
        last_stage = si == len(stages_cfg) - 1
        for mi in range(num_modules):
            mso = not (last_stage and mi == num_modules - 1)
            tmod = f"stage{si + 2}.{mi}"
            outs = []
            for br in range(nb):
                y = xs[br]
                for bi in range(num_blocks[br]):
                    tp = f"{tmod}.branches.{br}.{bi}"
                    y = (_basic_block(g, y, tp, 1) if block == "BASIC"
                         else _bottleneck(g, y, tp, 1))
                outs.append(y)
            n_out = nb if mso else 1
            fused = []
            for i in range(n_out):
                acc = None
                for j in range(nb):
                    base = f"{tmod}.fuse_layers.{i}.{j}"
                    if j > i:
                        y = g.conv(outs[j], f"{base}.0", pad=0)
                        y = g.bn(y, f"{base}.1")
                        y = g.upsample(y, 2 ** (j - i), mode="nearest")
                    elif j == i:
                        if f"{base}.0.weight" in g.sd:
                            # last-module widening 1x1, no BN
                            y = g.conv(outs[j], f"{base}.0", pad=0)
                        else:
                            y = outs[j]
                    else:
                        y = outs[j]
                        for k in range(i - j):
                            y = g.conv(y, f"{base}.{k}.0", stride=2)
                            y = g.bn(y, f"{base}.{k}.1")
                            if k != i - j - 1:
                                y = g.relu(y)
                    acc = y if acc is None else g.add(acc, y)
                fused.append(g.relu(acc))
            xs = fused if mso else fused + xs[1:]
        prev_ch = list(width)

    pad = 1 if final_conv_kernel == 3 else 0
    x = g.conv(xs[0], "final_layer", pad=pad, out="output")
    out_ch = num_joints * 3 if target_type == "offset" else num_joints
    return g.finish("images", (batch, 3, h, w), "output",
                    (batch, out_ch, h // 4, w // 4),
                    doc=f"pose_hrnet {w}x{h}")


def export_onnx_from_cfg(variables, cfg, batch: int = 1) -> bytes:
    """flax variables + config → serialized ONNX ModelProto."""
    from ..utils.torch_convert import flax_to_torch_from_cfg
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    sd = flax_to_torch_from_cfg(variables, cfg)
    if name == "pose_resnet":
        return build_pose_resnet(
            sd, extra.NUM_LAYERS, cfg.MODEL.NUM_JOINTS,
            cfg.MODEL.TARGET_TYPE, cfg.MODEL.IMAGE_SIZE,
            final_conv_kernel=extra.FINAL_CONV_KERNEL, batch=batch)
    if name == "pose_hrnet":
        from ..models.hrnet import stage_cfg
        stages = tuple(
            stage_cfg(extra[k]["NUM_MODULES"], extra[k]["NUM_BRANCHES"],
                      extra[k]["BLOCK"], extra[k]["NUM_BLOCKS"],
                      extra[k]["NUM_CHANNELS"])
            for k in ("STAGE2", "STAGE3", "STAGE4"))
        return build_pose_hrnet(
            sd, stages, cfg.MODEL.NUM_JOINTS, cfg.MODEL.TARGET_TYPE,
            cfg.MODEL.IMAGE_SIZE,
            final_conv_kernel=extra.FINAL_CONV_KERNEL, batch=batch)
    if name == "rsn":
        from .onnx_rsn import build_rsn
        return build_rsn(sd, cfg, batch=batch)
    raise KeyError(f"no ONNX emitter for model {name!r} "
                   "(supported: pose_resnet, pose_hrnet, rsn)")
