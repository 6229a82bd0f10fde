"""Reference evaluator for exported ONNX graphs (verification oracle).

The image has no onnxruntime, so exported artifacts are verified by
parsing the serialized bytes back (export/onnx_pb.load_model) and
executing each node with CPU torch functional ops, implementing opset-11
semantics per the public ONNX operator spec.  Mirrors the reference's
export check (deep_hrnet/tools/export.py:45-56: onnxruntime session run
+ assert_allclose vs torch) with the runtime swapped for this evaluator.

Not a deployment engine — a spec-faithful oracle for tests/CLI checks.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .onnx_pb import ModelP, NodeP, load_model


def _t(x):
    import torch
    return torch.from_numpy(np.ascontiguousarray(x))


def run_model(model_bytes: bytes, inputs: Dict[str, np.ndarray],
              ) -> Dict[str, np.ndarray]:
    """Execute a serialized ONNX model; returns {output_name: array}."""
    import torch
    import torch.nn.functional as F

    model = load_model(model_bytes) if isinstance(model_bytes, bytes) \
        else model_bytes
    g = model.graph
    env: Dict[str, "torch.Tensor"] = {}
    for init in g.initializers:
        env[init.name] = _t(init.array)
    for name, _shape in g.inputs:
        if name not in inputs:
            if name in env:  # initializer doubling as input
                continue
            raise KeyError(f"missing graph input {name}")
        env[name] = _t(np.asarray(inputs[name], np.float32))

    for node in g.nodes:
        _exec(node, env, F, torch)

    return {name: env[name].numpy() for name, _ in g.outputs}


def _pads4(node) -> Sequence[int]:
    p = node.attrs.get("pads", [0, 0, 0, 0])
    return [int(x) for x in p]


def _exec(node: NodeP, env, F, torch):
    op = node.op_type
    i = [env[x] for x in node.inputs if x != ""]
    a = node.attrs
    if op == "Conv":
        t, l, b, r = _pads4(node)
        x = F.pad(i[0], (l, r, t, b)) if (t, l, b, r) != (0, 0, 0, 0) else i[0]
        y = F.conv2d(x, i[1], i[2] if len(i) > 2 else None,
                     stride=[int(s) for s in a.get("strides", [1, 1])],
                     dilation=[int(d) for d in a.get("dilations", [1, 1])],
                     groups=int(a.get("group", 1)))
    elif op == "ConvTranspose":
        t, l, b, r = _pads4(node)
        assert t == b and l == r, "asymmetric ConvTranspose pads unsupported"
        y = F.conv_transpose2d(
            i[0], i[1], i[2] if len(i) > 2 else None,
            stride=[int(s) for s in a.get("strides", [1, 1])],
            padding=[t, l],
            output_padding=[int(x) for x in a.get("output_padding", [0, 0])],
            groups=int(a.get("group", 1)))
    elif op == "BatchNormalization":
        x, scale, bias, mean, var = i[:5]
        y = F.batch_norm(x, mean, var, scale, bias, training=False,
                         eps=float(a.get("epsilon", 1e-5)))
    elif op == "Relu":
        y = F.relu(i[0])
    elif op == "Sigmoid":
        y = torch.sigmoid(i[0])
    elif op == "HardSigmoid":
        alpha = float(a.get("alpha", 0.2))
        beta = float(a.get("beta", 0.5))
        y = torch.clamp(alpha * i[0] + beta, 0.0, 1.0)
    elif op == "Clip":
        lo = i[1].item() if len(i) > 1 else float(a.get("min", -np.inf))
        hi = i[2].item() if len(i) > 2 else float(a.get("max", np.inf))
        y = torch.clamp(i[0], lo, hi)
    elif op == "Add":
        y = i[0] + i[1]
    elif op == "Sub":
        y = i[0] - i[1]
    elif op == "Mul":
        y = i[0] * i[1]
    elif op == "Div":
        y = i[0] / i[1]
    elif op == "Concat":
        y = torch.cat(i, dim=int(a["axis"]))
    elif op == "MaxPool":
        t, l, b, r = _pads4(node)
        x = F.pad(i[0], (l, r, t, b), value=-float("inf"))
        y = F.max_pool2d(x, [int(k) for k in a["kernel_shape"]],
                         stride=[int(s) for s in a.get("strides", [1, 1])])
    elif op == "AveragePool":
        t, l, b, r = _pads4(node)
        # ONNX default count_include_pad=0: pads are excluded from the
        # divisor, unlike zero-pad + avg_pool2d
        assert t == b and l == r, "asymmetric AveragePool pads unsupported"
        assert not int(a.get("count_include_pad", 0)), "unsupported"
        y = F.avg_pool2d(i[0], [int(k) for k in a["kernel_shape"]],
                         stride=[int(s) for s in a.get("strides", [1, 1])],
                         padding=[t, l], count_include_pad=False)
    elif op == "GlobalAveragePool":
        y = i[0].mean(dim=(2, 3), keepdim=True)
    elif op == "Resize":
        scales = i[2].numpy() if len(i) > 2 else None
        mode = a.get("mode", b"nearest")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        ctm = a.get("coordinate_transformation_mode", b"half_pixel")
        ctm = ctm.decode() if isinstance(ctm, bytes) else ctm
        sh, sw = float(scales[2]), float(scales[3])
        if mode == "nearest":
            assert ctm == "asymmetric", ctm
            y = F.interpolate(i[0], scale_factor=(sh, sw), mode="nearest")
        else:
            y = F.interpolate(i[0], scale_factor=(sh, sw), mode="bilinear",
                              align_corners=(ctm == "align_corners"))
    elif op == "Gemm":
        x = i[0]
        w = i[1].t() if int(a.get("transB", 0)) else i[1]
        y = x @ w
        if len(i) > 2:
            y = y + i[2]
    elif op == "MatMul":
        y = i[0] @ i[1]
    elif op == "Softmax":
        # opset-11 semantics: flatten to 2D at `axis`, softmax the tail
        ax = int(a.get("axis", 1))
        shp = i[0].shape
        y = F.softmax(i[0].reshape(int(np.prod(shp[:ax])), -1),
                      dim=1).reshape(shp)
    elif op == "Sqrt":
        y = torch.sqrt(i[0])
    elif op == "ReduceMean":
        y = i[0].mean(dim=[int(d) for d in a["axes"]],
                      keepdim=bool(a.get("keepdims", 1)))
    elif op == "ReduceSum":
        y = i[0].sum(dim=[int(d) for d in a["axes"]],
                     keepdim=bool(a.get("keepdims", 1)))
    elif op == "Slice":
        # opset 11: data, starts, ends, axes, steps (all tensors)
        starts = [int(v) for v in i[1].tolist()]
        ends = [int(v) for v in i[2].tolist()]
        axes = ([int(v) for v in i[3].tolist()] if len(i) > 3
                else list(range(len(starts))))
        steps = ([int(v) for v in i[4].tolist()] if len(i) > 4
                 else [1] * len(starts))
        y = i[0]
        for s, e, ax, st in zip(starts, ends, axes, steps):
            idx = torch.arange(s, min(e, y.shape[ax]), st)
            y = y.index_select(ax, idx)
    elif op == "DepthToSpace":
        mode = a.get("mode", b"DCR")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        assert mode == "CRD", mode   # == torch pixel_shuffle
        y = F.pixel_shuffle(i[0], int(a["blocksize"]))
    elif op == "Reshape":
        # 0 copies the input dim (allowzero=0), -1 infers
        dims = [int(d) for d in i[1].tolist()]
        dims = [i[0].shape[k] if d == 0 else d for k, d in enumerate(dims)]
        y = i[0].reshape(dims)
    elif op == "Transpose":
        y = i[0].permute([int(p) for p in a["perm"]])
    elif op == "Split":
        parts = torch.split(i[0], [int(s) for s in a["split"]],
                            dim=int(a["axis"]))
        for out_name, part in zip(node.outputs, parts):
            env[out_name] = part
        return
    elif op == "Identity":
        y = i[0]
    else:
        raise NotImplementedError(f"op {op}")
    env[node.outputs[0]] = y


def check_model(model_bytes: bytes, x_nchw: np.ndarray,
                expected_nchw: np.ndarray, rtol=1e-3, atol=1e-4) -> float:
    """Run + compare (the reference's assert_allclose pattern,
    export.py:56).  Returns max abs error."""
    model = load_model(model_bytes)
    in_name = model.graph.inputs[0][0]
    out_name = model.graph.outputs[0][0]
    got = run_model(model, {in_name: x_nchw})[out_name]
    np.testing.assert_allclose(got, expected_nchw, rtol=rtol, atol=atol)
    return float(np.abs(got - expected_nchw).max())
