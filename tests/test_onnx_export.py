"""ONNX export: wire-format round-trip + numerical parity vs flax.

Mirrors the reference's export check (deep_hrnet/tools/export.py:45-56:
export → run in an ONNX runtime → assert_allclose vs the source model),
with onnxruntime replaced by the in-repo spec evaluator
(udp_pose_tpu/export/onnx_eval.py) since the image has no onnx package.
Weight magnitudes follow tests/test_torch_convert._randomize so fp32
cross-framework accumulation noise stays within the same tolerances.
"""

import numpy as np
import pytest

from udp_pose_tpu.config import default_config
from udp_pose_tpu.models import build_model

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _base_cfg(name, target_type):
    cfg = default_config()
    cfg.MODEL.NAME = name
    cfg.MODEL.TARGET_TYPE = target_type
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TPU.DTYPE = "float32"
    return cfg


def _small_variables(model, shape, seed=0):
    """Init then rescale with fan-in-normalised kernels so activations
    stay O(1) through deep stacks — keeps fp32 cross-framework noise
    within the parity tolerances (the output would otherwise explode to
    ~1e3 and amplify accumulation differences)."""
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros(shape, jnp.float32), train=False)
    rng = np.random.default_rng(seed)

    def rand_leaf(path, leaf):
        name = "/".join(str(p.key) for p in path)
        arr = np.asarray(leaf)
        if name.endswith("var"):
            return rng.uniform(0.5, 1.5, arr.shape).astype(np.float32)
        if name.endswith("mean"):
            return (rng.standard_normal(arr.shape) * 0.1).astype(np.float32)
        if name.endswith("scale"):
            return rng.uniform(0.5, 1.5, arr.shape).astype(np.float32)
        if name.endswith("kernel") and arr.ndim >= 2:
            fan_in = int(np.prod(arr.shape[:-1]))
            std = 0.7 / np.sqrt(fan_in)
            return (rng.standard_normal(arr.shape) * std).astype(np.float32)
        return (rng.standard_normal(arr.shape) * 0.05).astype(np.float32)

    return jax.tree_util.tree_map_with_path(rand_leaf, variables)


def _roundtrip_and_check(cfg, batch=2, atol=3e-4):
    from udp_pose_tpu.export import check_model, export_onnx_from_cfg
    from udp_pose_tpu.export.onnx_pb import load_model

    w, h = cfg.MODEL.IMAGE_SIZE
    model = build_model(cfg)
    variables = _small_variables(model, (1, h, w, 3))
    blob = export_onnx_from_cfg(variables, cfg, batch=batch)

    # wire-format round-trip: parse what we serialized
    m = load_model(blob)
    assert m.opset == 11 and m.ir_version == 6
    assert m.graph.inputs[0][0] == "images"
    assert m.graph.inputs[0][1] == [batch, 3, h, w]
    # weights are f32; Reshape-shape helpers are the only int64 tensors
    assert all(init.array.dtype in (np.float32, np.int64)
               for init in m.graph.initializers)
    assert all(init.array.dtype == np.float32
               for init in m.graph.initializers if "." in init.name)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(batch, 3, h, w)).astype(np.float32)
    y = np.asarray(model.apply(variables, x.transpose(0, 2, 3, 1),
                               train=False)).transpose(0, 3, 1, 2)
    err = check_model(blob, x, y, rtol=1e-3, atol=atol)
    return blob, err


@pytest.mark.parametrize("layers,target", [(18, "gaussian"),
                                           (50, "offset")])
def test_onnx_pose_resnet(layers, target):
    cfg = _base_cfg("pose_resnet", target)
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": layers, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    blob, err = _roundtrip_and_check(cfg)
    assert len(blob) > 10000


HRNET_EXTRA_SMALL = {
    "FINAL_CONV_KERNEL": 1,
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [16, 32],
               "FUSE_METHOD": "SUM"},
    "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [16, 32, 64],
               "FUSE_METHOD": "SUM"},
    "STAGE4": {"NUM_MODULES": 2, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1, 1],
               "NUM_CHANNELS": [16, 32, 64, 128], "FUSE_METHOD": "SUM"},
}


@pytest.mark.parametrize("target", ["gaussian", "offset"])
def test_onnx_pose_hrnet(target):
    """Covers transitions, all fuse directions, and the last-module ×4
    widening (2 modules in stage 4 exercise both mso regimes)."""
    cfg = _base_cfg("pose_hrnet", target)
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_EXTRA_SMALL)
    _roundtrip_and_check(cfg)


def test_onnx_pose_resnet_psa():
    """PSA_s gates (softmax attention pools + LayerNorm[C,1,1])."""
    cfg = _base_cfg("pose_resnet_psa", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    _roundtrip_and_check(cfg)


def test_onnx_pose_hrnet_psa():
    cfg = _base_cfg("pose_hrnet_psa", "offset")
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_EXTRA_SMALL)
    _roundtrip_and_check(cfg)


def _mobile_cfg(name, target="gaussian", head_extra=None, **extra):
    cfg = _base_cfg(name, target)
    base = {"NUM_DECONV_LAYERS": 2, "NUM_DECONV_FILTERS": [128, 128],
            "NUM_DECONV_KERNELS": [4, 4], "DECONV_WITH_BIAS": False,
            "FINAL_CONV_KERNEL": 1, "START_CHANNELS": 128,
            "ARCHITECTURE": [256, 128, 64]}
    base.update(extra)
    base.update(head_extra or {})
    cfg.MODEL.EXTRA.merge_from_dict(base)
    return cfg


@pytest.mark.parametrize("name,extra", [
    ("pose_shufflenetv2_plus", {"MODEL_SIZE": "Small"}),
    ("pose_shufflenetv2_plus_pixel_shuffle", {"MODEL_SIZE": "Small"}),
    ("pose_shufflenetv2_10x", {"MODEL_SIZE": "1.0x"}),
    ("pose_shufflenetv2_10x_pixel_shuffle", {"MODEL_SIZE": "1.0x"}),
    ("pose_mobilenetv3_small", {}),
    ("pose_mobilenetv3_small_pixel_shuffle", {}),
])
def test_onnx_pose_mobile(name, extra):
    """ShuffleNetV2(+)/MobileNetV3 emitters: strided-Slice channel split,
    HardSigmoid SE gates, DepthToSpace pixel shuffle."""
    cfg = _mobile_cfg(name, **extra)
    _roundtrip_and_check(cfg)


@pytest.mark.parametrize("name,extra", [
    ("pose_mobilevit_pixel_shuffle", {"MODEL_SIZE": "xxs"}),
    ("pose_mobilevitv2_pixel_shuffle", {"MODEL_SIZE": 0.5}),
])
def test_onnx_pose_mobilevit(name, extra):
    """ViT emitters: unfold/fold as Reshape/Transpose, MatMul MHA (v1),
    separable linear attention (v2).  64-wide input keeps every vit stage
    patch-divisible (the fixed-shape export contract)."""
    cfg = _mobile_cfg(name, target="offset", **extra)
    cfg.MODEL.IMAGE_SIZE = [64, 128]
    cfg.MODEL.HEATMAP_SIZE = [16, 32]
    _roundtrip_and_check(cfg)


@pytest.mark.parametrize("extra", [
    {"STAGE_NUM": 2, "LAYERS": [1, 1, 1, 1]},            # chained stages
    {"STAGE_NUM": 1, "LAYERS": [1, 1, 1, 1],             # SE/PRM variant
     "USE_SE": True, "USE_PRM": True},
])
def test_onnx_rsn(extra):
    """RSN export: residual-steps splits, dual skip chaining, bilinear
    align-corners Resize, SE/PRM gates."""
    cfg = _base_cfg("rsn", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict(extra)
    _roundtrip_and_check(cfg, atol=5e-4)


def test_onnx_initializer_names_are_reference_keys():
    """Initializers carry the reference torch key names, so the graph is
    diffable against the reference's own torch→ONNX export."""
    from udp_pose_tpu.export import export_onnx_from_cfg
    from udp_pose_tpu.export.onnx_pb import load_model

    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    model = build_model(cfg)
    variables = _small_variables(model, (1, 128, 96, 3))
    blob = export_onnx_from_cfg(variables, cfg)
    names = {t.name for t in load_model(blob).graph.initializers}
    for expected in ("conv1.weight", "bn1.running_mean",
                     "layer1.0.conv1.weight", "layer4.1.bn2.bias",
                     "deconv_layers.0.weight", "final_layer.bias"):
        assert expected in names, expected


def test_onnx_protoc_decodable():
    """The serialized bytes are valid protobuf wire format end-to-end
    (protoc --decode_raw parses the whole message)."""
    import shutil
    import subprocess

    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [32, 32], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    from udp_pose_tpu.export import export_onnx_from_cfg
    model = build_model(cfg)
    variables = _small_variables(model, (1, 128, 96, 3))
    blob = export_onnx_from_cfg(variables, cfg)
    out = subprocess.run(["protoc", "--decode_raw"], input=blob,
                         capture_output=True)
    assert out.returncode == 0, out.stderr[:400]
    text = out.stdout.decode(errors="replace")
    assert text.startswith("1: 6")  # ir_version = 6


def test_onnx_attr_wire_roundtrip():
    """Attribute encoder/decoder agree for every attribute kind."""
    from udp_pose_tpu.export.onnx_pb import (AttrP, NodeP, _parse_node)

    node = NodeP("Fake", ["a"], ["b"], name="n", attrs={
        "f_attr": 1.5, "i_attr": -3, "s_attr": "nearest",
        "ints_attr": [1, -2, 3], "floats_attr": [0.5, 1.5],
        "strings_attr": ["x", "y"],
    })
    back = _parse_node(node.dumps())
    assert back.op_type == "Fake"
    assert back.attrs["f_attr"] == 1.5
    assert back.attrs["i_attr"] == -3
    assert back.attrs["s_attr"] == b"nearest"
    assert back.attrs["ints_attr"] == [1, -2, 3]
    assert back.attrs["floats_attr"] == [0.5, 1.5]
    assert back.attrs["strings_attr"] == [b"x", b"y"]


def test_onnx_yolov5():
    """Native YOLOv5 detector export: CSP/SPPF/PANet + anchor decode must
    reproduce the flax raw predictions row-for-row."""
    from udp_pose_tpu.export.onnx_eval import run_model
    from udp_pose_tpu.export.onnx_pb import load_model
    from udp_pose_tpu.export.onnx_yolo import build_yolov5
    from udp_pose_tpu.models.yolov5 import YOLOv5
    from udp_pose_tpu.utils.torch_convert import flax_to_torch_yolov5

    model = YOLOv5(variant="n")
    s = 128
    variables = _small_variables(model, (1, s, s, 3), seed=4)
    sd = flax_to_torch_yolov5(variables)
    blob = build_yolov5(sd, "n", image_hw=(s, s), batch=2)

    m = load_model(blob)
    assert m.graph.inputs[0][1] == [2, 3, s, s]

    rng = np.random.default_rng(8)
    x = rng.random((2, s, s, 3)).astype(np.float32)
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    got = run_model(m, {"images": x.transpose(0, 3, 1, 2)})["output"]
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_yolov5_reverse_roundtrip():
    """flax → ultralytics sd → flax must be exact."""
    from udp_pose_tpu.models.yolov5 import YOLOv5
    from udp_pose_tpu.utils.torch_convert import (convert_yolov5,
                                                  flax_to_torch_yolov5)
    model = YOLOv5(variant="n")
    variables = _small_variables(model, (1, 64, 64, 3), seed=2)
    sd = flax_to_torch_yolov5(variables)
    back, unused = convert_yolov5(sd, "n")
    assert not unused, unused[:8]
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_b[path]),
                                      np.asarray(leaf),
                                      err_msg=str(path))
