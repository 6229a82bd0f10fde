"""Inference engine tests: YOLO post, crop geometry, detect-then-pose E2E."""

import cv2
import os
import numpy as np
import pytest

from udp_pose_tpu.ops import yolo
from udp_pose_tpu.ops.affine import classic_affine_matrix, warp_affine


def test_letterbox_shape_and_padding_value():
    # 480x640 with target 640: r=1, mod-32 padding is zero → unchanged
    img = np.full((480, 640, 3), 50, np.uint8)
    out = yolo.letterbox(img, 640)
    assert out.shape == (480, 640, 3)
    # 500x640: pads 500 → 512 with value-114 bands top+bottom
    img2 = np.full((500, 640, 3), 50, np.uint8)
    out2 = yolo.letterbox(img2, 640)
    assert out2.shape == (512, 640, 3)
    assert (out2[:6] == 114).all() and (out2[-6:] == 114).all()
    assert (out2[6:-6] == 50).all()


def test_scale_boxes_roundtrip():
    rng = np.random.default_rng(90)
    img_hw = (480, 640)
    boxes = np.array([[100.0, 50.0, 300.0, 400.0]])
    r = min(640 / img_hw[0], 640 / img_hw[1])
    pad_y = (640 - img_hw[0] * r) / 2
    lb_boxes = boxes * r + np.array([0, pad_y, 0, pad_y])
    back = yolo.scale_boxes(lb_boxes.copy(), img_hw, (640, 640))
    np.testing.assert_allclose(back, boxes, atol=1.0)


def test_non_max_suppression_semantics():
    # two overlapping persons + one dog; raw (1, N, 5+nc)
    nc = 3
    pred = np.zeros((1, 4, 5 + nc), np.float32)
    pred[0, 0] = [100, 100, 50, 80, 0.9, 0.99, 0.005, 0.005]   # person
    pred[0, 1] = [104, 102, 50, 80, 0.8, 0.98, 0.01, 0.01]     # dup person
    pred[0, 2] = [300, 300, 40, 40, 0.85, 0.01, 0.98, 0.01]    # class 1
    pred[0, 3] = [10, 10, 5, 5, 0.01, 0.99, 0.005, 0.005]      # low conf
    out = yolo.non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45)[0]
    assert out.shape[0] == 2                       # dup + low-conf removed
    classes = sorted(out[:, 5].astype(int).tolist())
    assert classes == [0, 1]                       # class offset kept dog
    out_p = yolo.non_max_suppression(pred, classes=[0])[0]
    assert (out_p[:, 5] == 0).all()


def test_padding_bbox_and_yolo2xyxy():
    assert yolo.padding_bbox(2, 3, 630, 470, (480, 640)) == (0, 0, 635, 475)
    # configurable pad (inference_engine.py --padding)
    assert yolo.padding_bbox(20, 30, 100, 200, (480, 640), pad=10) == \
        (10, 20, 110, 210)
    assert yolo.padding_bbox(20, 30, 100, 200, (480, 640), pad=0) == \
        (20, 30, 100, 200)
    x1, y1, x2, y2 = yolo.yolo2xyxy((480, 640), (0.5, 0.5, 0.25, 0.5))
    assert (x1, y1, x2, y2) == (239, 119, 399, 359)


def test_classic_inv_matrix_matches_cv2_forward_warp():
    """Engine crops (gather with inv matrix) == cv2.warpAffine with the
    forward matrix (pose_engine.py:73-80 semantics)."""
    rng = np.random.default_rng(91)
    base = rng.uniform(0, 255, (12, 16)).astype(np.float32)
    img = cv2.resize(base, (320, 240), interpolation=cv2.INTER_CUBIC)
    img = np.stack([img] * 3, -1)
    center = np.array([150.0, 120.0], np.float32)
    scale = np.array([0.6, 0.8], np.float32)
    out_wh = (192, 256)
    fwd = np.asarray(classic_affine_matrix(center, scale, 0.0, out_wh,
                                           inv=False))
    gold = cv2.warpAffine(img, fwd, out_wh, flags=cv2.INTER_LINEAR)
    inv = np.asarray(classic_affine_matrix(center, scale, 0.0, out_wh,
                                           inv=True))
    got = np.asarray(warp_affine(img, inv, (out_wh[1], out_wh[0])))
    assert np.abs(got - gold).mean() < 0.5
    assert np.abs(got - gold).max() < 6.0


def test_pose_pipeline_e2e():
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.DATASET.DATASET = "coco"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TEST.FLIP_TEST = True
    cfg.TPU.DTYPE = "float32"
    pipe = UdpPosePipeline(cfg, weights=None)

    rng = np.random.default_rng(92)
    frame = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 80, 220, 400], [300, 60, 420, 460],
                      [50, 50, 150, 300]], np.float32)
    kps, maxvals = pipe.infer_pose(frame, boxes)
    assert kps.shape == (3, 17, 2)
    assert maxvals.shape == (3, 17, 1)
    assert np.isfinite(kps).all()
    # bucket padding: 3 boxes pad to 4; one jitted closure serves every
    # bucket size (jax.jit caches per shape — no per-bucket closures)
    assert pipe._infer is not None
    kps2, _ = pipe.infer_pose(frame, np.tile(boxes[:1], (4, 1)))
    assert kps2.shape == (4, 17, 2)
    # empty boxes path
    kps0, mv0 = pipe.infer_pose(frame, np.zeros((0, 4), np.float32))
    assert kps0.shape == (0, 17, 2)
    # keypoints land inside their boxes' neighbourhood (crop geometry sane)
    for i, b in enumerate(boxes):
        cx = kps[i, :, 0].mean()
        assert b[0] - 100 < cx < b[2] + 100


def test_label_box_detector(tmp_path):
    from udp_pose_tpu.engine.detector import LabelBoxDetector
    img = np.zeros((480, 640, 3), np.uint8)
    (tmp_path / "img1.txt").write_text("0 0.5 0.5 0.25 0.5\n1 0.2 0.2 0.1 0.1\n")
    det = LabelBoxDetector(str(tmp_path))
    boxes = det.infer_for(img, "some/dir/img1.jpg")
    assert boxes.shape == (1, 4)
    assert det.infer_for(img, "some/dir/missing.jpg") is None


def test_pose_pipeline_loads_reference_pth(tmp_path):
    """A torch checkpoint saved from the *reference* pose_resnet loads
    through UdpPosePipeline(.pth) and matches direct conversion."""
    import os
    import sys
    import types
    import importlib
    REF = "/root/reference/deep_hrnet/lib/models"
    if not os.path.isdir(REF):
        import pytest
        pytest.skip("no reference")
    import torch
    import jax.numpy as jnp
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline

    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF]
        sys.modules["refmodels"] = pkg
    ref = importlib.import_module("refmodels.pose_resnet")

    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.DATASET.DATASET = "coco"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    tmodel = ref.get_pose_net(cfg, is_train=False)
    # DataParallel-style module. prefixes must be stripped on load
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    pth = tmp_path / "w.pth"
    torch.save(sd, pth)

    pipe = UdpPosePipeline(cfg, weights=str(pth), flip_test=False)
    rng = np.random.default_rng(150)
    frame = rng.integers(0, 255, (300, 400, 3), np.uint8)
    boxes = np.array([[80, 40, 240, 280]], np.float32)
    kps, maxvals = pipe.infer_pose(frame, boxes)
    assert kps.shape == (1, 17, 2)
    assert np.isfinite(kps).all()


def test_pose_pipeline_mesh_sharded_matches_single():
    """UdpPosePipeline(mesh=...) shards crop batches over the 'data' axis
    (multi-chip serving); outputs must equal the single-device pipeline."""
    import jax
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline
    from udp_pose_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")

    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.DATASET.DATASET = "coco"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TEST.FLIP_TEST = True
    cfg.TPU.DTYPE = "float32"

    single = UdpPosePipeline(cfg, weights=None)
    sharded = UdpPosePipeline(cfg, weights=single.variables,
                              mesh=make_mesh(-1, 1))

    rng = np.random.default_rng(17)
    frame = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.stack([[40 + 60 * i, 50, 140 + 60 * i, 420]
                      for i in range(6)]).astype(np.float32)
    k1, m1 = single.infer_pose(frame, boxes)
    k2, m2 = sharded.infer_pose(frame, boxes)
    np.testing.assert_allclose(k2, k1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(m2, m1, rtol=1e-5, atol=1e-5)


def test_pipeline_loads_onnx_artifact(tmp_path):
    """UdpPosePipeline(weights='x.onnx') — the reference's UdpPsaPoseOnnx
    surface (pose_engine.py:130-151) on the native path: the exported
    graph's initializers are reference-format torch tensors, so a .onnx
    artifact round-trips into flax and the pipeline's keypoints equal
    the original weights'."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_onnx_export import _base_cfg, _small_variables

    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline
    from udp_pose_tpu.export import export_onnx_from_cfg
    from udp_pose_tpu.models import build_model

    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TEST.FLIP_TEST = False
    model = build_model(cfg)
    variables = _small_variables(model, (1, 128, 96, 3), seed=2)
    blob = export_onnx_from_cfg(variables, cfg, batch=1)
    onnx_path = str(tmp_path / "tiny.onnx")
    with open(onnx_path, "wb") as f:
        f.write(blob)

    rng = np.random.default_rng(8)
    frame = rng.integers(0, 255, (200, 150, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 120, 180]], np.float32)

    ref_pipe = UdpPosePipeline(cfg, variables)
    kp_ref, mv_ref = ref_pipe.infer_pose(frame, boxes)
    onnx_pipe = UdpPosePipeline(cfg, onnx_path)
    kp, mv = onnx_pipe.infer_pose(frame, boxes)
    np.testing.assert_allclose(kp, kp_ref, atol=1e-3)
    np.testing.assert_allclose(mv, mv_ref, atol=1e-5)
