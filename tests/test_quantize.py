"""int8 PTQ serving mode (models/quantize.py).

The reference only reaches int8 through MNN/OpenVINO export
(deep_hrnet/scripts/export_mnn.sh); here it is a native serving mode:
amax-calibrated w8a8 convs via a flax interceptor.  These tests pin
(a) numerical closeness to the fp pipeline on a *trained* model — the
regime where PTQ must hold, (b) the exact-fallback contract (un-quantized
sites run the original module code bitwise), (c) calibration persistence,
and (d) the self-calibrating UdpPosePipeline and TPU.QUANTIZE CLI surface.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from udp_pose_tpu.config import default_config
from udp_pose_tpu.core.infer import make_infer_fn
from udp_pose_tpu.core.loss import make_loss_fn
from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                     normalize_images)
from udp_pose_tpu.models import build_model
from udp_pose_tpu.models.quantize import (QuantizedModel, calibrate,
                                          load_act_scales, save_act_scales)
from udp_pose_tpu.ops.targets import batch_gaussian_targets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg():
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def trained():
    """Tiny pose_resnet overfit on 8 fixed images until heatmaps peak
    decisively (the regime where int8-vs-fp agreement is meaningful)."""
    cfg = _tiny_cfg()
    cfg.TRAIN.LR = 3e-3
    model = build_model(cfg)
    rng = np.random.default_rng(7)
    B, J = 2, 17
    images = rng.integers(0, 256, (B, 64, 64, 3)).astype(np.uint8)
    joints = rng.uniform(8, 56, (B, J, 2)).astype(np.float32)
    vis = np.ones((B, J), np.float32)
    target, weight = batch_gaussian_targets(
        jnp.asarray(joints), jnp.asarray(vis), (16, 16), (64, 64), 2.0)
    batch = {"image": np.asarray(normalize_images(images)),
             "target": np.asarray(target), "target_weight": np.asarray(weight)}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(make_loss_fn(cfg))
    for _ in range(160):
        state, metrics = step(state, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # the gate that matters for PTQ comparison: heatmap peaks must be
    # decisive (land at the trained joints), not a particular loss value
    infer = make_infer_fn(model, target_type="gaussian", flip_test=False)
    center = np.tile(np.array([[32.0, 32.0]], np.float32), (B, 1))
    scale = np.tile(np.array([[0.32, 0.32]], np.float32), (B, 1))
    p, _, _ = infer(variables, images, center, scale)
    dist = np.linalg.norm(np.asarray(p) - joints, axis=-1)
    assert np.median(dist) < 3.0, f"overfit not decisive: {np.median(dist)}"
    return cfg, model, variables, images, joints


def test_quantized_close_to_fp_on_trained_model(trained):
    cfg, model, variables, images, joints = trained
    B = images.shape[0]
    center = np.tile(np.array([[32.0, 32.0]], np.float32), (B, 1))
    scale = np.tile(np.array([[0.32, 0.32]], np.float32), (B, 1))

    scales = calibrate(model, variables,
                       [jnp.asarray(normalize_images(images))])
    assert len(scales) > 10          # every plain conv except skips
    assert "final_layer" not in scales

    infer_fp = make_infer_fn(model, target_type="gaussian", flip_test=True)
    infer_q = make_infer_fn(QuantizedModel(model, scales),
                            target_type="gaussian", flip_test=True)
    p_fp, mv_fp, _ = infer_fp(variables, images, center, scale)
    p_q, mv_q, _ = infer_q(variables, images, center, scale)
    d = np.abs(np.asarray(p_fp) - np.asarray(p_q))
    # source-space px: 64-px crop spans scale*200=64 source px here
    assert np.median(d) < 0.5, f"median quantization drift {np.median(d)}"
    assert (d < 2.0).mean() > 0.95, f"p95 drift {np.percentile(d, 95)}"
    # confidence drift bounded
    assert np.abs(np.asarray(mv_fp) - np.asarray(mv_q)).max() < 0.1


def test_unquantized_sites_bitwise_fallback(trained):
    """min_in_channels above every width / skip-all ⇒ the interceptor
    must reproduce the original module output exactly."""
    cfg, model, variables, images, _ = trained
    x = jnp.asarray(normalize_images(images[:2]))
    scales = calibrate(model, variables, [x])
    y_fp = model.apply(variables, x, train=False)
    for qm in (QuantizedModel(model, scales, min_in_channels=1 << 20),
               QuantizedModel(model, scales, skip=("*",))):
        y_q = qm.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(y_fp), np.asarray(y_q))


def test_act_scales_save_load_roundtrip(tmp_path, trained):
    cfg, model, variables, images, _ = trained
    scales = calibrate(model, variables,
                       [jnp.asarray(normalize_images(images[:2]))])
    p = str(tmp_path / "scales.json")
    save_act_scales(p, scales)
    back = load_act_scales(p)
    assert back.keys() == scales.keys()
    for k in scales:
        assert np.isclose(back[k], scales[k])


def test_calibration_running_amax_over_batches(trained):
    """calibrate() must keep the per-site MAX across batches, and a
    brighter batch must raise at least the stem site."""
    cfg, model, variables, images, _ = trained
    x1 = jnp.asarray(normalize_images(images[:2]))
    s1 = calibrate(model, variables, [x1])
    s12 = calibrate(model, variables, [x1, x1 * 2.0])
    assert all(s12[k] >= s1[k] - 1e-6 for k in s1)
    assert any(s12[k] > s1[k] * 1.5 for k in s1)


@pytest.mark.parametrize("family", ["shufflenet_ps", "mobilenetv3", "rsn"])
def test_zoo_quantizes_without_model_changes(family):
    """The interceptor claim — every Flax model in the zoo quantizes with
    zero model changes — checked on the families with distinctive conv
    shapes: grouped/channel-shuffle + DUC (shufflenetv2+ pixel-shuffle),
    depthwise + SE (mobilenetv3), multi-stage residual-steps (RSN)."""
    cfg = default_config()
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    if family == "shufflenet_ps":
        cfg.MODEL.NAME = "pose_shufflenetv2_plus_pixel_shuffle"
        cfg.MODEL.EXTRA.MODEL_SIZE = "Small"
        cfg.MODEL.EXTRA.START_CHANNELS = 64
        cfg.MODEL.EXTRA.ARCHITECTURE = [128, 128, 128]
        cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    elif family == "mobilenetv3":
        cfg.MODEL.NAME = "pose_mobilenetv3_small"
        cfg.MODEL.EXTRA.NUM_DECONV_LAYERS = 2
        cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [64, 64]
        cfg.MODEL.EXTRA.NUM_DECONV_KERNELS = [4, 4]
        cfg.MODEL.EXTRA.DECONV_WITH_BIAS = False
        cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    else:
        cfg.MODEL.NAME = "rsn"
        cfg.MODEL.EXTRA.STAGE_NUM = 2
        cfg.MODEL.EXTRA.UPSAMPLE_CHANNEL_NUM = 64
    model = build_model(cfg)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 1, (2, 128, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    scales = calibrate(model, variables, [x])
    assert len(scales) > 10, f"{family}: only {len(scales)} conv sites"
    qm = QuantizedModel(model, scales)
    y_fp = model.apply(variables, x, train=False)
    y_q = qm.apply(variables, x, train=False)
    assert len(qm.engaged) == len(scales), \
        f"{family}: {len(qm.engaged)}/{len(scales)} sites engaged"
    flat_fp = np.ravel(np.asarray(
        jax.tree_util.tree_leaves(y_fp)[0]))
    flat_q = np.ravel(np.asarray(jax.tree_util.tree_leaves(y_q)[0]))
    assert flat_q.shape == flat_fp.shape and np.isfinite(flat_q).all()
    # random-init closeness (loose): int8 should track fp structure
    denom = max(np.abs(flat_fp).max(), 1e-6)
    assert np.abs(flat_q - flat_fp).max() / denom < 0.25, \
        f"{family}: rel err {np.abs(flat_q - flat_fp).max() / denom}"


def test_rsn_heatmap_convs_stay_fp():
    """RSN's per-unit heatmap producers (res_conv2, models/rsn.py:233)
    feed the gaussian-blur quarter-offset decode directly — DEFAULT_SKIP
    must keep them fp both at calibration and at apply time."""
    cfg = default_config()
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.NAME = "rsn"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.EXTRA.STAGE_NUM = 2
    cfg.MODEL.EXTRA.UPSAMPLE_CHANNEL_NUM = 64
    model = build_model(cfg)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(0, 1, (2, 128, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), x, train=False)
    scales = calibrate(model, variables, [x])
    assert len(scales) > 10
    assert not any("res_conv2" in k for k in scales)
    # even a table that FORCES the sites in (skip=() calibration) must
    # not engage them at apply time — QuantizedModel re-applies the skip
    from udp_pose_tpu.models.quantize import collect_conv_amax
    forced = {k: float(v) for k, v in jax.device_get(
        collect_conv_amax(model, variables, x, train=False)).items()}
    assert any("res_conv2" in k for k in forced)
    qm = QuantizedModel(model, forced)
    qm.apply(variables, x, train=False)
    assert not any("res_conv2" in p for p in qm.engaged)
    assert len(qm.engaged) > 10


def test_prepare_variables_equal_and_idempotent(trained):
    """prepare_variables precomputes the per-channel int8 kernels once
    (a 'quant' collection) — the serving output must match the in-graph
    requant path (same math hoisted out of the step; not bitwise — XLA
    reassociates the kernel/scale divide differently across the two
    compilations, flipping the odd boundary weight by one int8 step),
    and preparing twice must be a no-op."""
    cfg, model, variables, images, _ = trained
    x = jnp.asarray(normalize_images(images))
    scales = calibrate(model, variables, [x])
    qm = QuantizedModel(model, scales)

    y_ingraph = qm.apply(variables, x, train=False)
    prepped = qm.prepare_variables(variables)
    assert "quant" in prepped
    assert qm.prepare_variables(prepped) is prepped      # idempotent
    y_prep = qm.apply(prepped, x, train=False)
    np.testing.assert_allclose(np.asarray(y_ingraph), np.asarray(y_prep),
                               rtol=0, atol=1e-3)
    # every engaged site got a prepared entry (none silently missing)
    qm2 = QuantizedModel(model, scales)
    qm2.apply(prepped, x, train=False)

    def paths(node, prefix=""):
        if "kernel_i8" in node:
            yield prefix.rstrip("/")
            return
        for k, v in node.items():
            yield from paths(v, prefix + k + "/")

    prepared_paths = set(paths(prepped["quant"]))
    assert qm2.engaged <= prepared_paths
    assert len(prepared_paths) == len(scales)


def test_serving_normalizer_matches_family():
    """int8 calibration must use the serving path's normalization: RSN's
    BGR constants differ from the ImageNet RGB ones (tools/test.py
    TPU.QUANTIZE calibrates through serving_normalizer)."""
    from udp_pose_tpu.core.infer import serving_normalizer
    from udp_pose_tpu.core.rsn import _rsn_normalize

    rsn_cfg = default_config()
    rsn_cfg.MODEL.NAME = "rsn"
    hr_cfg = default_config()
    hr_cfg.MODEL.NAME = "pose_hrnet"

    x = np.random.default_rng(0).integers(
        0, 256, (2, 8, 8, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(serving_normalizer(rsn_cfg)(x)),
        np.asarray(_rsn_normalize(x)))
    np.testing.assert_array_equal(
        np.asarray(serving_normalizer(hr_cfg)(x)),
        np.asarray(normalize_images(x)))
    # the two distributions genuinely differ — the bug this guards against
    assert np.abs(np.asarray(_rsn_normalize(x))
                  - np.asarray(normalize_images(x))).max() > 0.05


def test_quantized_conv_math_exact_vs_fp_oracle():
    """The interceptor's int8 conv (incl. grouped/depthwise, stride,
    explicit padding, bias) must equal an fp32 conv over the *dequantized*
    int8 operands — int32 accumulation is exact at these magnitudes, so
    any mismatch is a geometry/scale bug."""
    import flax.linen as nn
    from jax import lax

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(8, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name="c_strided")(x)
            x = nn.Conv(8, (3, 3), padding="SAME",
                        feature_group_count=8, name="c_depthwise")(x)
            x = nn.Conv(12, (1, 1), feature_group_count=4,
                        name="c_grouped")(x)
            return x

    model = M()
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    scales = calibrate(model, variables, [x], skip=())
    assert set(scales) == {"c_strided", "c_depthwise", "c_grouped"}
    y_q = QuantizedModel(model, scales, skip=()).apply(variables, x)

    # fp oracle: run the same module but with fake-quantized x and w
    def fake_quant_fwd(x):
        amaxes = dict(scales)

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if not isinstance(mod, nn.Conv):
                return next_fun(*args, **kwargs)
            k = mod.variables["params"]["kernel"]
            s_w = jnp.maximum(
                jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
            k_dq = jnp.clip(jnp.round(k / s_w), -127, 127) * s_w
            s_a = max(float(amaxes["/".join(mod.path)]), 1e-12) / 127.0
            x_dq = jnp.clip(jnp.round(args[0] / s_a), -127, 127) * s_a
            dn = lax.conv_dimension_numbers(
                x_dq.shape, k_dq.shape, ("NHWC", "HWIO", "NHWC"))
            pad = mod.padding if isinstance(mod.padding, str) \
                else tuple(tuple(p) for p in mod.padding)
            strides = (mod.strides if isinstance(mod.strides, tuple)
                       else (mod.strides, mod.strides))
            y = lax.conv_general_dilated(
                x_dq, k_dq, strides, pad, dimension_numbers=dn,
                feature_group_count=mod.feature_group_count)
            if mod.use_bias:
                y = y + mod.variables["params"]["bias"]
            return y

        with nn.intercept_methods(interceptor):
            return model.apply(variables, x)

    y_oracle = fake_quant_fwd(x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_oracle),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_lazy_int8_calibration(tmp_path):
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline
    cfg = _tiny_cfg()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False
    base = UdpPosePipeline(cfg, weights=None)
    pipe = UdpPosePipeline(cfg, weights=base.variables,
                           quantize="int8", calib_batches=2)
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[40, 30, 140, 200], [160, 40, 280, 220]], np.float32)

    kps1, _ = pipe.infer_pose(frame, boxes)          # calib batch 1 (bf16)
    assert pipe.act_scales is None and pipe._calib.seen == 1
    kps2, _ = pipe.infer_pose(frame, boxes)          # calib batch 2 → freeze
    assert pipe.act_scales is not None
    kps3, mv3 = pipe.infer_pose(frame, boxes)        # served int8
    assert kps3.shape == (2, 17, 2) and np.isfinite(kps3).all()
    # BOTH calibration calls serve the plain fp pipeline exactly
    kps_ref, _ = base.infer_pose(frame, boxes)
    np.testing.assert_allclose(kps1, kps_ref, atol=1e-5)
    np.testing.assert_allclose(kps2, kps_ref, atol=1e-5)

    # persisted table → a fresh engine skips calibration entirely
    p = str(tmp_path / "scales.json")
    pipe.save_act_scales(p)
    pipe2 = UdpPosePipeline(cfg, weights=base.variables,
                            quantize="int8", act_scales=p)
    kps4, _ = pipe2.infer_pose(frame, boxes)
    assert pipe2._calib.seen == 0
    np.testing.assert_allclose(kps4, kps3, atol=1e-4)


def test_int8_pipeline_sharded_over_mesh_matches_single(tmp_path):
    """int8 serving under a jax.sharding Mesh: the quantized crop-batch
    computation shards over the 'data' axis (GSPMD partitions the int8
    convs) and must match the single-device int8 pipeline exactly."""
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline
    from udp_pose_tpu.parallel import make_mesh

    cfg = _tiny_cfg()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False
    base = UdpPosePipeline(cfg, weights=None)
    rng = np.random.default_rng(17)
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[40, 30, 140, 200], [160, 40, 280, 220],
                      [10, 10, 90, 150]], np.float32)

    single = UdpPosePipeline(cfg, weights=base.variables,
                             quantize="int8", calib_batches=1)
    single.infer_pose(frame, boxes)               # calibrate + freeze
    kps_single, _ = single.infer_pose(frame, boxes)

    mesh = make_mesh(-1, 1)
    sharded = UdpPosePipeline(cfg, weights=base.variables, mesh=mesh,
                              quantize="int8",
                              act_scales=dict(single.act_scales))
    kps_mesh, _ = sharded.infer_pose(frame, boxes)
    np.testing.assert_allclose(kps_mesh, kps_single, atol=1e-4)


def test_fused_engine_int8_pose_subgraph(trained, tmp_path):
    """FusedDetectPose(pose_act_scales=...): the pose subgraph of the
    single-dispatch serving graph runs int8 from a precomputed table and
    tracks the fp fused engine on a trained model."""
    from udp_pose_tpu.engine.fused import FusedDetectPose
    cfg, model, variables, images, joints = trained
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False

    scales = calibrate(model, variables,
                       [jnp.asarray(normalize_images(images))])
    p = str(tmp_path / "scales.json")
    save_act_scales(p, scales)

    # stub detector emitting one fixed person box (letterbox coords)
    import flax.linen as nn

    class _Stub:
        def apply(self, v, x, train=False):
            pred = np.zeros((64, 85), np.float32)
            pred[:, 4] = 1e-4
            pred[0, :4] = (32, 32, 40, 56)
            pred[0, 4] = 0.95
            pred[0, 5] = 0.95
            return jnp.asarray(pred)[None]

    def mk(act):
        eng = FusedDetectPose(cfg, variables, yolo_variant="n",
                              max_persons=4, det_size=64, topk=16,
                              pose_act_scales=act)
        eng.yolo = _Stub()
        return eng

    rng = np.random.default_rng(23)
    frame = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
    out_fp = mk(None).infer_frame(frame)
    eng_q = mk(p)
    out_q = eng_q.infer_frame(frame)
    assert eng_q._pose._active_model().__class__.__name__ == \
        "QuantizedModel"
    kp_fp = np.asarray(out_fp["keypoints"])
    kp_q = np.asarray(out_q["keypoints"])
    assert kp_fp.shape == kp_q.shape and kp_fp.shape[0] >= 1
    d = np.abs(kp_q - kp_fp)
    assert np.median(d) < 1.0, f"fused int8 drift median {np.median(d)}"


def test_detector_int8_self_calibration_and_drift():
    """build_flax_yolo_detector(quantize='int8'): serves fp while
    recording amax on the first calib_batches frames, then switches to
    the int8 graph; raw head outputs track the fp detector (the detect
    heads stay fp via DEFAULT_SKIP)."""
    from udp_pose_tpu.engine.detector import build_flax_yolo_detector

    kw = dict(variant="n", input_size=64, device_topk=0)
    det_fp = build_flax_yolo_detector(**kw)
    det_q = build_flax_yolo_detector(quantize="int8", calib_batches=2,
                                     **kw)
    assert det_q.get_act_scales() is None
    rng = np.random.default_rng(3)
    xs = [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
          for _ in range(3)]
    # calibration frames serve bit-identical to fp (same PRNGKey(0) init)
    for x in xs[:2]:
        np.testing.assert_array_equal(np.asarray(det_q.model_fn(x)),
                                      np.asarray(det_fp.model_fn(x)))
    scales = det_q.get_act_scales()
    assert scales is not None and len(scales) > 0
    p_q = np.asarray(det_q.model_fn(xs[2]))
    p_fp = np.asarray(det_fp.model_fn(xs[2]))
    assert p_q.shape == p_fp.shape
    # xywh in canvas pixels (≤64): int8 drift must be sub-pixel-ish
    d_box = np.abs(p_q[..., :4] - p_fp[..., :4])
    d_conf = np.abs(p_q[..., 4:] - p_fp[..., 4:])
    assert np.median(d_box) < 0.5, f"box drift median {np.median(d_box)}"
    assert np.median(d_conf) < 0.05, f"conf drift {np.median(d_conf)}"
    # persistence round-trip -> a fresh detector runs int8 immediately
    # and matches the self-calibrated one bit-for-bit (same table)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "det.json")
        det_q.save_act_scales(path)
        det_pre = build_flax_yolo_detector(quantize="int8",
                                           act_scales=path, **kw)
        np.testing.assert_array_equal(np.asarray(det_pre.model_fn(xs[2])),
                                      p_q)


def test_fused_detector_int8_self_calibration(trained, tmp_path):
    """FusedDetectPose(quantize='int8'): the detector subgraph
    self-calibrates on the host-letterbox parity canvas of the first
    frames (the pose table is precomputed), then the serving graphs
    rebuild around the int8 YOLOv5; a fresh engine loading the frozen
    table bit-matches the self-calibrated one."""
    from udp_pose_tpu.engine.fused import FusedDetectPose
    cfg, model, variables, images, joints = trained
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False
    cfg.TPU.QUANTIZE_CALIB_BATCHES = 2

    pose_scales = calibrate(model, variables,
                            [jnp.asarray(normalize_images(images))])

    def mk(det_scales):
        return FusedDetectPose(cfg, variables, yolo_variant="n",
                               max_persons=4, det_size=64, topk=16,
                               conf_thres=1e-4, quantize="int8",
                               pose_act_scales=dict(pose_scales),
                               det_act_scales=det_scales)

    eng = mk(None)
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
              for _ in range(3)]
    eng.infer_frame(frames[0])
    assert eng.det_act_scales is None          # still calibrating
    eng.infer_frame(frames[1])
    assert eng.det_act_scales is not None      # frozen after 2 frames
    assert eng._active_yolo().__class__.__name__ == "QuantizedModel"
    out_q = eng.infer_frame(frames[2])

    p = str(tmp_path / "det_scales.json")
    eng.save_det_act_scales(p)
    eng_pre = mk(p)
    out_pre = eng_pre.infer_frame(frames[2])
    np.testing.assert_array_equal(np.asarray(out_q["keypoints"]),
                                  np.asarray(out_pre["keypoints"]))
    np.testing.assert_array_equal(np.asarray(out_q["scores"]),
                                  np.asarray(out_pre["scores"]))


def test_lowbw_pose_self_calibration(trained):
    """--low-bw + quantize='int8' with NO tables: the pose crops exist
    host-side (native warp), so the engine self-calibrates — first
    frames serve bf16 while recording amax, then the pose graphs rebuild
    int8 and track the fp low-bw engine on a trained model."""
    from udp_pose_tpu.engine.fused import FusedDetectPose
    cfg, model, variables, images, joints = trained
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False
    cfg.TPU.QUANTIZE_CALIB_BATCHES = 2

    class _Stub:
        def apply(self, v, x, train=False):
            pred = np.zeros((64, 85), np.float32)
            pred[:, 4] = 1e-4
            pred[0, :4] = (32, 32, 40, 56)
            pred[0, 4] = 0.95
            pred[0, 5] = 0.95
            return jnp.asarray(pred)[None]

    def mk(quantize):
        eng = FusedDetectPose(cfg, variables, yolo_variant="n",
                              max_persons=4, det_size=64, topk=16,
                              quantize=quantize)
        eng.yolo = _Stub()
        return eng

    eng_fp = mk(None)
    eng_q = mk("int8")
    rng = np.random.default_rng(29)
    frames = [rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
              for _ in range(3)]
    for f in frames[:2]:                      # calibration frames (bf16)
        eng_q.infer_frame_low_bw(f)
    assert eng_q._pose.act_scales is not None
    assert eng_q._pose._active_model().__class__.__name__ == \
        "QuantizedModel"
    out_q = eng_q.infer_frame_low_bw(frames[2])
    out_fp = eng_fp.infer_frame_low_bw(frames[2])
    kp_q, kp_fp = np.asarray(out_q["keypoints"]), \
        np.asarray(out_fp["keypoints"])
    assert kp_q.shape == kp_fp.shape and kp_q.shape[0] >= 1
    d = np.abs(kp_q - kp_fp)
    assert np.median(d) < 1.0, f"low-bw int8 drift median {np.median(d)}"


def test_fused_cfg_quantize_applies_to_both_subgraphs(trained):
    """A TPU.QUANTIZE int8 yaml must behave the same through
    FusedDetectPose as through the two-stage pipeline: BOTH subgraphs
    quantize (the detector self-calibrates; the pose side needs a table
    or --low-bw) — and quantize='' is an explicit off overriding cfg."""
    from udp_pose_tpu.engine.fused import FusedDetectPose
    cfg, model, variables, images, _ = trained
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False
    cfg.TPU.QUANTIZE = "int8"

    eng = FusedDetectPose(cfg, variables, yolo_variant="n",
                          max_persons=4, det_size=64, topk=16)
    assert eng._pose.quantize == "int8"
    assert eng._det_quantize == "int8"

    eng_off = FusedDetectPose(cfg, variables, yolo_variant="n",
                              max_persons=4, det_size=64, topk=16,
                              quantize="")
    assert eng_off._pose.quantize == ""
    assert eng_off._det_quantize is None

    # a pose-only table must still not quantize the detector when the
    # cfg does not ask for int8
    cfg_fp = cfg.clone()
    cfg_fp.TPU.QUANTIZE = ""
    scales = calibrate(model, variables,
                       [jnp.asarray(normalize_images(images))])
    eng_pose_only = FusedDetectPose(cfg_fp, variables, yolo_variant="n",
                                    max_persons=4, det_size=64, topk=16,
                                    pose_act_scales=dict(scales))
    assert eng_pose_only._pose.quantize == "int8"
    assert eng_pose_only._det_quantize is None

    # explicit quantize="" is an OFF switch that beats tables AND cfg —
    # uniform across both subgraphs
    eng_off_tables = FusedDetectPose(cfg, variables, yolo_variant="n",
                                     max_persons=4, det_size=64, topk=16,
                                     quantize="",
                                     pose_act_scales=dict(scales),
                                     det_act_scales={"x": 1.0})
    assert eng_off_tables._pose.quantize == ""
    assert eng_off_tables._det_quantize is None


def test_pipeline_table_implies_int8(trained, tmp_path):
    """UdpPosePipeline(act_scales=...) without quantize= must serve int8
    (a provided table IS the request) — the same gating as the fused
    engine and the detector builder; quantize='' stays an explicit off."""
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline
    cfg, model, variables, images, _ = trained
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False

    scales = calibrate(model, variables,
                       [jnp.asarray(normalize_images(images))])
    p = str(tmp_path / "scales.json")
    save_act_scales(p, scales)

    rng = np.random.default_rng(41)
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[40, 30, 140, 200]], np.float32)

    implied = UdpPosePipeline(cfg, variables, act_scales=p)
    assert implied.quantize == "int8"
    assert implied._active_model().__class__.__name__ == "QuantizedModel"
    explicit = UdpPosePipeline(cfg, variables, quantize="int8",
                               act_scales=p)
    np.testing.assert_array_equal(implied.infer_pose(frame, boxes)[0],
                                  explicit.infer_pose(frame, boxes)[0])

    off = UdpPosePipeline(cfg, variables, quantize="", act_scales=p)
    assert off._active_model() is off.model      # fp despite the table


def test_detector_table_implies_int8(tmp_path):
    """build_flax_yolo_detector(act_scales=...) without quantize= must
    serve int8 (a provided table IS the request) — bit-equal to the
    explicit quantize='int8' detector, same gating as FusedDetectPose."""
    from udp_pose_tpu.engine.detector import build_flax_yolo_detector

    kw = dict(variant="n", input_size=64, device_topk=0)
    det_cal = build_flax_yolo_detector(quantize="int8", calib_batches=1,
                                       **kw)
    rng = np.random.default_rng(31)
    xs = [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
          for _ in range(2)]
    det_cal.model_fn(xs[0])                      # calibrates + freezes
    path = str(tmp_path / "det.json")
    det_cal.save_act_scales(path)

    det_implied = build_flax_yolo_detector(act_scales=path, **kw)
    det_explicit = build_flax_yolo_detector(quantize="int8",
                                            act_scales=path, **kw)
    np.testing.assert_array_equal(np.asarray(det_implied.model_fn(xs[1])),
                                  np.asarray(det_explicit.model_fn(xs[1])))


def test_infer_frames_empty_chunk(trained):
    """An empty frame chunk must return [] — including while a quantized
    detector is still calibrating (was a ZeroDivisionError)."""
    from udp_pose_tpu.engine.fused import FusedDetectPose
    cfg, model, variables, images, _ = trained
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "coco"
    cfg.TEST.FLIP_TEST = False

    scales = calibrate(model, variables,
                       [jnp.asarray(normalize_images(images))])
    eng = FusedDetectPose(cfg, variables, yolo_variant="n",
                          max_persons=4, det_size=64, topk=16,
                          quantize="int8", pose_act_scales=dict(scales))
    assert eng._det_calibrating()
    empty = np.zeros((0, 96, 96, 3), np.uint8)
    assert eng.infer_frames(empty) == []
    assert eng._det_calibrating()        # nothing to calibrate on


def test_test_cli_quantize_int8(tmp_path):
    """TPU.QUANTIZE int8 through the real tools/test.py subprocess on
    synthetic mini-COCO (the reference CLI surface, quantized)."""
    from flax import serialization
    from ref_harness import make_mini_coco

    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=3)
    cfg = _tiny_cfg()
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.COLOR_RGB = True
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 96, 3)), train=False)
    wpath = str(tmp_path / "w.msgpack")
    with open(wpath, "wb") as f:
        f.write(serialization.to_bytes(variables))
    cfg.TEST.MODEL_FILE = wpath
    ypath = str(tmp_path / "tiny.yaml")
    with open(ypath, "w") as f:
        f.write(cfg.dump())

    env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         "--cfg", ypath, "TPU.QUANTIZE", "int8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, (p.stdout[-1500:], p.stderr[-1500:])
    blob = p.stdout + p.stderr
    assert "int8 PTQ: calibrated" in blob
    assert "| AP |" in blob or "AP" in blob


def test_test_cli_quantize_int8_rsn(tmp_path):
    """TPU.QUANTIZE int8 on the RSN family through the real tools/test.py
    subprocess: the path that composes the BGR-constant calibration
    (serving_normalizer), the *res_conv2* fp skip, prepared int8 kernels
    and the RSN decode protocol."""
    from flax import serialization
    from ref_harness import make_mini_coco

    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=9)
    from udp_pose_tpu.config import default_config
    cfg = default_config()
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.NAME = "rsn"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.EXTRA.STAGE_NUM = 2
    cfg.MODEL.EXTRA.UPSAMPLE_CHANNEL_NUM = 64
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 128, 96, 3)), train=False)
    wpath = str(tmp_path / "w.msgpack")
    with open(wpath, "wb") as f:
        f.write(serialization.to_bytes(variables))
    cfg.TEST.MODEL_FILE = wpath
    ypath = str(tmp_path / "rsn.yaml")
    with open(ypath, "w") as f:
        f.write(cfg.dump())

    env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         "--cfg", ypath, "TPU.QUANTIZE", "int8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, (p.stdout[-1500:], p.stderr[-1500:])
    blob = p.stdout + p.stderr
    assert "int8 PTQ: calibrated" in blob
    assert "AP" in blob


def test_bf16_early_cast_drift_bounded(trained):
    """The serving graphs cast normalized inputs to bf16 early when the
    model computes in bf16 (round-4 perf fix; value-identical for the
    bf16 forward itself, but the int8 quantizer then rounds FROM bf16).
    Bound the decoded drift of [bf16 model + early cast + int8] against
    the fp32-model int8 path on the trained fixture."""
    cfg, model, variables, images, joints = trained
    B = images.shape[0]
    center = np.tile(np.array([[32.0, 32.0]], np.float32), (B, 1))
    scale = np.tile(np.array([[0.32, 0.32]], np.float32), (B, 1))

    scales = calibrate(model, variables, [normalize_images(images)])

    # fp32 model, int8 convs (the existing bounded path)
    qm32 = QuantizedModel(model, scales)
    infer32 = make_infer_fn(qm32, target_type="gaussian", flip_test=True)
    p32, _, _ = infer32(qm32.prepare_variables(variables), images,
                        center, scale)

    # same weights served through a bf16-dtype model: make_infer_fn's
    # early cast engages (model.dtype == bfloat16)
    bcfg = cfg.clone(); bcfg.defrost(); bcfg.TPU.DTYPE = "bfloat16"
    bmodel = build_model(bcfg)
    qm16 = QuantizedModel(bmodel, scales)
    infer16 = make_infer_fn(qm16, target_type="gaussian", flip_test=True)
    p16, _, _ = infer16(qm16.prepare_variables(variables), images,
                        center, scale)

    d = np.linalg.norm(np.asarray(p16) - np.asarray(p32), axis=-1)
    # heatmap-space px (4x stride): bf16 rounding into the int8 grid
    # must stay sub-pixel
    assert np.median(d) < 1.0, f"bf16-cast int8 drift median {np.median(d)}"
    assert (d < 4.0).mean() > 0.95, f"p95 {np.percentile(d, 95)}"
