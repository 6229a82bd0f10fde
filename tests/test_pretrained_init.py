"""MODEL.PRETRAINED grafting (reference tools/train.py:91-116 →
model.init_weights(PRETRAINED)): partial/backbone-only torch checkpoints
are converted and overlaid on a fresh init; everything absent stays at
its fresh initialisation (strict=False semantics), the
PRETRAINED_LAYERS filter and the stage4.2.fuse_layers skip rule
(pose_hrnet.py:473-505) are honoured.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os

REF_MODELS = "/root/reference/deep_hrnet/lib/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason="reference checkout not present")

from test_convert_mobile_zoo import _randomize, _ref_module, \
    _tv_mobilenet_v3_small
from test_torch_convert import _base_cfg


def _fresh(cfg):
    import jax
    import jax.numpy as jnp
    from udp_pose_tpu.models import build_model
    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    return model.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)),
                      train=False)


HRNET_3MOD_EXTRA = {
    "FINAL_CONV_KERNEL": 1,
    "PRETRAINED_LAYERS": ["*"],
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [16, 32],
               "FUSE_METHOD": "SUM"},
    "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [16, 32, 64],
               "FUSE_METHOD": "SUM"},
    "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1, 1], "NUM_CHANNELS": [16, 32, 64, 128],
               "FUSE_METHOD": "SUM"},
}


def test_hrnet_pretrained_skips_last_fuse_and_missing_head():
    from udp_pose_tpu.utils.torch_convert import conv_kernel, load_pretrained
    cfg = _base_cfg("pose_hrnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_3MOD_EXTRA)
    ref = _ref_module("pose_hrnet")
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    del sd["final_layer.weight"], sd["final_layer.bias"]

    fresh = _fresh(cfg)
    merged, n = load_pretrained(fresh, sd, cfg)
    assert n > 0
    p = merged["params"]
    # trunk grafted
    np.testing.assert_array_equal(p["stem1"]["conv"]["kernel"],
                                  conv_kernel(sd["conv1.weight"]))
    np.testing.assert_array_equal(
        p["stage4_0"]["fuse0_1"]["kernel"],
        conv_kernel(sd["stage4.0.fuse_layers.0.1.0.weight"]))
    # stage4.2 fuse skipped (pose_hrnet.py:497) → stays fresh
    np.testing.assert_array_equal(
        p["stage4_2"]["fuse0_1"]["kernel"],
        np.asarray(fresh["params"]["stage4_2"]["fuse0_1"]["kernel"]))
    # missing head stays fresh
    np.testing.assert_array_equal(
        p["final_layer"]["kernel"],
        np.asarray(fresh["params"]["final_layer"]["kernel"]))


def test_resnet_pretrained_layers_filter():
    from udp_pose_tpu.utils.torch_convert import conv_kernel, load_pretrained
    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
        "PRETRAINED_LAYERS": ["conv1", "bn1", "layer1"]})
    ref = _ref_module("pose_resnet")
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fresh = _fresh(cfg)
    merged, _ = load_pretrained(fresh, sd, cfg)
    p = merged["params"]["backbone"]
    np.testing.assert_array_equal(p["conv1"]["kernel"],
                                  conv_kernel(sd["conv1.weight"]))
    np.testing.assert_array_equal(
        p["layer1_0"]["cb1"]["conv"]["kernel"],
        conv_kernel(sd["layer1.0.conv1.weight"]))
    # filtered out → fresh
    np.testing.assert_array_equal(
        p["layer2_0"]["cb1"]["conv"]["kernel"],
        np.asarray(fresh["params"]["backbone"]["layer2_0"]["cb1"]["conv"]
                   ["kernel"]))


def _mobile_cfg(name, extra=None):
    cfg = _base_cfg(name, "gaussian")
    base = {"NUM_DECONV_LAYERS": 2, "NUM_DECONV_FILTERS": [64, 64],
            "NUM_DECONV_KERNELS": [4, 4], "DECONV_WITH_BIAS": False,
            "FINAL_CONV_KERNEL": 1}
    base.update(extra or {})
    cfg.MODEL.EXTRA.merge_from_dict(base)
    return cfg


def test_shufflenetv2_plus_backbone_only_pretrained():
    """Bare ImageNet backbone keys graft under 'backbone'; the head stays
    fresh (get_shufflenetv2_plus strict=False load)."""
    from udp_pose_tpu.utils.torch_convert import conv_kernel, load_pretrained
    bb = _ref_module("backbones.shufflenetv2_plus")
    tb = _randomize(bb.ShuffleNetV2_Plus(
        architecture=[0, 0, 3, 1, 1, 1, 0, 0, 2, 0, 2, 1, 1, 0, 2, 0, 2,
                      1, 3, 2], model_size="Small"))
    sd = {k: v.numpy() for k, v in tb.state_dict().items()}

    cfg = _mobile_cfg("pose_shufflenetv2_plus", {"MODEL_SIZE": "Small"})
    fresh = _fresh(cfg)
    merged, n = load_pretrained(fresh, sd, cfg)
    assert n > 0
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["first_conv"]["conv"]["kernel"],
        conv_kernel(sd["first_conv.0.weight"]))
    np.testing.assert_array_equal(
        merged["params"]["deconv"]["deconv0"]["kernel"],
        np.asarray(fresh["params"]["deconv"]["deconv0"]["kernel"]))


@pytest.mark.parametrize("prefix", ["0.", "features."])
def test_mobilenetv3_prefix_detection(prefix):
    from udp_pose_tpu.utils.torch_convert import conv_kernel, load_pretrained
    tb = _randomize(_tv_mobilenet_v3_small())     # '0.'-prefixed keys
    sd = {k: v.numpy() for k, v in tb.state_dict().items()}
    if prefix == "features.":
        sd = {"features." + k[2:]: v for k, v in sd.items()}

    cfg = _mobile_cfg("pose_mobilenetv3_small")
    fresh = _fresh(cfg)
    merged, n = load_pretrained(fresh, sd, cfg)
    assert n > 0
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["stem"]["conv"]["kernel"],
        conv_kernel(sd[prefix + "0.0.weight"]))


def test_shape_mismatched_leaf_skipped():
    """A cls-head final_layer in the checkpoint (wrong shape for the pose
    head) must be skipped with the rest grafted — not clobber the head."""
    from udp_pose_tpu.utils.torch_convert import conv_kernel, load_pretrained
    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    ref = _ref_module("pose_resnet")
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    # corrupt final_layer to a classification-head shape
    sd["final_layer.weight"] = np.zeros((1000, 64, 1, 1), np.float32)
    sd["final_layer.bias"] = np.zeros((1000,), np.float32)

    fresh = _fresh(cfg)
    merged, _ = load_pretrained(fresh, sd, cfg)
    # trunk grafted, mismatched head untouched
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["conv1"]["kernel"],
        conv_kernel(sd["conv1.weight"]))
    np.testing.assert_array_equal(
        merged["params"]["final_layer"]["kernel"],
        np.asarray(fresh["params"]["final_layer"]["kernel"]))
