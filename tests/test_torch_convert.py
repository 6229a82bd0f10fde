"""Output-parity tests: reference torch models vs converted Flax models.

Builds the *actual* reference implementations (imported read-only from
/root/reference at test time — nothing is copied), random-initialises them,
converts the state_dict with utils/torch_convert, and requires the Flax
forward to match the torch forward.  This is the strongest structural-parity
evidence available without the published .pth files.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODELS = "/root/reference/deep_hrnet/lib/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason="reference checkout not present")


def _ref_module(name):
    """Import a reference model file as part of a synthetic package so its
    relative imports (.PSA) resolve, without importing the full registry
    (which needs torchvision)."""
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_MODELS]
        sys.modules["refmodels"] = pkg
    return importlib.import_module(f"refmodels.{name}")


HRNET_W32_EXTRA = {
    "FINAL_CONV_KERNEL": 1,
    "PRETRAINED_LAYERS": ["*"],
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [32, 64],
               "FUSE_METHOD": "SUM"},
    "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [32, 64, 128],
               "FUSE_METHOD": "SUM"},
    "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4, 4, 4],
               "NUM_CHANNELS": [32, 64, 128, 256], "FUSE_METHOD": "SUM"},
}


def _base_cfg(name, target_type):
    from udp_pose_tpu.config import default_config
    cfg = default_config()
    cfg.MODEL.NAME = name
    cfg.MODEL.TARGET_TYPE = target_type
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TPU.DTYPE = "float32"
    return cfg


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model


def _compare(tmodel, fmodel, variables, hw=(128, 96), atol=2e-4):
    tmodel.eval()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, hw[0], hw[1])).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape, (yt.shape, yf.shape)
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=atol)


@pytest.mark.parametrize("layers,target", [(18, "gaussian"),
                                           (50, "offset")])
def test_pose_resnet_parity(layers, target):
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_pose_resnet)
    ref = _ref_module("pose_resnet")
    cfg = _base_cfg("pose_resnet", target)
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": layers, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables, unused = convert_pose_resnet(sd, layers)
    assert not unused, unused[:8]
    fmodel = build_model(cfg)
    variables = check_against_model(variables, fmodel, (1, 128, 96, 3))
    _compare(tmodel, fmodel, variables)


def test_pose_resnet_psa_parity():
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_pose_resnet)
    ref = _ref_module("pose_resnet_psa")
    cfg = _base_cfg("pose_resnet_psa", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables, unused = convert_pose_resnet(sd, 18, psa=True)
    assert not unused, unused[:8]
    fmodel = build_model(cfg)
    variables = check_against_model(variables, fmodel, (1, 128, 96, 3))
    _compare(tmodel, fmodel, variables)


@pytest.mark.parametrize("psa,target", [(False, "offset"),
                                        (True, "gaussian")])
def test_pose_hrnet_parity(psa, target):
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.models.hrnet import stage_cfg
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_pose_hrnet)
    ref = _ref_module("pose_hrnet_psa" if psa else "pose_hrnet")
    name = "pose_hrnet_psa" if psa else "pose_hrnet"
    cfg = _base_cfg(name, target)
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_W32_EXTRA)
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    stages = tuple(
        stage_cfg(HRNET_W32_EXTRA[k]["NUM_MODULES"],
                  HRNET_W32_EXTRA[k]["NUM_BRANCHES"],
                  HRNET_W32_EXTRA[k]["BLOCK"],
                  HRNET_W32_EXTRA[k]["NUM_BLOCKS"],
                  HRNET_W32_EXTRA[k]["NUM_CHANNELS"])
        for k in ("STAGE2", "STAGE3", "STAGE4"))
    variables, unused = convert_pose_hrnet(sd, stages, psa=psa)
    assert not unused, unused[:8]
    fmodel = build_model(cfg)
    variables = check_against_model(variables, fmodel, (1, 128, 96, 3))
    _compare(tmodel, fmodel, variables, atol=5e-4)
