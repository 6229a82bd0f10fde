"""flax → torch REVERSE conversion roundtrip (the portable-export bridge).

torch zoo sd → flax (forward converter) → flax_to_torch → a FRESH
reference torch model must accept it with ``strict=True`` and produce the
same outputs as the original — i.e. models trained in this framework can
be written as reference-format ``.pth`` files that the reference's own
ONNX export (deep_hrnet/tools/export.py:21-56) consumes.
"""

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODELS = "/root/reference/deep_hrnet/lib/models"
RSN_ROOT = "/root/reference/RSN"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason="reference checkout not present")

from test_torch_convert import (HRNET_W32_EXTRA, _base_cfg, _randomize,
                                _ref_module)


def _roundtrip(tmodel, family, **kwargs):
    """sd → flax → sd' → fresh torch strict load; assert sd' ≡ sd."""
    from udp_pose_tpu.utils.torch_convert import flax_to_torch
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    if family.startswith("pose_resnet"):
        from udp_pose_tpu.utils.torch_convert import convert_pose_resnet
        variables, unused = convert_pose_resnet(
            sd, kwargs["num_layers"], psa=family.endswith("_psa"))
    elif family.startswith("pose_hrnet"):
        from udp_pose_tpu.utils.torch_convert import convert_pose_hrnet
        variables, unused = convert_pose_hrnet(
            sd, kwargs["stages_cfg"], psa=family.endswith("_psa"))
    else:
        from udp_pose_tpu.utils.torch_convert import convert_rsn
        variables, unused = convert_rsn(
            sd, kwargs["stage_num"], se=kwargs.get("se", False),
            prm=kwargs.get("prm", False))
    assert not unused, unused[:8]

    back = flax_to_torch(variables, family, **kwargs)
    missing = set(sd) - set(back)
    extra = set(back) - set(sd)
    missing = {k for k in missing if "num_batches_tracked" not in k}
    extra = {k for k in extra if "num_batches_tracked" not in k}
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in sd:
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # strict torch load must succeed (shapes + names are the contract)
    fresh_sd = {k: torch.tensor(np.asarray(v)) for k, v in back.items()
                if "num_batches_tracked" not in k}
    result = tmodel.load_state_dict(fresh_sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:8]
    assert all("num_batches_tracked" in k for k in result.missing_keys), \
        result.missing_keys[:8]


def test_reverse_pose_resnet18():
    ref = _ref_module("pose_resnet")
    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    _roundtrip(tmodel, "pose_resnet", num_layers=18)


def test_reverse_pose_resnet50():
    ref = _ref_module("pose_resnet")
    cfg = _base_cfg("pose_resnet", "offset")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 50, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    _roundtrip(tmodel, "pose_resnet", num_layers=50)


@pytest.mark.parametrize("psa", [False, True])
def test_reverse_pose_hrnet(psa):
    from udp_pose_tpu.models.hrnet import stage_cfg
    name = "pose_hrnet_psa" if psa else "pose_hrnet"
    ref = _ref_module(name)
    cfg = _base_cfg(name, "offset")
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_W32_EXTRA)
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    stages = tuple(
        stage_cfg(HRNET_W32_EXTRA[k]["NUM_MODULES"],
                  HRNET_W32_EXTRA[k]["NUM_BRANCHES"],
                  HRNET_W32_EXTRA[k]["BLOCK"],
                  HRNET_W32_EXTRA[k]["NUM_BLOCKS"],
                  HRNET_W32_EXTRA[k]["NUM_CHANNELS"])
        for k in ("STAGE2", "STAGE3", "STAGE4"))
    _roundtrip(tmodel, name, stages_cfg=stages)


@pytest.mark.parametrize("prm", [False, True])
def test_reverse_rsn(prm):
    from ref_harness import claim_rsn_namespace
    claim_rsn_namespace()
    exp = ("exps/RSN18.coco.e1.se.36x8x132000_prm/network.py" if prm
           else "exps/RSN18.coco/network.py")
    spec = importlib.util.spec_from_file_location(
        "ref_rsn_net_rt", os.path.join(RSN_ROOT, exp))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class _NS:
        pass

    rcfg = _NS()
    rcfg.MODEL = _NS(); rcfg.MODEL.STAGE_NUM = 2
    rcfg.MODEL.UPSAMPLE_CHANNEL_NUM = 256
    rcfg.DATASET = _NS(); rcfg.DATASET.KEYPOINT = _NS()
    rcfg.DATASET.KEYPOINT.NUM = 17
    rcfg.OUTPUT_SHAPE = (64, 48)
    rcfg.LOSS = _NS(); rcfg.LOSS.OHKM = True; rcfg.LOSS.TOPK = 8
    rcfg.LOSS.COARSE_TO_FINE = True
    tmodel = _randomize(mod.RSN(rcfg))
    _roundtrip(tmodel, "rsn", stage_num=2, se=prm, prm=prm)
