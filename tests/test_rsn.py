"""RSN stack tests: targets, loss, decode parity + torch output parity."""

import importlib.util
import os
import sys

import cv2
import numpy as np
import pytest

from udp_pose_tpu.config import default_config
from udp_pose_tpu.core.loss import joints_l2_loss, rsn_multi_stage_loss
from udp_pose_tpu.ops.rsn_decode import rsn_decode
from udp_pose_tpu.ops.targets import (RSN_KERNEL_SIGMA, rsn_targets,
                                      rsn_targets_np)

RSN_ROOT = "/root/reference/RSN"


def _rsn_cfg(stage_num=1, prm=False):
    cfg = default_config()
    cfg.MODEL.NAME = "rsn"
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.MODEL.EXTRA.STAGE_NUM = stage_num
    cfg.MODEL.EXTRA.UPSAMPLE_CHANNEL_NUM = 256
    cfg.MODEL.EXTRA.USE_PRM = prm
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_rsn_targets_parity():
    rng = np.random.default_rng(80)
    joints = rng.uniform(-10, 260, (17, 2)).astype(np.float64)
    valid = (rng.uniform(size=17) > 0.2).astype(np.float32) * 2
    gold = rsn_targets_np(joints, valid, (48, 64), (192, 256))
    out = np.asarray(rsn_targets(joints, valid, (48, 64), (192, 256)))
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-3)
    assert out.shape == (5, 17, 64, 48)
    assert out.max() <= 255.0 + 1e-3


def test_joints_l2_loss_parity():
    import torch
    rng = np.random.default_rng(81)
    out = rng.normal(size=(3, 17, 16, 12)).astype(np.float32)
    lbl = rng.normal(size=(3, 17, 16, 12)).astype(np.float32)
    valid = rng.integers(0, 3, (3, 17, 1)).astype(np.float32)

    def torch_l2(output, valid_t, label, has_ohkm=False, topk=8):
        # reference RSN/lib/utils/loss.py:9-47 in torch
        crit = torch.nn.MSELoss(reduction="none" if has_ohkm else "mean")
        loss = 0
        for i in range(output.shape[0]):
            pred = output[i].reshape(17, -1)
            gt = label[i].reshape(17, -1)
            if not has_ohkm:
                w = (valid_t[i] > 1).float()
                gt = gt * w
            tmp = crit(pred, gt)
            if has_ohkm:
                tmp = tmp.mean(dim=1) * (valid_t[i].squeeze() > 0).float()
                tv, _ = torch.topk(tmp, k=topk, dim=0, sorted=False)
                tmp = tv.mean(dim=0)
            loss = loss + tmp
        return (loss / output.shape[0]).item()

    for ohkm in (False, True):
        gold = torch_l2(torch.tensor(out), torch.tensor(valid),
                        torch.tensor(lbl), has_ohkm=ohkm)
        got = float(joints_l2_loss(out, valid, lbl, has_ohkm=ohkm))
        np.testing.assert_allclose(got, gold, rtol=1e-5)


def _ref_rsn_decode(outputs, centers, scales, kernel=11, shifts=(0.25,),
                    input_shape=(256, 192), output_shape=(64, 48)):
    """Loop replication of RSN get_results (test.py:25-71)."""
    scales = scales * 200.0
    B, J = outputs.shape[:2]
    preds = np.zeros((B, J, 2))
    maxvals = np.zeros((B, J, 1))
    for i in range(B):
        score_map = outputs[i].copy() / 255 + 0.5
        border = 10
        dr = np.zeros((J, output_shape[0] + 2 * border,
                       output_shape[1] + 2 * border))
        dr[:, border:-border, border:-border] = outputs[i].copy()
        for w in range(J):
            dr[w] = cv2.GaussianBlur(dr[w], (kernel, kernel), 0)
        for w in range(J):
            x = y = 0
            for j in range(len(shifts)):
                if j == 0:
                    lb = dr[w].argmax()
                    y, x = np.unravel_index(lb, dr[w].shape)
                    dr[w, y, x] = 0
                    x -= border
                    y -= border
                lb = dr[w].argmax()
                py, px = np.unravel_index(lb, dr[w].shape)
                dr[w, py, px] = 0
                px -= border + x
                py -= border + y
                ln = (px ** 2 + py ** 2) ** 0.5
                if ln > 1e-3:
                    x += shifts[j] * px / ln
                    y += shifts[j] * py / ln
            x = max(0, min(x, output_shape[1] - 1))
            y = max(0, min(y, output_shape[0] - 1))
            preds[i, w] = [x * 4 + 2, y * 4 + 2]
            maxvals[i, w, 0] = score_map[w, int(round(y) + 1e-9),
                                         int(round(x) + 1e-9)]
        preds[i, :, 0] = (preds[i, :, 0] / input_shape[1] * scales[i][0]
                          + centers[i][0] - scales[i][0] * 0.5)
        preds[i, :, 1] = (preds[i, :, 1] / input_shape[0] * scales[i][1]
                          + centers[i][1] - scales[i][1] * 0.5)
    return preds, maxvals


@pytest.mark.parametrize("shifts", [(0.25,), (0.25, 0.125)])
def test_rsn_decode_parity(shifts):
    rng = np.random.default_rng(82)
    B, J, H, W = 2, 4, 64, 48
    maps = rng.uniform(0, 30, (B, J, H, W)).astype(np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for b in range(B):
        for j in range(J):
            cy, cx = rng.uniform(8, H - 8), rng.uniform(8, W - 8)
            maps[b, j] += 255 * np.exp(
                -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 2.0 ** 2)).astype(np.float32)
    centers = rng.uniform(100, 400, (B, 2)).astype(np.float32)
    scales = rng.uniform(0.5, 2.0, (B, 2)).astype(np.float32)
    gold_p, gold_v = _ref_rsn_decode(maps.copy(), centers, scales.copy(),
                                     shifts=shifts)
    p, v = rsn_decode(maps, centers, scales, kernel=11, shifts=shifts)
    np.testing.assert_allclose(np.asarray(v), gold_v, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p), gold_p, rtol=1e-3, atol=5e-3)


def test_rsn_multi_stage_loss_runs():
    rng = np.random.default_rng(83)
    outputs = [[rng.normal(size=(2, 17, 16, 12)).astype(np.float32)
                for _ in range(4)] for _ in range(2)]
    labels = rng.normal(size=(2, 5, 17, 16, 12)).astype(np.float32)
    valids = np.ones((2, 17, 1), np.float32) * 2
    loss = rsn_multi_stage_loss(outputs, valids, labels, stage_num=2)
    assert np.isfinite(float(loss))


@pytest.mark.skipif(not os.path.isdir(RSN_ROOT),
                    reason="reference checkout not present")
def test_rsn_torch_output_parity():
    import jax
    import torch
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_rsn)

    from ref_harness import claim_rsn_namespace
    claim_rsn_namespace()  # the deep_hrnet tree defines clashing pkg names
    spec = importlib.util.spec_from_file_location(
        "ref_rsn_network", os.path.join(RSN_ROOT, "exps/RSN18.coco/network.py"))
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

    tmodel = mod.RSN(rcfg)
    tmodel.eval()
    g = torch.Generator().manual_seed(0)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    tmodel.load_state_dict(sd)

    cfg = _rsn_cfg(stage_num=2)
    fmodel = build_model(cfg)
    variables, unused = convert_rsn(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}, stage_num=2)
    assert not unused, unused[:8]
    variables = check_against_model(variables, fmodel, (1, 256, 192, 3))

    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=5e-4)


@pytest.mark.skipif(not os.path.isdir(RSN_ROOT),
                    reason="reference checkout not present")
def test_rsn_prm_se_torch_output_parity():
    """SE/PRM variant output parity vs the ACTUAL reference network
    (RSN/exps/RSN18.coco.e1.se.36x8x132000_prm/network.py): conv stem
    :188-202, planes-based branch_ch :73, SE(8) in every bottleneck :113,
    PRM at the ind==3 upsample unit :345-358."""
    import torch
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_rsn)

    from ref_harness import claim_rsn_namespace
    claim_rsn_namespace()
    spec = importlib.util.spec_from_file_location(
        "ref_rsn_prm_network",
        os.path.join(RSN_ROOT,
                     "exps/RSN18.coco.e1.se.36x8x132000_prm/network.py"))
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

    tmodel = mod.RSN(rcfg)
    tmodel.eval()
    g = torch.Generator().manual_seed(1)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    tmodel.load_state_dict(sd)

    cfg = _rsn_cfg(stage_num=2, prm=True)
    cfg.MODEL.EXTRA.USE_SE = True
    fmodel = build_model(cfg)
    variables, unused = convert_rsn(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        stage_num=2, se=True, prm=True)
    assert not unused, unused[:8]
    variables = check_against_model(variables, fmodel, (1, 256, 192, 3))

    rng = np.random.default_rng(19)
    x = rng.normal(size=(1, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=5e-4)


@pytest.mark.skipif(not os.path.isdir(RSN_ROOT),
                    reason="reference checkout not present")
def test_4xrsn18_torch_output_parity():
    """4XRSN18 — the reference's best-model shape — output parity vs the
    ACTUAL RSN/exps/4XRSN18.coco/network.py at STAGE_NUM=4
    (4XRSN18.coco/config.py:50).  That file is the base RSN18 network
    plus a PRM class that is never instantiated (dead code), so the
    model is RSN(stage_num=4) with 4-stage cross-stage skip chaining
    (network.py:400-412)."""
    import torch
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_rsn)

    from ref_harness import claim_rsn_namespace
    claim_rsn_namespace()
    spec = importlib.util.spec_from_file_location(
        "ref_rsn4x_network",
        os.path.join(RSN_ROOT, "exps/4XRSN18.coco/network.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert not any("prm" in n for n, _ in mod.RSN.__dict__.items()), \
        "reference 4XRSN18 grew a PRM usage; revisit this test"

    class _NS:
        pass

    rcfg = _NS()
    rcfg.MODEL = _NS(); rcfg.MODEL.STAGE_NUM = 4
    rcfg.MODEL.UPSAMPLE_CHANNEL_NUM = 256
    rcfg.DATASET = _NS(); rcfg.DATASET.KEYPOINT = _NS()
    rcfg.DATASET.KEYPOINT.NUM = 17
    rcfg.OUTPUT_SHAPE = (64, 48)
    rcfg.LOSS = _NS(); rcfg.LOSS.OHKM = True; rcfg.LOSS.TOPK = 8
    rcfg.LOSS.COARSE_TO_FINE = True

    tmodel = mod.RSN(rcfg)
    tmodel.eval()
    g = torch.Generator().manual_seed(23)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    tmodel.load_state_dict(sd)

    # our model from the canonical shipped config (STAGE_NUM: 4)
    from udp_pose_tpu.config import load_config
    cfg = load_config(os.path.join(
        os.path.dirname(__file__), "..", "configs", "coco",
        "4xrsn18_256x192.yaml"))
    cfg.defrost()
    cfg.TPU.DTYPE = "float32"
    assert cfg.MODEL.EXTRA.STAGE_NUM == 4
    fmodel = build_model(cfg)
    variables, unused = convert_rsn(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}, stage_num=4)
    assert not unused, unused[:8]
    variables = check_against_model(variables, fmodel, (1, 256, 192, 3))

    rng = np.random.default_rng(29)
    x = rng.normal(size=(1, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=5e-4)

    # all_stages mode: 4 stages x 4 scale outputs each (cross-stage
    # proven at full depth, not just stage_num=2)
    outs = fmodel.apply(variables, x.transpose(0, 2, 3, 1), train=False,
                        all_stages=True)
    assert len(outs) == 4 and all(len(s) == 4 for s in outs)


@pytest.mark.skipif(not os.path.isdir(RSN_ROOT),
                    reason="reference checkout not present")
def test_res18_plain_torch_output_parity():
    """Res18 plain-bottleneck ablation — output parity vs the ACTUAL
    RSN/exps/Res18.coco/network.py (class MSPN, STAGE_NUM=1,
    Res18.coco/config.py:51).  The plain Bottleneck there is 1x1 s1 ->
    3x3 s=stride -> 1x1 (network.py:49-77) — note the stride sits on the
    3x3, unlike RSN's residual-steps block which strides its 1x1."""
    import torch
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_rsn)

    from ref_harness import claim_rsn_namespace
    claim_rsn_namespace()
    spec = importlib.util.spec_from_file_location(
        "ref_res18_network",
        os.path.join(RSN_ROOT, "exps/Res18.coco/network.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class _NS:
        pass

    rcfg = _NS()
    rcfg.MODEL = _NS(); rcfg.MODEL.STAGE_NUM = 1
    rcfg.MODEL.UPSAMPLE_CHANNEL_NUM = 256
    rcfg.DATASET = _NS(); rcfg.DATASET.KEYPOINT = _NS()
    rcfg.DATASET.KEYPOINT.NUM = 17
    rcfg.OUTPUT_SHAPE = (64, 48)
    rcfg.LOSS = _NS(); rcfg.LOSS.OHKM = True; rcfg.LOSS.TOPK = 8
    rcfg.LOSS.COARSE_TO_FINE = True

    tmodel = mod.MSPN(rcfg)
    tmodel.eval()
    g = torch.Generator().manual_seed(31)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    tmodel.load_state_dict(sd)

    # our model from the canonical shipped config (PLAIN_BOTTLENECK: true)
    from udp_pose_tpu.config import load_config
    cfg = load_config(os.path.join(
        os.path.dirname(__file__), "..", "configs", "coco",
        "res18_256x192.yaml"))
    cfg.defrost()
    cfg.TPU.DTYPE = "float32"
    assert cfg.MODEL.EXTRA.PLAIN_BOTTLENECK
    fmodel = build_model(cfg)
    variables, unused = convert_rsn(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        stage_num=1, plain=True)
    assert not unused, unused[:8]
    variables = check_against_model(variables, fmodel, (1, 256, 192, 3))

    rng = np.random.default_rng(37)
    x = rng.normal(size=(2, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=5e-4)


@pytest.mark.skipif(not os.path.isdir(RSN_ROOT),
                    reason="reference checkout not present")
def test_rsn50_torch_output_parity():
    """RSN-50 (RSN/README.md:29 — 74.7 AP, 6.4 GFLOPs) output parity vs
    the ACTUAL reference network instantiated at the ResNet-50 depth
    list.  The reference hardcodes ``self.layers = [2, 2, 2, 2]``
    (RSN18.coco/network.py:324) and parameterizes the depth only at
    ``ResNet_downsample_module`` (:142-154), so the reference module is
    rebuilt here with layers forced to [3, 4, 6, 3] — exactly what the
    reference authors' RSN-50 does per the paper's depth table."""
    import torch
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_rsn)

    from ref_harness import claim_rsn_namespace
    claim_rsn_namespace()
    spec = importlib.util.spec_from_file_location(
        "ref_rsn50_network",
        os.path.join(RSN_ROOT, "exps/RSN18.coco/network.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    LAYERS = [3, 4, 6, 3]
    base_ds = mod.ResNet_downsample_module
    orig_init = base_ds.__init__

    def init50(self, block, layers, *a, **kw):
        # Single_stage_module passes the hardcoded [2,2,2,2]
        # (network.py:324); substitute the ResNet-50 depth.  Patched on
        # the class in place (not by module name) because the
        # reference's ``super(ResNet_downsample_module, self)`` resolves
        # the module global at call time.
        orig_init(self, block, LAYERS, *a, **kw)

    base_ds.__init__ = init50
    try:

        class _NS:
            pass

        rcfg = _NS()
        rcfg.MODEL = _NS(); rcfg.MODEL.STAGE_NUM = 1
        rcfg.MODEL.UPSAMPLE_CHANNEL_NUM = 256
        rcfg.DATASET = _NS(); rcfg.DATASET.KEYPOINT = _NS()
        rcfg.DATASET.KEYPOINT.NUM = 17
        rcfg.OUTPUT_SHAPE = (64, 48)
        rcfg.LOSS = _NS(); rcfg.LOSS.OHKM = True; rcfg.LOSS.TOPK = 8
        rcfg.LOSS.COARSE_TO_FINE = True

        tmodel = mod.RSN(rcfg)
    finally:
        base_ds.__init__ = orig_init
    tmodel.eval()
    g = torch.Generator().manual_seed(5)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    tmodel.load_state_dict(sd)

    cfg = _rsn_cfg(stage_num=1)
    cfg.MODEL.EXTRA.LAYERS = LAYERS
    fmodel = build_model(cfg)
    variables, unused = convert_rsn(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        stage_num=1, layers=tuple(LAYERS))
    assert not unused, unused[:8]
    variables = check_against_model(variables, fmodel, (1, 256, 192, 3))

    rng = np.random.default_rng(50)
    x = rng.normal(size=(1, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=5e-4)


def test_rsn50_configs_load_and_build():
    """The shipped RSN-50 / 4×RSN-50 yamls load and build the right
    shapes (LAYERS [3,4,6,3]; 4× at the 384×288/96×72 geometry)."""
    import jax
    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/coco/rsn50_256x192.yaml"))
    assert list(cfg.MODEL.EXTRA.LAYERS) == [3, 4, 6, 3]
    model = build_model(cfg)
    v = jax.eval_shape(
        lambda r: model.init(r, np.zeros((1, 256, 192, 3), np.float32),
                             train=False), jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(v["params"]))
    # RSN-50 single stage: ~2x the RSN-18 trunk (README 6.4 vs 2.5 GFLOPs)
    assert 15e6 < n_params < 40e6, n_params

    cfg4 = load_config(os.path.join(repo,
                                    "configs/coco/4xrsn50_384x288.yaml"))
    assert cfg4.MODEL.EXTRA.STAGE_NUM == 4
    assert list(cfg4.MODEL.IMAGE_SIZE) == [288, 384]
    model4 = build_model(cfg4)
    v4 = jax.eval_shape(
        lambda r: model4.init(r, np.zeros((1, 384, 288, 3), np.float32),
                              train=False), jax.random.PRNGKey(0))
    n4 = sum(int(np.prod(l.shape))
             for l in jax.tree_util.tree_leaves(v4["params"]))
    assert n4 > 2.5 * n_params, (n4, n_params)
