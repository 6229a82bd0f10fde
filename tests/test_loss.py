"""Loss parity vs torch implementations of the reference criteria
(deep_hrnet/lib/core/loss.py)."""

import numpy as np
import pytest
import torch

from udp_pose_tpu.core import loss as jloss


def _torch_joints_mse(output, target, weight, use_w=True):
    """Reference JointsMSELoss (loss.py:15-39) in torch."""
    B, J = output.shape[:2]
    crit = torch.nn.MSELoss(reduction="mean")
    pred = output.reshape(B, J, -1).split(1, 1)
    gt = target.reshape(B, J, -1).split(1, 1)
    total = 0
    for j in range(J):
        p, g = pred[j].squeeze(1), gt[j].squeeze(1)
        if use_w:
            total = total + 0.5 * crit(p * weight[:, j], g * weight[:, j])
        else:
            total = total + 0.5 * crit(p, g)
    return (total / J).item()


def _torch_joints_mse_offset(output, target, weight):
    """Reference JointsMSELoss_offset (loss.py:41-76) in torch."""
    B, C = output.shape[:2]
    J = C // 3
    crit = torch.nn.MSELoss(reduction="mean")
    pred = output.reshape(B, C, -1).split(1, 1)
    gt = target.reshape(B, C, -1).split(1, 1)
    lh, lo = 0, 0
    for j in range(J):
        hp, hg = pred[j * 3].squeeze(1), gt[j * 3].squeeze(1)
        oxp, oxg = pred[j * 3 + 1].squeeze(1), gt[j * 3 + 1].squeeze(1)
        oyp, oyg = pred[j * 3 + 2].squeeze(1), gt[j * 3 + 2].squeeze(1)
        lh = lh + 0.5 * crit(hp * weight[:, j], hg * weight[:, j])
        lo = lo + 0.5 * crit(hg * oxp, hg * oxg)
        lo = lo + 0.5 * crit(hg * oyp, hg * oyg)
    return (lh / J).item(), (lo / J).item()


def _torch_ohkm(output, target, weight, topk=8):
    """Reference JointsOHKMMSELoss (loss.py:119-161) in torch."""
    B, J = output.shape[:2]
    crit = torch.nn.MSELoss(reduction="none")
    pred = output.reshape(B, J, -1).split(1, 1)
    gt = target.reshape(B, J, -1).split(1, 1)
    losses = []
    for j in range(J):
        p, g = pred[j].squeeze(1), gt[j].squeeze(1)
        losses.append(0.5 * crit(p * weight[:, j], g * weight[:, j]))
    losses = torch.cat([l.mean(dim=1, keepdim=True) for l in losses], dim=1)
    total = 0.0
    for b in range(B):
        tv, ti = torch.topk(losses[b], k=topk, dim=0, sorted=False)
        total += torch.gather(losses[b], 0, ti).sum() / topk
    return (total / B).item()


@pytest.fixture
def data():
    rng = np.random.default_rng(50)
    B, J, H, W = 4, 17, 16, 12
    out = rng.normal(size=(B, J, H, W)).astype(np.float32)
    tgt = rng.normal(size=(B, J, H, W)).astype(np.float32)
    w = (rng.uniform(size=(B, J, 1)) > 0.3).astype(np.float32)
    return out, tgt, w


def test_joints_mse_parity(data):
    out, tgt, w = data
    gold = _torch_joints_mse(torch.tensor(out), torch.tensor(tgt),
                             torch.tensor(w))
    got = float(jloss.joints_mse_loss(out, tgt, w))
    np.testing.assert_allclose(got, gold, rtol=1e-5)


def test_joints_mse_no_weight(data):
    out, tgt, w = data
    gold = _torch_joints_mse(torch.tensor(out), torch.tensor(tgt),
                             torch.tensor(w), use_w=False)
    got = float(jloss.joints_mse_loss(out, tgt, w, use_target_weight=False))
    np.testing.assert_allclose(got, gold, rtol=1e-5)


def test_joints_mse_offset_parity():
    rng = np.random.default_rng(51)
    B, J, H, W = 3, 17, 16, 12
    out = rng.normal(size=(B, 3 * J, H, W)).astype(np.float32)
    tgt = rng.normal(size=(B, 3 * J, H, W)).astype(np.float32)
    w = (rng.uniform(size=(B, J, 1)) > 0.3).astype(np.float32)
    gold_h, gold_o = _torch_joints_mse_offset(
        torch.tensor(out), torch.tensor(tgt), torch.tensor(w))
    got_h, got_o = jloss.joints_mse_loss_offset(out, tgt, w)
    np.testing.assert_allclose(float(got_h), gold_h, rtol=1e-5)
    np.testing.assert_allclose(float(got_o), gold_o, rtol=1e-5)


def test_ohkm_parity(data):
    out, tgt, w = data
    gold = _torch_ohkm(torch.tensor(out), torch.tensor(tgt), torch.tensor(w))
    got = float(jloss.joints_ohkm_mse_loss(out, tgt, w, topk=8))
    np.testing.assert_allclose(got, gold, rtol=1e-5)


def test_make_loss_fn_selects(data):
    from udp_pose_tpu.config import default_config
    out, tgt, w = data
    cfg = default_config()
    loss, aux = jloss.make_loss_fn(cfg)(out, tgt, w)
    assert aux == {}
    cfg.MODEL.TARGET_TYPE = "offset"
    rng = np.random.default_rng(1)
    out3 = rng.normal(size=(4, 51, 16, 12)).astype(np.float32)
    tgt3 = rng.normal(size=(4, 51, 16, 12)).astype(np.float32)
    loss3, aux3 = jloss.make_loss_fn(cfg)(out3, tgt3, w)
    assert set(aux3) == {"loss_hm", "loss_os"}
    np.testing.assert_allclose(float(loss3),
                               float(aux3["loss_hm"] + aux3["loss_os"]),
                               rtol=1e-6)
