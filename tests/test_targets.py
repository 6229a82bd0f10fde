"""Golden tests: target encoders vs reference generate_target semantics
(deep_hrnet/lib/dataset/JointsDataset.py:291-385)."""

import numpy as np
import pytest

from udp_pose_tpu.ops import targets

HEATMAP = (48, 64)   # (w, h)
IMAGE = (192, 256)


def _ref_gaussian(joints, joints_vis, heatmap_size, image_size, sigma):
    """Loop replication of the reference's windowed-patch scatter
    (JointsDataset.py:301-348), kept structurally identical for fidelity."""
    W, H = heatmap_size
    J = len(joints)
    target = np.zeros((J, H, W), np.float32)
    weight = np.ones((J,), np.float32)
    weight[:] = joints_vis[:, 0]
    tmp_size = sigma * 3
    for j in range(J):
        feat_stride = (np.array(image_size) - 1.0) / (np.array(heatmap_size) - 1.0)
        mu_x = int(joints[j][0] / feat_stride[0] + 0.5)
        mu_y = int(joints[j][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        mu_x_ac = joints[j][0] / feat_stride[0]
        mu_y_ac = joints[j][1] / feat_stride[1]
        x0 = size // 2 + mu_x_ac - mu_x
        y0 = size // 2 + mu_y_ac - mu_y
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        if weight[j] > 0.5:
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, weight


def _ref_offset(joints, joints_vis, heatmap_size, image_size, kpd):
    """Replication of JointsDataset.py:349-381."""
    W, H = heatmap_size
    J = len(joints)
    target = np.zeros((J, 3, H * W), np.float32)
    weight = joints_vis[:, 0].astype(np.float32).copy()
    fx, fy = np.meshgrid(np.arange(W), np.arange(H))
    fx, fy = fx.ravel(), fy.ravel()
    stride = (np.array(image_size) - 1.0) / (np.array(heatmap_size) - 1.0)
    for j in range(J):
        mu_x = joints[j][0] / stride[0]
        mu_y = joints[j][1] / stride[1]
        xo = (mu_x - fx) / kpd
        yo = (mu_y - fy) / kpd
        dis = xo ** 2 + yo ** 2
        keep = np.where((dis <= 1) & (dis >= 0))[0]
        if weight[j] > 0.5:
            target[j, 0, keep] = 1
            target[j, 1, keep] = xo[keep]
            target[j, 2, keep] = yo[keep]
    return target.reshape(J * 3, H, W), weight


def _sample_joints(rng, n=17):
    joints = rng.uniform(-30, 230, (n, 3)).astype(np.float32)
    vis = (rng.uniform(size=(n, 3)) > 0.2).astype(np.float32)
    vis[:, 1:] = vis[:, :1]
    # include edge cases: far outside, exactly on border, at 0
    joints[0, :2] = [-500.0, -500.0]
    joints[1, :2] = [191.0, 255.0]
    joints[2, :2] = [0.0, 0.0]
    joints[3, :2] = [191.9, 0.1]
    return joints, vis


@pytest.mark.parametrize("sigma", [2, 3])
def test_gaussian_targets_parity(sigma):
    rng = np.random.default_rng(7)
    joints, vis = _sample_joints(rng)
    gold_t, gold_w = _ref_gaussian(joints, vis, HEATMAP, IMAGE, sigma)
    out_t, out_w = targets.gaussian_targets(joints, vis, HEATMAP, IMAGE, sigma)
    np.testing.assert_allclose(np.asarray(out_w), gold_w, atol=0)
    np.testing.assert_allclose(np.asarray(out_t), gold_t, rtol=1e-5, atol=1e-6)
    np_t, np_w = targets.gaussian_targets_np(joints, vis, HEATMAP, IMAGE, sigma)
    np.testing.assert_allclose(np_t, gold_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np_w, gold_w, atol=0)


@pytest.mark.parametrize("kpd", [4.0, 3.5])
def test_offset_targets_parity(kpd):
    rng = np.random.default_rng(8)
    joints, vis = _sample_joints(rng)
    gold_t, gold_w = _ref_offset(joints, vis, HEATMAP, IMAGE, kpd)
    out_t, out_w = targets.offset_targets(joints, vis, HEATMAP, IMAGE, kpd)
    np.testing.assert_allclose(np.asarray(out_w), gold_w, atol=0)
    # pixels sitting numerically *on* the disc rim (|dis-1| ~ float eps) can
    # flip membership between the float32 op and the float64 golden — mask
    # them out; they carry no semantic weight.
    W, H = HEATMAP
    fx, fy = np.meshgrid(np.arange(W), np.arange(H))
    stride = (np.array(IMAGE) - 1.0) / (np.array(HEATMAP) - 1.0)
    rim = np.zeros((len(joints), H, W), bool)
    for j in range(len(joints)):
        xo = (joints[j][0] / stride[0] - fx) / kpd
        yo = (joints[j][1] / stride[1] - fy) / kpd
        rim[j] = np.abs(xo ** 2 + yo ** 2 - 1.0) < 1e-5
    rim3 = np.repeat(rim, 3, axis=0)
    ok = ~rim3
    np.testing.assert_allclose(np.asarray(out_t)[ok], gold_t[ok],
                               rtol=1e-5, atol=1e-5)


def test_batch_wrappers_shapes():
    rng = np.random.default_rng(9)
    joints = rng.uniform(0, 200, (4, 17, 3)).astype(np.float32)
    vis = np.ones((4, 17, 3), np.float32)
    t, w = targets.batch_gaussian_targets(joints, vis, HEATMAP, IMAGE, 2)
    assert t.shape == (4, 17, 64, 48) and w.shape == (4, 17)
    t, w = targets.batch_offset_targets(joints, vis, HEATMAP, IMAGE, 4.0)
    assert t.shape == (4, 51, 64, 48) and w.shape == (4, 17)
