"""Golden tests for UDP affine geometry vs cv2 / reference semantics.

Reference semantics under test: get_warpmatrix + cv2.warpAffine crop
(deep_hrnet/lib/dataset/JointsDataset.py:29-49, :226-227), rotate_points
(:51-73), get_affine_transform (lib/utils/transforms.py:77-109).
"""

import cv2
import numpy as np
import pytest

from udp_pose_tpu.ops import affine


def _np_bilinear(img, M, out_hw):
    """Ideal float bilinear warp with dst→src matrix, zero border."""
    H, W, C = img.shape
    oh, ow = out_hw
    ys, xs = np.mgrid[0:oh, 0:ow].astype(np.float64)
    sx = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
    sy = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx, fy = sx - x0, sy - y0
    out = np.zeros((oh, ow, C))
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = img[np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)].astype(np.float64)
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            out += v * (wgt * inb)[..., None]
    return out


@pytest.mark.parametrize("rot", [0.0, 30.0, -45.0])
def test_udp_warp_matrix_matches_reference_formula(rot):
    import math
    center = np.array([123.4, 87.6])
    scale = np.array([1.2, 1.6])
    out_wh = (192, 256)
    m = np.asarray(affine.udp_warp_matrix(rot, center, scale, out_wh))
    # reference get_warpmatrix(theta, c*2, image_size-1, s) reimplementation
    theta = rot / 180.0 * math.pi
    st = scale * 200.0
    size_dst = np.array(out_wh, np.float64) - 1.0
    ref = np.zeros((2, 3))
    ref[0, 0] = math.cos(theta) * st[0] / size_dst[0]
    ref[0, 1] = math.sin(theta) * st[1] / size_dst[1]
    ref[0, 2] = (-0.5 * st[0] * math.cos(theta)
                 - 0.5 * st[1] * math.sin(theta) + 0.5 * (2 * center[0]))
    ref[1, 0] = -math.sin(theta) * st[0] / size_dst[0]
    ref[1, 1] = math.cos(theta) * st[1] / size_dst[1]
    ref[1, 2] = (0.5 * st[0] * math.sin(theta)
                 - 0.5 * st[1] * math.cos(theta) + 0.5 * (2 * center[1]))
    np.testing.assert_allclose(m, ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        affine.udp_warp_matrix_np(rot, center, scale, out_wh), ref,
        rtol=1e-5, atol=1e-4)


def test_warp_affine_matches_ideal_bilinear():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    M = affine.udp_warp_matrix_np(25.0, [80.0, 60.0], [0.5, 0.7], (48, 64))
    out = np.asarray(affine.warp_affine(img, M, (64, 48)))
    gold = _np_bilinear(img, M, (64, 48))
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-2)


def test_warp_affine_matches_cv2_inverse_map():
    rng = np.random.default_rng(1)
    # smooth image: cv2 quantises coords to 1/32 px so random noise would
    # amplify the difference; parity target is sub-pixel geometry.
    base = rng.uniform(0, 255, (15, 20)).astype(np.float32)
    img = cv2.resize(base, (160, 120), interpolation=cv2.INTER_CUBIC)
    img = np.stack([img] * 3, -1)
    M = affine.udp_warp_matrix_np(-15.0, [70.0, 65.0], [0.6, 0.8], (48, 64))
    gold = cv2.warpAffine(img, M, (48, 64),
                          flags=cv2.WARP_INVERSE_MAP | cv2.INTER_LINEAR)
    out = np.asarray(affine.warp_affine(img, M, (64, 48)))
    assert np.abs(out - gold).mean() < 0.2
    assert np.abs(out - gold).max() < 3.0


def test_rotate_joints_is_inverse_of_warp_matrix():
    """Points mapped by udp_rotate_joints must satisfy src = M @ [dst, 1]."""
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 200, (17, 2))
    rot, center, scale = 33.0, np.array([101.0, 99.0]), np.array([1.1, 1.3])
    out_wh = (192, 256)
    dst = np.asarray(affine.udp_rotate_joints(pts, rot, center, scale, out_wh))
    M = affine.udp_warp_matrix_np(rot, center, scale, out_wh)
    back = dst @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-2)


def test_rotate_joints_matches_reference_loop():
    """Scalar replication of reference rotate_points (JointsDataset.py:51-73)."""
    import math
    rng = np.random.default_rng(3)
    pts = rng.uniform(-50, 250, (8, 2))
    rot, c, s = -20.0, np.array([90.0, 110.0]), np.array([0.9, 1.2])
    image_size = np.array([192.0, 256.0])
    st = s * 200.0
    scale_x = (image_size[0] - 1.0) / st[0]
    scale_y = (image_size[1] - 1.0) / st[1]
    radian = rot / 180.0 * math.pi
    rs, rc = -math.sin(radian), math.cos(radian)
    gold = np.zeros_like(pts)
    gold[:, 0] = (rc * (pts[:, 0] - c[0]) + rs * (pts[:, 1] - c[1])
                  + st[0] * 0.5) * scale_x
    gold[:, 1] = (-rs * (pts[:, 0] - c[0]) + rc * (pts[:, 1] - c[1])
                  + st[1] * 0.5) * scale_y
    out = np.asarray(affine.udp_rotate_joints(pts, rot, c, s, (192, 256)))
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("rot,inv", [(0.0, False), (40.0, False), (40.0, True)])
def test_classic_affine_matches_cv2_three_point(rot, inv):
    """vs the reference's cv2.getAffineTransform construction
    (lib/utils/transforms.py:77-109)."""
    center = np.array([100.0, 120.0], np.float32)
    scale = np.array([1.4, 1.8], np.float32)
    out_wh = (192, 256)

    def get_dir(src_point, rot_rad):
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        return [src_point[0] * cs - src_point[1] * sn,
                src_point[0] * sn + src_point[1] * cs]

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    st = scale * 200.0
    rot_rad = np.pi * rot / 180
    src_dir = np.array(get_dir([0, st[0] * -0.5], rot_rad), np.float32)
    dst_dir = np.array([0, out_wh[0] * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0], src[1] = center, center + src_dir
    dst[0] = [out_wh[0] * 0.5, out_wh[1] * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2], dst[2] = third(src[0], src[1]), third(dst[0], dst[1])
    gold = (cv2.getAffineTransform(dst, src) if inv
            else cv2.getAffineTransform(src, dst))

    out = np.asarray(affine.classic_affine_matrix(center, scale, rot, out_wh,
                                                  inv=inv))
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-3)
