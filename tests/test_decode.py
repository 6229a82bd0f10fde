"""Golden tests: decoders vs reference inference.py semantics
(deep_hrnet/lib/core/inference.py:20-186)."""

import cv2
import numpy as np
import pytest

from udp_pose_tpu.ops import decode


def _peaky_maps(rng, B=2, J=4, H=64, W=48):
    """Random maps with clear Gaussian peaks (decode-realistic)."""
    maps = rng.uniform(0, 0.05, (B, J, H, W)).astype(np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for b in range(B):
        for j in range(J):
            cy, cx = rng.uniform(5, H - 5), rng.uniform(5, W - 5)
            maps[b, j] += np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 2.0 ** 2)).astype(np.float32)
    return maps


def _ref_get_max_preds(hm):
    B, J, H, W = hm.shape
    flat = hm.reshape(B, J, -1)
    idx = np.argmax(flat, 2).reshape(B, J, 1)
    maxvals = np.amax(flat, 2).reshape(B, J, 1)
    preds = np.tile(idx, (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % W
    preds[:, :, 1] = np.floor(preds[:, :, 1] / W)
    preds *= np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    return preds, maxvals


def _ref_dark_post(coords, hm):
    """Replication of reference `post` (inference.py:60-145)."""
    hm = hm.copy()
    B, J, H, W = hm.shape
    for i in range(B):
        for j in range(J):
            m = hm[i, j]
            maxori = np.max(m)
            m = cv2.GaussianBlur(m, (7, 7), 0)
            mx, mn = np.max(m), np.min(m)
            hm[i, j] = (m - mn) / (mx - mn) * maxori
    hm = np.log(np.clip(hm, 0.001, 50))
    pad = np.pad(hm, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    res = np.zeros(coords.shape)
    ci = coords.astype(np.int32)
    for i in range(B):
        for j in range(J):
            x, y = ci[i, j, 0] + 1, ci[i, j, 1] + 1
            I = pad[i, j, y, x]
            Ix1, Ix1_ = pad[i, j, y, x + 1], pad[i, j, y, x - 1]
            Iy1, Iy1_ = pad[i, j, y + 1, x], pad[i, j, y - 1, x]
            Ix1y1, Ix1_y1_ = pad[i, j, y + 1, x + 1], pad[i, j, y - 1, x - 1]
            dx, dy = 0.5 * (Ix1 - Ix1_), 0.5 * (Iy1 - Iy1_)
            dxx, dyy = Ix1 - 2 * I + Ix1_, Iy1 - 2 * I + Iy1_
            dxy = 0.5 * (Ix1y1 - Ix1 - Iy1 + 2 * I - Ix1_ - Iy1_ + Ix1_y1_)
            hess = np.array([[dxx, dxy], [dxy, dyy]])
            try:
                inv = np.linalg.inv(hess)
            except np.linalg.LinAlgError:
                inv = np.zeros((2, 2))
            res[i, j] = coords[i, j] - (inv @ np.array([dx, dy]))
    return res


def test_get_max_preds_parity():
    rng = np.random.default_rng(10)
    hm = _peaky_maps(rng)
    hm[0, 0] = -1.0  # all-negative map → masked to 0
    gold_p, gold_v = _ref_get_max_preds(hm)
    p, v = decode.get_max_preds(hm)
    np.testing.assert_allclose(np.asarray(p), gold_p, atol=0)
    np.testing.assert_allclose(np.asarray(v), gold_v, atol=0)


def test_dark_refine_parity():
    rng = np.random.default_rng(11)
    hm = _peaky_maps(rng)
    coords, _ = _ref_get_max_preds(hm)
    gold = _ref_dark_post(coords.copy(), hm.copy())
    out = np.asarray(decode.dark_refine(coords, hm))
    np.testing.assert_allclose(out, gold, rtol=1e-3, atol=2e-3)


def test_udp_offset_decode_parity():
    """Replicates inference.py:156-174 (blur, argmax, offset lookup)."""
    rng = np.random.default_rng(12)
    B, J, H, W = 2, 3, 64, 48
    kpd = 4.0
    net = rng.uniform(-0.5, 0.5, (B, 3 * J, H, W)).astype(np.float32)
    net[:, 0::3] = _peaky_maps(rng, B, J, H, W)
    hm = net[:, 0::3].copy()
    ox = net[:, 1::3].copy() * kpd
    oy = net[:, 2::3].copy() * kpd
    for i in range(B):
        for j in range(J):
            hm[i, j] = cv2.GaussianBlur(hm[i, j], (15, 15), 0)
            ox[i, j] = cv2.GaussianBlur(ox[i, j], (7, 7), 0)
            oy[i, j] = cv2.GaussianBlur(oy[i, j], (7, 7), 0)
    gold_c, gold_v = _ref_get_max_preds(hm)
    for n in range(B):
        for p in range(J):
            px, py = int(gold_c[n, p, 0]), int(gold_c[n, p, 1])
            gold_c[n, p, 0] += ox[n, p, py, px]
            gold_c[n, p, 1] += oy[n, p, py, px]
    c, v = decode.udp_offset_decode(net, kpd)
    np.testing.assert_allclose(np.asarray(v), gold_v, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), gold_c, rtol=1e-4, atol=1e-4)


def test_transform_preds_parity():
    rng = np.random.default_rng(13)
    coords = rng.uniform(0, 60, (2, 17, 2)).astype(np.float32)
    center = rng.uniform(50, 400, (2, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (2, 2)).astype(np.float32)
    W, H = 48, 64
    gold = np.zeros_like(coords)
    for i in range(2):
        s200 = scale[i] * 200.0
        gold[i, :, 0] = coords[i, :, 0] * s200[0] / (W - 1.0) + center[i, 0] - s200[0] * 0.5
        gold[i, :, 1] = coords[i, :, 1] * s200[1] / (H - 1.0) + center[i, 1] - s200[1] * 0.5
    out = np.asarray(decode.transform_preds(coords, center, scale, (W, H)))
    np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("target_type", ["gaussian", "offset"])
def test_get_final_preds_runs_and_shapes(target_type):
    rng = np.random.default_rng(14)
    B, J, H, W = 2, 17, 64, 48
    C = J if target_type == "gaussian" else 3 * J
    hm = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
    center = rng.uniform(100, 300, (B, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, (B, 2)).astype(np.float32)
    preds, maxvals, in_input = decode.get_final_preds(
        hm, center, scale, target_type=target_type)
    assert preds.shape == (B, J, 2)
    assert maxvals.shape == (B, J, 1)
    assert in_input.shape == (B, J, 2)
    # preds_in_input_space parity: coords/(hw-1)*(4hw-1) (inference.py:176-179)
    if target_type == "gaussian":
        coords = np.asarray(decode.dark_refine(
            decode.get_max_preds(hm)[0], hm))
        np.testing.assert_allclose(
            np.asarray(in_input)[..., 0],
            coords[..., 0] / (W - 1.0) * (4 * W - 1.0), rtol=1e-4, atol=1e-3)
