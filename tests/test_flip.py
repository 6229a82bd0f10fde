"""Golden tests: flip-test alignment vs reference transforms.py:15-64."""

import numpy as np

from udp_pose_tpu.ops import flip

COCO_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
              [15, 16]]


def _ref_flip_back(out, pairs):
    out = out[:, :, :, ::-1].copy()
    for a, b in pairs:
        tmp = out[:, a].copy()
        out[:, a] = out[:, b]
        out[:, b] = tmp
    return out


def _ref_flip_back_offset(out, pairs):
    out = out[:, :, :, ::-1].copy()
    sh = out.shape
    out[:, 1::3] = -out[:, 1::3]
    out = out.reshape(sh[0], -1, 3, sh[2], sh[3])
    for a, b in pairs:
        tmp = out[:, a].copy()
        out[:, a] = out[:, b]
        out[:, b] = tmp
    return out.reshape(sh)


def test_flip_back_parity():
    rng = np.random.default_rng(20)
    x = rng.normal(size=(2, 17, 64, 48)).astype(np.float32)
    gold = _ref_flip_back(x.copy(), COCO_PAIRS)
    out = np.asarray(flip.flip_back(x, COCO_PAIRS))
    np.testing.assert_array_equal(out, gold)


def test_flip_back_offset_parity():
    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, 51, 64, 48)).astype(np.float32)
    gold = _ref_flip_back_offset(x.copy(), COCO_PAIRS)
    out = np.asarray(flip.flip_back_offset(x, COCO_PAIRS))
    np.testing.assert_allclose(out, gold, atol=0)


def test_fliplr_joints_parity():
    rng = np.random.default_rng(22)
    joints = rng.uniform(0, 300, (17, 3)).astype(np.float32)
    vis = (rng.uniform(size=(17, 3)) > 0.3).astype(np.float32)
    vis[:, 1:] = vis[:, :1]
    width = 320
    # reference loop (transforms.py:50-64)
    gj, gv = joints.copy(), vis.copy()
    gj[:, 0] = width - gj[:, 0] - 1
    for a, b in COCO_PAIRS:
        gj[[a, b]] = gj[[b, a]]
        gv[[a, b]] = gv[[b, a]]
    gold = gj * gv
    out_j, out_v = flip.fliplr_joints_np(joints, vis, width, COCO_PAIRS)
    np.testing.assert_allclose(out_j, gold, atol=0)
    np.testing.assert_allclose(out_v, gv, atol=0)


def test_flip_roundtrip_consistency():
    """flip_back(forward(flip(x))) ≈ forward(x) for a symmetric 'model'."""
    rng = np.random.default_rng(23)
    hm = rng.normal(size=(1, 17, 64, 48)).astype(np.float32)
    # a width-symmetric transform commutes with flips
    sym = hm + hm[:, :, :, ::-1]
    perm = flip.flip_pair_permutation(17, COCO_PAIRS)
    flipped_in = sym[:, perm, :, ::-1]
    back = np.asarray(flip.flip_back(flipped_in, COCO_PAIRS))
    np.testing.assert_allclose(back, sym, atol=1e-6)
