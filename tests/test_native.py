"""Native C++ library: build, load, numerical parity with the python ops."""

import numpy as np
import pytest

from udp_pose_tpu import native
from udp_pose_tpu.ops import nms as pynms
from udp_pose_tpu.ops.affine import udp_warp_matrix_np, warp_affine


def test_native_builds_and_loads():
    assert native.available(), "native library failed to build/load"


def test_native_warp_matches_jax_op():
    rng = np.random.default_rng(100)
    img = rng.integers(0, 256, (240, 320, 3), np.uint8)
    mats = np.stack([
        udp_warp_matrix_np(r, [160.0 + r, 120.0], [0.6, 0.8], (96, 128))
        for r in (0.0, 15.0, -30.0)])
    out = native.warp_affine_batch(img, mats, (128, 96))
    assert out.shape == (3, 128, 96, 3)
    for i in range(3):
        gold = np.asarray(warp_affine(img.astype(np.float32), mats[i],
                                      (128, 96)))
        np.testing.assert_allclose(out[i], gold, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("plus_one", [True, False])
def test_native_nms_matches_python(plus_one):
    rng = np.random.default_rng(101)
    n = 60
    xy = rng.uniform(0, 300, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    dets = np.concatenate([xy, xy + wh, rng.uniform(0, 1, (n, 1))],
                          1).astype(np.float32)
    gold = pynms.nms_np(dets, 0.5, plus_one=plus_one)
    got = native.greedy_nms(dets, 0.5, plus_one=plus_one)
    assert got == gold


def test_native_oks_iou_matches_python():
    rng = np.random.default_rng(102)
    kpts = rng.uniform(0, 200, (7, 51))
    areas = rng.uniform(1000, 9000, (7,))
    gold = pynms.oks_iou(kpts[0], kpts[1:], areas[0], areas[1:])
    got = native.oks_iou(kpts[0], kpts[1:], areas[0], areas[1:],
                         pynms.COCO_SIGMAS)
    np.testing.assert_allclose(got, gold, rtol=1e-4)
