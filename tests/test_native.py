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


def test_resize_bilinear_cv2_parity():
    """Native (and numpy-fallback) bilinear u8 resize vs cv2
    INTER_LINEAR: within 1 LSB everywhere, across up/down-scales and
    odd sizes (the --low-bw host letterbox contract)."""
    import cv2

    from udp_pose_tpu import native

    rng = np.random.default_rng(0)
    for (H, W, oh, ow) in [(720, 1280, 360, 640), (240, 320, 96, 128),
                           (500, 333, 250, 166), (101, 77, 321, 211)]:
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        got = native.resize_bilinear(img, (oh, ow))
        assert got.dtype == np.uint8 and got.shape == ref.shape
        d = np.abs(got.astype(int) - ref.astype(int))
        assert d.max() <= 1, d.max()
        # exercise the pure-numpy branch explicitly
        lib, native._lib = native._lib, None
        orig_try = native._try_load
        native._try_load = lambda: None
        try:
            got_np = native.resize_bilinear(img, (oh, ow))
        finally:
            native._try_load = orig_try
            native._lib = lib
        d2 = np.abs(got_np.astype(int) - ref.astype(int))
        assert d2.max() <= 1, d2.max()
