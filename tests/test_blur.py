"""Golden tests: matmul Gaussian blur vs cv2.GaussianBlur.

The decode path's numerics hinge on exact cv2 blur parity
(reference inference.py:76 [7×7 DARK], :163-167 [15×15 + 7×7 offset]).
"""

import cv2
import numpy as np
import pytest

from udp_pose_tpu.ops.blur import gaussian_blur, opencv_gaussian_kernel1d


@pytest.mark.parametrize("ksize", [3, 5, 7, 11, 15])
def test_kernel_matches_cv2(ksize):
    gold = cv2.getGaussianKernel(ksize, 0).ravel()
    np.testing.assert_allclose(opencv_gaussian_kernel1d(ksize), gold,
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("ksize", [7, 15])
@pytest.mark.parametrize("hw", [(64, 48), (96, 72), (5, 5)])
def test_blur_matches_cv2(ksize, hw):
    rng = np.random.default_rng(42)
    x = rng.uniform(-1, 50, (2, 3) + hw).astype(np.float32)
    gold = np.stack([
        np.stack([cv2.GaussianBlur(x[b, j], (ksize, ksize), 0)
                  for j in range(x.shape[1])])
        for b in range(x.shape[0])])
    out = np.asarray(gaussian_blur(x, ksize))
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)


def test_blur_preserves_mass_interior():
    x = np.zeros((1, 1, 33, 33), np.float32)
    x[0, 0, 16, 16] = 1.0
    out = np.asarray(gaussian_blur(x, 7))
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)
