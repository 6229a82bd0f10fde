"""OpenCV-parity Gaussian blur as MXU-friendly banded matmuls.

The reference decode path blurs every heatmap with ``cv2.GaussianBlur`` —
15×15 on offset-mode heatmaps, 7×7 on offsets and in DARK post-processing
(reference: deep_hrnet/lib/core/inference.py:76, :163-167).  OpenCV semantics
reproduced here:

* ``sigma <= 0`` → ``sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8``, and for
  ``ksize <= 7`` OpenCV substitutes fixed small-kernel tables.
* Default border is ``BORDER_REFLECT_101`` (edge pixel not repeated).

Instead of a gather/conv, the separable blur is expressed as two small dense
banded matrices (built host-side, border baked in): ``out = B_h @ x @ B_w^T``.
On TPU these (H×H)/(W×W) matmuls ride the MXU and fuse into surrounding ops —
for 64×48 heatmaps this is far faster than a depthwise conv lowering.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV's fixed kernels for small ksize when sigma <= 0 (smoothing tables).
_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125,
                 0.21875, 0.109375, 0.03125]),
}


def opencv_gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D Gaussian kernel with exact cv2.getGaussianKernel semantics."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN_TAB:
        return _SMALL_GAUSSIAN_TAB[ksize].astype(np.float64)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _reflect101_index(i: int, n: int) -> int:
    """Map an out-of-range index into [0, n) with BORDER_REFLECT_101."""
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i = i % period
    if i < 0:
        i += period
    return i if i < n else period - i


@lru_cache(maxsize=None)
def _blur_matrix(n: int, ksize: int, sigma: float) -> np.ndarray:
    """(n, n) matrix B with (B @ v) == 1-D Gaussian blur of v, border folded in."""
    k = opencv_gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    B = np.zeros((n, n), np.float64)
    for i in range(n):
        for t in range(ksize):
            j = _reflect101_index(i + t - r, n)
            B[i, j] += k[t]
    return B.astype(np.float32)


def gaussian_blur(maps, ksize: int, sigma: float = 0.0):
    """cv2.GaussianBlur-parity blur of (..., H, W) maps, fully batched."""
    H, W = maps.shape[-2], maps.shape[-1]
    Bh = jnp.asarray(_blur_matrix(H, ksize, sigma))
    Bw = jnp.asarray(_blur_matrix(W, ksize, sigma))
    # (..., H, W): blur rows then columns — einsum keeps it one fused
    # contraction.  HIGHEST precision: on TPU the MXU would otherwise use
    # bf16 inputs, which breaks sub-pixel decode parity with cv2.
    out = jnp.einsum("ij,...jk,lk->...il", Bh, maps.astype(jnp.float32), Bw,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out
