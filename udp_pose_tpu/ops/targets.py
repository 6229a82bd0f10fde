"""Target encoders: joints → training heatmaps, closed-form and batched.

TPU-native rewrite of reference ``JointsDataset.generate_target``
(deep_hrnet/lib/dataset/JointsDataset.py:291-385).  The reference scatters a
windowed Gaussian patch per joint in a Python loop on the host; here each
encoder is a closed-form expression over a meshgrid — `vmap` over joints and
batch, jit-compiled, so target generation runs on-device as part of the
train step (or vectorised on host workers via the numpy twins).

All encoders use the UDP feature stride ``(image_size-1)/(heatmap_size-1)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _grids(heatmap_size_wh):
    W, H = heatmap_size_wh
    px = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    return px, py


@partial(jax.jit, static_argnames=("heatmap_size", "image_size", "sigma"))
def gaussian_targets(joints, joints_vis, heatmap_size, image_size, sigma):
    """Windowed unit-peak Gaussian heatmaps (JointsDataset.py:301-348).

    joints: (J, 2+) image-space xy; joints_vis: (J,) or (J, K) visibility
    (column 0 used).  heatmap_size/image_size are static (w, h); sigma the
    Gaussian std in heatmap pixels.  Returns (target (J, H, W) float32,
    weight (J,) float32).  Parity notes: the peak centre is the *continuous*
    sub-pixel location (UDP), the support window is the ±3σ box around the
    *rounded* centre (int truncation semantics), and joints whose window
    misses the map get weight 0.
    """
    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    if vis.ndim == 2:
        vis = vis[:, 0]
    W, H = heatmap_size
    stride_x = (image_size[0] - 1.0) / (W - 1.0)
    stride_y = (image_size[1] - 1.0) / (H - 1.0)
    tmp = float(sigma) * 3.0

    mu_ax = joints[:, 0] / stride_x          # continuous centre (J,)
    mu_ay = joints[:, 1] / stride_y
    mu_x = jnp.trunc(mu_ax + 0.5)            # int(x + 0.5) truncation parity
    mu_y = jnp.trunc(mu_ay + 0.5)
    ul_x = jnp.trunc(mu_x - tmp)
    ul_y = jnp.trunc(mu_y - tmp)
    br_x = jnp.trunc(mu_x + tmp + 1.0)
    br_y = jnp.trunc(mu_y + tmp + 1.0)

    oob = (ul_x >= W) | (ul_y >= H) | (br_x < 0) | (br_y < 0)
    weight = jnp.where(oob, 0.0, vis)

    px, py = _grids(heatmap_size)
    d2 = ((px[None] - mu_ax[:, None, None]) ** 2 +
          (py[None] - mu_ay[:, None, None]) ** 2)
    g = jnp.exp(-d2 / (2.0 * float(sigma) ** 2))
    window = ((px[None] >= ul_x[:, None, None]) &
              (px[None] < br_x[:, None, None]) &
              (py[None] >= ul_y[:, None, None]) &
              (py[None] < br_y[:, None, None]))
    active = (weight > 0.5)[:, None, None]
    target = jnp.where(window & active, g, 0.0)
    return target, weight


@partial(jax.jit, static_argnames=("heatmap_size", "image_size", "kpd"))
def offset_targets(joints, joints_vis, heatmap_size, image_size, kpd):
    """UDP combined heatmap+offset targets (JointsDataset.py:349-381).

    Returns (target (3J, H, W) interleaved [hm, off_x, off_y] per joint,
    weight (J,)).  Inside the unit disc of radius ``kpd`` heatmap pixels the
    classification map is 1 and the offsets hold the normalised sub-pixel
    displacement to the true continuous joint location.
    """
    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    if vis.ndim == 2:
        vis = vis[:, 0]
    W, H = heatmap_size
    stride_x = (image_size[0] - 1.0) / (W - 1.0)
    stride_y = (image_size[1] - 1.0) / (H - 1.0)

    mu_x = joints[:, 0] / stride_x
    mu_y = joints[:, 1] / stride_y
    px, py = _grids(heatmap_size)
    off_x = (mu_x[:, None, None] - px[None]) / float(kpd)
    off_y = (mu_y[:, None, None] - py[None]) / float(kpd)
    dis = off_x ** 2 + off_y ** 2
    keep = (dis <= 1.0) & (vis > 0.5)[:, None, None]
    hm = jnp.where(keep, 1.0, 0.0)
    ox = jnp.where(keep, off_x, 0.0)
    oy = jnp.where(keep, off_y, 0.0)
    target = jnp.stack([hm, ox, oy], axis=1)        # (J, 3, H, W)
    J = joints.shape[0]
    return target.reshape(J * 3, H, W), vis


def batch_gaussian_targets(joints, joints_vis, heatmap_size, image_size,
                           sigma):
    """vmap of :func:`gaussian_targets` over a leading batch dim."""
    fn = partial(gaussian_targets, heatmap_size=heatmap_size,
                 image_size=image_size, sigma=sigma)
    return jax.vmap(fn)(joints, joints_vis)


def batch_offset_targets(joints, joints_vis, heatmap_size, image_size, kpd):
    """vmap of :func:`offset_targets` over a leading batch dim."""
    fn = partial(offset_targets, heatmap_size=heatmap_size,
                 image_size=image_size, kpd=kpd)
    return jax.vmap(fn)(joints, joints_vis)


# RSN kernel-size → sigma table (RSN/dataset/JointsDataset.py:19-25)
RSN_KERNEL_SIGMA = {15: 2.6, 11: 2.0, 9: 1.7, 7: 1.4105, 5: 1.1105}
RSN_DEFAULT_KERNELS = (15, 11, 9, 7, 5)


@partial(jax.jit, static_argnames=("heatmap_size", "image_size", "kernels"))
def rsn_targets(joints, valid, heatmap_size, image_size,
                kernels=RSN_DEFAULT_KERNELS):
    """RSN multi-kernel 255-amplitude label pyramid
    (RSN/dataset/JointsDataset.py:214-220, :276-291).

    joints (J, 2+) crop-space xy; valid (J,) — joints with valid < 1 give
    all-zero maps.  Full-map Gaussians (no window), unbiased stride
    ``(in-1)/(out-1)``, peak 255.  Returns (len(kernels), J, H, W).
    """
    joints = jnp.asarray(joints, jnp.float32)
    v = jnp.asarray(valid, jnp.float32)
    if v.ndim == 2:
        v = v[:, 0]
    W, H = heatmap_size
    sx = (W - 1.0) / (image_size[0] - 1.0)
    sy = (H - 1.0) / (image_size[1] - 1.0)
    px, py = _grids(heatmap_size)
    tx = (joints[:, 0] * sx)[:, None, None]
    ty = (joints[:, 1] * sy)[:, None, None]
    d2 = (px[None] - tx) ** 2 + (py[None] - ty) ** 2
    maps = []
    for k in kernels:
        sigma = RSN_KERNEL_SIGMA[k]
        g = 255.0 * jnp.exp(-d2 / (2.0 * sigma ** 2))
        maps.append(jnp.where((v >= 1.0)[:, None, None], g, 0.0))
    return jnp.stack(maps)


def rsn_targets_np(joints, valid, heatmap_size, image_size,
                   kernels=RSN_DEFAULT_KERNELS):
    """Host twin of :func:`rsn_targets`."""
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    J = joints.shape[0]
    v = np.asarray(valid, np.float32)
    if v.ndim == 2:
        v = v[:, 0]
    fx, fy = np.meshgrid(np.arange(W), np.arange(H))
    out = np.zeros((len(kernels), J, H, W), np.float32)
    for ki, k in enumerate(kernels):
        sigma = RSN_KERNEL_SIGMA[k]
        for j in range(J):
            if v[j] < 1:
                continue
            tx = joints[j][0] * (W - 1.0) / (image_size[0] - 1.0)
            ty = joints[j][1] * (H - 1.0) / (image_size[1] - 1.0)
            d2 = (fx - tx) ** 2 + (fy - ty) ** 2
            out[ki, j] = 255.0 * np.exp(-d2 / (2.0 * sigma ** 2))
    return out


# ---------------------------------------------------------------------------
# numpy twin of the reference encoder, used as the golden model in tests and
# by host-side data workers that overlap target generation with TPU compute.
# ---------------------------------------------------------------------------

def offset_targets_np(joints, joints_vis, heatmap_size, image_size, kpd):
    """Host twin of :func:`offset_targets` (JointsDataset.py:349-381)."""
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    J = joints.shape[0]
    vis = np.asarray(joints_vis, np.float32)
    if vis.ndim == 2:
        vis = vis[:, 0]
    target = np.zeros((J, 3, H * W), np.float32)
    fx, fy = np.meshgrid(np.arange(W), np.arange(H))
    fx, fy = fx.ravel(), fy.ravel()
    stride = (np.asarray(image_size, np.float64) - 1.0) / (
        np.asarray(heatmap_size, np.float64) - 1.0)
    for j in range(J):
        if vis[j] <= 0.5:
            continue
        xo = (joints[j][0] / stride[0] - fx) / kpd
        yo = (joints[j][1] / stride[1] - fy) / kpd
        keep = (xo ** 2 + yo ** 2) <= 1
        target[j, 0, keep] = 1
        target[j, 1, keep] = xo[keep]
        target[j, 2, keep] = yo[keep]
    return target.reshape(J * 3, H, W), vis.copy()


def gaussian_targets_np(joints, joints_vis, heatmap_size, image_size, sigma):
    """Direct numpy replication of JointsDataset.py:301-348 semantics."""
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    J = joints.shape[0]
    vis = np.asarray(joints_vis, np.float32)
    if vis.ndim == 2:
        vis = vis[:, 0]
    target = np.zeros((J, H, W), np.float32)
    weight = vis.copy()
    stride = (np.asarray(image_size, np.float64) - 1.0) / (
        np.asarray(heatmap_size, np.float64) - 1.0)
    tmp = sigma * 3
    for j in range(J):
        mu_ax = joints[j][0] / stride[0]
        mu_ay = joints[j][1] / stride[1]
        mu_x = int(mu_ax + 0.5)
        mu_y = int(mu_ay + 0.5)
        ul = [int(mu_x - tmp), int(mu_y - tmp)]
        br = [int(mu_x + tmp + 1), int(mu_y + tmp + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        if weight[j] > 0.5:
            xs = np.arange(max(0, ul[0]), min(br[0], W))
            ys = np.arange(max(0, ul[1]), min(br[1], H))
            gx = np.exp(-(xs - mu_ax) ** 2 / (2 * sigma ** 2))
            gy = np.exp(-(ys - mu_ay) ** 2 / (2 * sigma ** 2))
            target[j][np.ix_(ys, xs)] = gy[:, None] * gx[None, :]
    return target, weight
