"""Debug visualisation (parity: deep_hrnet/lib/utils/vis.py).

Joint grids :20-51, heatmap grids :54-116, ``save_debug_images`` gated by
the DEBUG.* config :119-142 — cv2-based here (no torchvision make_grid);
images come in as NHWC uint8/float batches.
"""

from __future__ import annotations

import math
import os

import numpy as np


def _to_uint8(images):
    x = np.asarray(images)
    if x.dtype != np.uint8:
        x = np.clip(x, 0, 255).astype(np.uint8)
    return x


def _grid(images, nrow=8, padding=2):
    """NHWC uint8 batch → single grid image (torchvision.make_grid role)."""
    x = _to_uint8(images)
    B, H, W, C = x.shape
    ncol = min(nrow, B)
    nrows = math.ceil(B / ncol)
    grid = np.zeros((nrows * (H + padding) + padding,
                     ncol * (W + padding) + padding, C), np.uint8)
    for i in range(B):
        r, c = divmod(i, ncol)
        y0 = r * (H + padding) + padding
        x0 = c * (W + padding) + padding
        grid[y0:y0 + H, x0:x0 + W] = x[i]
    return grid


def save_batch_image_with_joints(batch_image, batch_joints,
                                 batch_joints_vis, file_name, nrow=8):
    """Parity: vis.py:20-51 — green dots on visible joints, grid layout."""
    import cv2
    imgs = _to_uint8(batch_image).copy()
    for i in range(imgs.shape[0]):
        for joint, vis in zip(np.asarray(batch_joints[i]),
                              np.asarray(batch_joints_vis[i])):
            v = vis[0] if np.ndim(vis) else vis
            if v > 0:
                cv2.circle(imgs[i], (int(joint[0]), int(joint[1])), 2,
                           [0, 255, 0], 2)
    cv2.imwrite(file_name, cv2.cvtColor(_grid(imgs, nrow),
                                        cv2.COLOR_RGB2BGR))


def save_batch_heatmaps(batch_image, batch_heatmaps, file_name,
                        normalize=True):
    """Parity: vis.py:54-116 — per-joint colored heatmaps next to the
    resized image, one row per sample."""
    import cv2
    imgs = _to_uint8(batch_image)
    hms = np.asarray(batch_heatmaps, np.float32)
    B, J, hh, hw = hms.shape
    if normalize:
        mn = hms.min(axis=(2, 3), keepdims=True)
        mx = hms.max(axis=(2, 3), keepdims=True)
        hms = (hms - mn) / (mx - mn + 1e-9)
    canvas = np.zeros((B * hh, (J + 1) * hw, 3), np.uint8)
    for b in range(B):
        small = cv2.resize(imgs[b], (hw, hh))
        canvas[b * hh:(b + 1) * hh, 0:hw] = small
        for j in range(J):
            cm = cv2.applyColorMap((hms[b, j] * 255).astype(np.uint8),
                                   cv2.COLORMAP_JET)
            blend = (cm * 0.7 + small * 0.3).astype(np.uint8)
            x0 = (j + 1) * hw
            canvas[b * hh:(b + 1) * hh, x0:x0 + hw] = blend
    cv2.imwrite(file_name, canvas)


def save_debug_images(cfg, images, joints, joints_vis, target, output,
                      prefix, pred_joints=None):
    """Parity: vis.py:119-142 (DEBUG.* gating).  ``pred_joints`` are
    predicted joints in input-crop space (the reference passes
    preds_in_input_space, function.py:219)."""
    if not cfg.DEBUG.DEBUG:
        return
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    if cfg.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(images, joints, joints_vis,
                                     f"{prefix}_gt.jpg")
    if cfg.DEBUG.SAVE_BATCH_IMAGES_PRED and pred_joints is not None:
        save_batch_image_with_joints(images, pred_joints, joints_vis,
                                     f"{prefix}_pred.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_GT:
        save_batch_heatmaps(images, target, f"{prefix}_hm_gt.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_PRED:
        save_batch_heatmaps(images, output, f"{prefix}_hm_pred.jpg")
