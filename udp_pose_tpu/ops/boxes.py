"""Box geometry: xyxy/xywh, box → UDP center/scale, letterbox.

Parity targets in the reference:
  * COCODataset._xywh2cs (deep_hrnet/lib/dataset/coco.py:214-229)
  * UdpPsaPoseAbs._box_to_center_scale (pose_engine.py:55-63)
  * letterbox / scale_boxes (tools/infer_utils/boxes.py:8-38)

All functions are numpy/jnp polymorphic (pure arithmetic) and batched.
"""

from __future__ import annotations

import numpy as np

PIXEL_STD = 200.0


def _xp(arr):
    """numpy for numpy inputs, jax.numpy otherwise (pure-math polymorphism)."""
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def xyxy2cxcywh(boxes):
    """(..., 4) [x1,y1,x2,y2] → [cx,cy,w,h] (pose_engine.py:46-53)."""
    xp = _xp(boxes)
    return xp.stack([
        (boxes[..., 0] + boxes[..., 2]) * 0.5,
        (boxes[..., 1] + boxes[..., 3]) * 0.5,
        boxes[..., 2] - boxes[..., 0],
        boxes[..., 3] - boxes[..., 1],
    ], axis=-1)


def xyxy_to_cs(boxes, input_size_wh, scale_factor=1.25):
    """Batched xyxy boxes → UDP (center, scale) pairs.

    Matches pose_engine._box_to_center_scale (pose_engine.py:55-63): grow the
    short side to the model aspect ratio ``w/h = input_w/input_h``, divide by
    200, multiply by ``scale_factor``.  Works on numpy or jnp arrays.
    Returns (center (...,2), scale (...,2)).
    """
    xp = _xp(boxes)
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    r = float(input_size_wh[0]) / float(input_size_wh[1])
    wide = w > h * r
    h = xp.where(wide, w / r, h)
    w = xp.where(wide, w, h * r)
    scale = xp.stack([w, h], axis=-1) / PIXEL_STD * scale_factor
    center = xp.stack([cx, cy], axis=-1)
    return center, scale


def xywh_to_cs(x, y, w, h, aspect_ratio, scale_factor=1.25):
    """COCO-dataset xywh box → (center, scale) (coco.py:214-229).

    ``aspect_ratio = image_w / image_h`` of the model input.  The reference
    skips the 1.25 enlargement when cx == -1.
    """
    center = np.array([x + w * 0.5, y + h * 0.5], np.float32)
    if w > aspect_ratio * h:
        h = w * 1.0 / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / PIXEL_STD, h / PIXEL_STD], np.float32)
    if center[0] != -1:
        scale = scale * scale_factor
    return center, scale
