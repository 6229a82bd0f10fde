"""YOLO detector pre/post-processing (native, torch-free).

Parity: tools/infer_utils/boxes.py — letterbox :8-23 (mod-32 padding,
value 114), scale_boxes :26-38, xywh2xyxy :41-48, non_max_suppression
:78-169 (conf = obj·cls, best-class, class-offset batched NMS with *plain*
IoU like torchvision.ops.nms, max_det cap), yolo2xyxy :219-231;
inference_engine.py:137-147 padding_bbox (±5 px).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .nms import nms_np


def letterbox(img, new_shape=(640, 640)):
    """Resize keeping aspect, pad to stride-32 with value 114 (host cv2)."""
    import cv2
    H, W = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / H, new_shape[1] / W)
    nH, nW = round(H * r), round(W * r)
    pH = np.mod(new_shape[0] - nH, 32) / 2
    pW = np.mod(new_shape[1] - nW, 32) / 2
    if (H, W) != (nH, nW):
        img = cv2.resize(img, (nW, nH), interpolation=cv2.INTER_LINEAR)
    top, bottom = round(pH - 0.1), round(pH + 0.1)
    left, right = round(pW - 0.1), round(pW + 0.1)
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return img


def scale_boxes(boxes, orig_shape_hw, new_shape_hw):
    """Letterboxed-space xyxy boxes → original image space, rounded."""
    H, W = orig_shape_hw
    nH, nW = new_shape_hw
    gain = min(nH / H, nW / W)
    pad_y, pad_x = (nH - H * gain) / 2, (nW - W * gain) / 2
    out = np.asarray(boxes, np.float64).copy()
    out[:, 0::2] -= pad_x
    out[:, 1::2] -= pad_y
    out[:, :4] /= gain
    out[:, 0::2] = out[:, 0::2].clip(0, W)
    out[:, 1::2] = out[:, 1::2].clip(0, H)
    return out.round()


def xywh2xyxy(x):
    out = np.asarray(x, np.float64).copy()
    out[:, 0] = x[:, 0] - x[:, 2] / 2
    out[:, 1] = x[:, 1] - x[:, 3] / 2
    out[:, 2] = x[:, 0] + x[:, 2] / 2
    out[:, 3] = x[:, 1] + x[:, 3] / 2
    return out


def non_max_suppression(prediction, conf_thres=0.25, iou_thres=0.45,
                        classes: Optional[Sequence[int]] = None,
                        agnostic=False, max_det=300):
    """YOLO raw output (B, N, 5+nc) → list of (n, 6) [xyxy, conf, cls].

    Best-class-only path of the reference (boxes.py:78-169); batched NMS
    via the class-offset trick with plain (non-+1) IoU.
    """
    nc = prediction.shape[2] - 5
    max_wh, max_nms = 4096, 30000
    outputs = []
    for x in np.asarray(prediction, np.float64):
        x = x[x[:, 4] > conf_thres]
        if not x.shape[0]:
            outputs.append(np.zeros((0, 6)))
            continue
        x[:, 5:] *= x[:, 4:5]
        box = xywh2xyxy(x[:, :4])
        conf = x[:, 5:].max(1)
        cls = x[:, 5:].argmax(1).astype(np.float64)
        x = np.concatenate([box, conf[:, None], cls[:, None]], 1)
        x = x[conf > conf_thres]
        if classes is not None:
            x = x[np.isin(x[:, 5], np.asarray(classes, np.float64))]
        n = x.shape[0]
        if not n:
            outputs.append(np.zeros((0, 6)))
            continue
        if n > max_nms:
            x = x[np.argsort(-x[:, 4])[:max_nms]]
        c = x[:, 5:6] * (0 if agnostic else max_wh)
        dets = np.concatenate([x[:, :4] + c, x[:, 4:5]], 1)
        # native C++ greedy NMS when built (25k-candidate frames are
        # seconds in numpy); numpy fallback is semantics-identical
        from ..native import greedy_nms
        keep = greedy_nms(np.ascontiguousarray(dets, np.float32),
                          iou_thres, plus_one=False)[:max_det]
        outputs.append(x[keep])
    return outputs


def padding_bbox(x1, y1, x2, y2, img_shape_hw, pad=5):
    """±``pad`` px box padding clipped to the image
    (inference_engine.py:137-147; CLI ``--padding``, default 5)."""
    h, w = img_shape_hw[:2]
    x1 = max(0, x1 - pad)
    y1 = max(0, y1 - pad)
    x2 = min(w, x2 + pad)
    y2 = min(h, y2 + pad)
    return x1, y1, x2, y2


def yolo2xyxy(size_hw, box_xywh_norm):
    """Normalised YOLO-label box → clipped integer xyxy (boxes.py:219-231)."""
    ih, iw = size_hw[0], size_hw[1]
    cx, cy, w, h = box_xywh_norm
    x1 = round((cx - w / 2) * iw - 1)
    x2 = round((cx + w / 2) * iw - 1)
    y1 = round((cy - h / 2) * ih - 1)
    y2 = round((cy + h / 2) * ih - 1)
    return (max(0, x1), max(0, y1), min(iw - 1, x2), min(ih - 1, y2))
