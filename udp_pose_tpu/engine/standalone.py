"""Dependency-light standalone pose engine.

Parity: deep_hrnet/tools/infer_standalone.py:11-179 — no config object, no
training stack: resize-only preprocessing (:90-99, letterbox-free), plain
argmax decode mapped back through the resize (:101-103).  Backend here is
any callable ``(B, H, W, 3) float32 normalised → (B, h, w, J) heatmaps``
(a jitted Flax apply, or an imported StableHLO artifact).
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

from ..core.train import IMAGENET_MEAN, IMAGENET_STD


class StandalonePoseEngine:
    def __init__(self, model_fn: Callable, input_wh: Tuple[int, int] = (192, 256)):
        self.model_fn = model_fn
        self.input_wh = input_wh

    def _preprocess(self, img, boxes):
        import cv2
        w, h = self.input_wh
        crops, metas = [], []
        for x1, y1, x2, y2 in np.asarray(boxes, int)[:, :4]:
            patch = img[y1:y2, x1:x2]
            if patch.size == 0:
                patch = np.zeros((h, w, 3), np.uint8)
            crop = cv2.resize(patch, (w, h), interpolation=cv2.INTER_LINEAR)
            crops.append(crop)
            metas.append((x1, y1, max(x2 - x1, 1), max(y2 - y1, 1)))
        x = np.stack(crops).astype(np.float32) / 255.0
        x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        return x.astype(np.float32), metas

    def infer_pose(self, img, boxes):
        """img RGB uint8; boxes (N, ≥4) xyxy → (keypoints (N, J, 2),
        maxvals (N, J, 1)) in source space."""
        x, metas = self._preprocess(img, boxes)
        out = np.asarray(self.model_fn(x))           # (N, h, w, J)
        out = out.transpose(0, 3, 1, 2)
        N, J, hh, hw = out.shape
        flat = out.reshape(N, J, -1)
        idx = flat.argmax(2)
        maxvals = flat.max(2)[..., None]
        px = (idx % hw).astype(np.float32)
        py = (idx // hw).astype(np.float32)
        w, h = self.input_wh
        kps = np.zeros((N, J, 2), np.float32)
        for i, (x1, y1, bw, bh) in enumerate(metas):
            kps[i, :, 0] = px[i] * (w / hw) * (bw / w) + x1
            kps[i, :, 1] = py[i] * (h / hh) * (bh / h) + y1
        return kps, maxvals
