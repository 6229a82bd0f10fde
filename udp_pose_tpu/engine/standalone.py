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


def onnx_model_fn(model_or_path) -> Callable:
    """Backend over an exported ``.onnx`` artifact — the counterpart of the
    reference's onnxruntime engine (tools/infer_standalone.py:110-127),
    executed by the in-repo opset-11 evaluator.

    Accepts a path or serialized bytes.  Takes/returns NHWC; the graph
    computes NCHW.  Inputs are chunked/padded to the graph's fixed batch,
    so any person count works.
    """
    from ..export.onnx_eval import run_model
    from ..export.onnx_pb import load_model

    if isinstance(model_or_path, str):
        with open(model_or_path, "rb") as f:
            model_or_path = f.read()
    model = load_model(model_or_path)
    in_name, in_shape = model.graph.inputs[0]
    out_name = model.graph.outputs[0][0]
    gb = int(in_shape[0])

    def fn(x_nhwc):
        x = np.transpose(np.asarray(x_nhwc, np.float32), (0, 3, 1, 2))
        outs = []
        for i in range(0, x.shape[0], gb):
            chunk = x[i:i + gb]
            n = chunk.shape[0]
            if n < gb:
                chunk = np.concatenate(
                    [chunk, np.zeros((gb - n, *chunk.shape[1:]),
                                     np.float32)])
            y = run_model(model, {in_name: chunk})[out_name][:n]
            outs.append(y)
        return np.transpose(np.concatenate(outs), (0, 2, 3, 1))

    return fn


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
