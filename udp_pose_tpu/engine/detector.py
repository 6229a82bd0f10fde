"""Person detectors for the detect-then-pose pipeline.

Parity: inference_engine.py YoloDetectionAbs/Torch (:122-226).  The
backbone is pluggable (the reference pulls weights from the yolov5
submodule, which is not vendored there either — .gitmodules:1-3); what the
framework owns is the letterbox preprocess, the NMS post, the person-class
filter, and the ±5 px padding — all native here (ops/yolo.py).

Backends:
* ``YoloDetector(model_fn)`` — any callable ``(1,H,W,3)[0..1] → (1,N,5+nc)``
  raw YOLO head output (e.g. a Flax model or imported weights).
* ``LabelBoxDetector`` — reads YOLO-format label files (the reference's
  ``--bbox-dir`` pose-labeling mode, inference_engine.py:271-340).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from ..ops.yolo import (letterbox, non_max_suppression, padding_bbox,
                        scale_boxes, yolo2xyxy)


class YoloDetector:
    def __init__(self, model_fn: Callable, input_size=640, conf_thres=0.25,
                 iou_thres=0.45, classes: Optional[Sequence[int]] = None,
                 person_class=0, max_det=300, agnostic_nms=False, padding=5):
        self.model_fn = model_fn
        self.input_size = input_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.classes = classes
        self.person_class = person_class
        self.max_det = max_det
        self.agnostic_nms = agnostic_nms
        self.padding = padding

    def infer(self, image) -> Optional[np.ndarray]:
        """image (H, W, 3) uint8 → (N, 4) person xyxy boxes or None."""
        img = letterbox(image, self.input_size)
        x = img[None].astype(np.float32) / 255.0
        pred = np.asarray(self.model_fn(x))
        det = non_max_suppression(pred, self.conf_thres, self.iou_thres,
                                  classes=self.classes,
                                  agnostic=self.agnostic_nms,
                                  max_det=self.max_det)[0]
        if not len(det):
            return None
        boxes = scale_boxes(det[:, :4], image.shape[:2], img.shape[:2])
        persons = []
        for box, cls in zip(boxes, det[:, 5].astype(int)):
            if cls != self.person_class:
                continue
            x1, y1, x2, y2 = (int(v) for v in box)
            persons.append(padding_bbox(x1, y1, x2, y2, image.shape,
                                        self.padding))
        return np.asarray(persons, np.float32) if persons else None


def build_flax_yolo_detector(variant="n", weights=None, input_size=640,
                             conf_thres=0.25, iou_thres=0.45,
                             person_class=0, max_det=300,
                             device_topk=1024, quantize=None,
                             act_scales=None, calib_batches=2,
                             classes=None, agnostic_nms=False, padding=5):
    """Native YOLOv5 (models/yolov5.py) wrapped as a YoloDetector.

    With ``weights=None`` the net is random-initialised (graph-complete;
    detections are noise until converted weights are loaded).

    ``device_topk``: the raw head output is ~25k×85 floats (8.5 MB/frame)
    — the top-k by objectness is selected ON DEVICE so only k candidates
    cross to the host for NMS.  Identical results whenever ≤k candidates
    clear ``conf_thres`` (yolov5n on real scenes yields a few hundred);
    0 disables the selection.

    ``quantize='int8'``: int8 PTQ serving (models/quantize.py) for the
    detector convs (the detect heads stay fp).  ``act_scales`` (dict or
    json path) is the calibration table; without one the first
    ``calib_batches`` frames serve fp while recording per-site amax, then
    the int8 graph takes over — read the frozen table back via
    ``det.get_act_scales()`` / persist it with ``det.save_act_scales``.
    """
    import jax
    import jax.numpy as jnp
    from ..models.quantize import (Calibrator, QuantizedModel,
                                   collect_conv_amax, load_act_scales_maybe)

    from ..models.yolov5 import YOLOv5

    model = YOLOv5(variant=variant)
    if weights is None:
        dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        weights = jax.jit(lambda r: model.init(r, dummy, train=False))(
            jax.random.PRNGKey(0))

    act_scales = load_act_scales_maybe(act_scales)
    if quantize is None and act_scales is not None:
        # a provided table IS the int8 request — same gating as
        # FusedDetectPose(det_act_scales=...), so the two engines never
        # serve different numeric paths from the same inputs
        quantize = "int8"
    state = {"scales": act_scales, "calib": Calibrator(calib_batches),
             "fn_q": None, "collect": None}

    def make_fn(m, w=weights):
        @jax.jit
        def fn(x):
            pred = m.apply(w, x, train=False)
            if device_topk:        # single-frame path (B=1)
                k = min(device_topk, pred.shape[1])
                _, idx = jax.lax.top_k(pred[0, :, 4], k)
                pred = pred[0][idx][None]
            return pred
        return fn

    fn_fp = make_fn(model)

    def model_fn(x):
        if quantize != "int8":
            return fn_fp(x)
        if state["scales"] is None:
            # calibration phase: record amax, serve this frame fp
            if state["collect"] is None:
                state["collect"] = jax.jit(
                    lambda v, xx: collect_conv_amax(model, v, xx,
                                                    train=False))
            got = jax.device_get(state["collect"](weights, x))
            if state["calib"].update(got):
                state["scales"] = state["calib"].table()
            return fn_fp(x)
        if state["fn_q"] is None:
            qm = QuantizedModel(model, state["scales"])
            # pre-quantize the kernels once — the serving graph then
            # consumes int8 weights instead of requantizing per frame
            state["fn_q"] = make_fn(qm, qm.prepare_variables(weights))
        return state["fn_q"](x)

    det = YoloDetector(model_fn, input_size, conf_thres, iou_thres,
                       classes=classes, person_class=person_class,
                       max_det=max_det, agnostic_nms=agnostic_nms,
                       padding=padding)
    det.get_act_scales = lambda: state["scales"]

    def _save(path):
        from ..models.quantize import save_act_scales
        if state["scales"] is None:
            raise RuntimeError("detector is not calibrated yet")
        save_act_scales(path, state["scales"])
    det.save_act_scales = _save
    return det


class LabelBoxDetector:
    """Boxes from YOLO-format .txt label files next to the images."""

    def __init__(self, bbox_dir, person_class=0):
        self.bbox_dir = bbox_dir
        self.person_class = person_class

    def infer_for(self, image, image_path) -> Optional[np.ndarray]:
        stem = os.path.splitext(os.path.basename(image_path))[0]
        label_file = os.path.join(self.bbox_dir, stem + ".txt")
        if not os.path.exists(label_file):
            return None
        boxes = []
        with open(label_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if int(float(parts[0])) != self.person_class:
                    continue
                boxes.append(yolo2xyxy(image.shape[:2],
                                       tuple(map(float, parts[1:5]))))
        return np.asarray(boxes, np.float32) if boxes else None
