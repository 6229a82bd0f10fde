"""Single-dispatch detect-then-pose serving graph.

The reference's video loop (inference_engine.py:360-384) round-trips the
host between the detector and the pose net: letterbox (cv2) → YOLO fwd →
NMS (host) → per-person warpAffine (cv2) → pose fwd → decode (host).
The two-stage engine here (engine/detector.py + engine/pose_engine.py)
keeps that structure; this module instead compiles the ENTIRE frame →
keypoints path into ONE jit graph:

  frame u8 → device letterbox → YOLOv5 → device top-k → device greedy
  NMS (plain IoU, person class) → box scale-back (+5 px pad,
  inference_engine.py:137-147) → batched affine crop → pose forward
  (flip folded) → UDP decode

so serving a frame costs one host→device transfer, one dispatch, and one
device→host readback regardless of person count.  Person count is fixed
at ``max_persons`` (masked rows, not dynamic shapes) — the TPU-native
substitute for the reference's variable-length Python loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .errors import EngineStateError


class FusedDetectPose:
    """End-to-end detect+pose engine with a per-frame-shape jit cache.

    ``pose_cfg``: config Node or yaml path for the pose model;
    ``pose_weights`` as in UdpPosePipeline (msgpack / .pth / dict / None).
    ``yolo_weights``: flax variables dict or None (random init).
    """

    def __init__(self, pose_cfg, pose_weights=None, yolo_variant: str = "n",
                 yolo_weights=None, max_persons: int = 16,
                 det_size: int = 640, conf_thres: float = 0.25,
                 iou_thres: float = 0.45, topk: int = 512,
                 person_class: int = 0, flip_test: Optional[bool] = None,
                 mesh=None, quantize: Optional[str] = None,
                 pose_act_scales=None, det_act_scales=None, padding: int = 5):
        import jax
        import jax.numpy as jnp

        from ..models.yolov5 import YOLOv5
        from .pose_engine import UdpPosePipeline

        # int8 PTQ serving (models/quantize.py).  Two tables:
        # ``pose_act_scales`` (dict or json path) runs the pose subgraph
        # int8 — the single-dispatch graph can't lazily self-calibrate
        # (its crops only exist in-graph), so the table comes precomputed
        # (a UdpPosePipeline/--act-scales run or tools/test.py
        # TPU.QUANTIZE int8); the --low-bw path host-crops its persons
        # and DOES self-calibrate when ``quantize='int8'`` with no table.
        # ``det_act_scales`` quantizes the YOLOv5 subgraph; with
        # ``quantize='int8'`` and no table the engine self-calibrates on
        # the letterboxed canvas (host-computable in every mode — the
        # host letterbox is 1-LSB-parity with the in-graph one).  Wins on
        # PCIe-class links where the ~15 ms/frame chip time matters; on
        # the dev tunnel the frame upload dominates either way (DESIGN.md).
        # Gating, uniform per subgraph (same precedence as UdpPosePipeline
        # and build_flax_yolo_detector): explicit quantize= wins —
        # including "" = off — else that subgraph's OWN table implies
        # int8 (a pose-only table must not silently quantize the
        # detector, and vice versa), else cfg.TPU.QUANTIZE applies to
        # BOTH subgraphs so a TPU.QUANTIZE yaml behaves the same here as
        # in the two-stage pipeline.
        self._pose = UdpPosePipeline(
            pose_cfg, pose_weights, flip_test=flip_test,
            quantize=quantize, act_scales=pose_act_scales)
        self.cfg = self._pose.cfg
        det_q = quantize
        if det_q is None:
            det_q = ("int8" if det_act_scales is not None
                     else (self.cfg.TPU.QUANTIZE or None))
        self._det_quantize = "int8" if det_q == "int8" else None
        self.num_joints = self._pose.num_joints
        self.skeleton = self._pose.skeleton
        self.max_persons = max_persons
        self.det_size = det_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.topk = topk
        self.person_class = person_class
        #: ±px box padding before the pose crop (inference_engine.py
        #: --padding, default 5; applied in-graph at scale-back)
        self.padding = padding
        #: optional jax.sharding.Mesh — video chunks shard frames over the
        #: 'data' axis in infer_frames (weights replicated)
        self.mesh = mesh

        self.yolo = YOLOv5(variant=yolo_variant)
        if yolo_weights is None:
            dummy = jnp.zeros((1, det_size, det_size, 3), jnp.float32)
            yolo_weights = jax.jit(
                lambda r: self.yolo.init(r, dummy, train=False))(
                    jax.random.PRNGKey(0))
        self.yolo_vars = yolo_weights
        from ..models.quantize import Calibrator, load_act_scales_maybe
        self._det_scales = load_act_scales_maybe(det_act_scales)
        self._det_calib = Calibrator(self.cfg.TPU.QUANTIZE_CALIB_BATCHES)
        self._det_collect = None        # jitted amax pass, per canvas shape
        self._runs = {}   # (H, W) -> jitted graph
        self._maybe_prepare_det()       # det table provided up-front

    # ----------------------------------------------------- detector int8

    def _active_yolo(self):
        """YOLOv5 module, wrapped int8 (models/quantize.py) once a
        detector calibration table exists — the detect-head convs stay fp
        via DEFAULT_SKIP ("detect*").  (Called at TRACE time from inside
        the fused graphs — must not mutate engine state; weight
        preparation happens in _maybe_prepare_det at freeze/init.)"""
        if self._det_quantize == "int8" and self._det_scales is not None:
            from ..models.quantize import QuantizedModel
            return QuantizedModel(self.yolo, self._det_scales)
        return self.yolo

    def _maybe_prepare_det(self):
        """Once a detector table exists, pre-quantize the YOLOv5 kernels
        (prepare_variables) so the serving graphs skip the per-forward
        requant pass.  Runs OUTSIDE any trace (freeze / __init__)."""
        if self._det_quantize == "int8" and self._det_scales is not None:
            from ..models.quantize import QuantizedModel
            self.yolo_vars = QuantizedModel(
                self.yolo, self._det_scales).prepare_variables(self.yolo_vars)

    @property
    def det_act_scales(self):
        """Detector calibration table (None until calibrated)."""
        return self._det_scales

    def save_det_act_scales(self, path):
        from ..models.quantize import save_act_scales
        if self._det_scales is None:
            raise EngineStateError("detector is not calibrated yet")
        save_act_scales(path, self._det_scales)

    def _det_calibrating(self) -> bool:
        return self._det_quantize == "int8" and self._det_scales is None

    def _calibrate_det(self, canvas_u8):
        """Record per-conv amax of one letterboxed canvas (served fp
        meanwhile); after ``TPU.QUANTIZE_CALIB_BATCHES`` canvases the
        table freezes and the fp-traced graphs are dropped so the next
        build traces the int8 detector.  The canvas is host-computable in
        every serving mode (``_letterbox_host`` is 1-LSB-parity with the
        in-graph letterbox), which is what makes the detector — unlike
        the single-dispatch pose subgraph — self-calibratable."""
        import jax
        from ..models.quantize import collect_conv_amax
        if self._det_collect is None:
            self._det_collect = jax.jit(
                lambda v, c: collect_conv_amax(
                    self.yolo, v, c.astype("float32")[None] / 255.0,
                    train=False))
        got = jax.device_get(self._det_collect(self.yolo_vars, canvas_u8))
        if self._det_calib.update(got):
            self._det_scales = self._det_calib.table()
            self._maybe_prepare_det()
            for k in [k for k in self._runs
                      if not (isinstance(k, tuple) and k
                              and k[0] == "pose_lowbw")]:
                del self._runs[k]

    def _require_pose_calibrated(self, mode: str):
        if (self._pose.quantize == "int8"
                and self._pose.act_scales is None):
            raise EngineStateError(
                f"int8 pose serving via {mode} needs a precomputed "
                "calibration table (pose_act_scales=...): the "
                "single-dispatch graph's crops only exist in-graph, so "
                "it cannot self-calibrate — produce the table with a "
                "UdpPosePipeline/--act-scales run, tools/test.py ... "
                "TPU.QUANTIZE int8, or serve --low-bw (which host-crops "
                "and self-calibrates)")

    # ------------------------------------------------------------ graph

    def _letterbox_geom(self, H: int, W: int):
        """Static letterbox geometry (boxes.py letterbox :19-35) shared by
        the on-device letterbox and the host (--low-bw) letterbox."""
        det = self.det_size
        r = min(det / H, det / W)
        nH, nW = round(H * r), round(W * r)
        pH = (det - nH) % 32 / 2
        pW = (det - nW) % 32 / 2
        top, left = round(pH - 0.1), round(pW - 0.1)
        bottom = round(pH + 0.1)
        right = round(pW + 0.1)
        gain = min((nH + top + bottom) / H, (nW + left + right) / W)
        # scale_boxes uses the letterboxed canvas size (boxes.py:38-50)
        pad_y = ((nH + top + bottom) - H * gain) / 2
        pad_x = ((nW + left + right) - W * gain) / 2
        return dict(nH=nH, nW=nW, top=top, bottom=bottom, left=left,
                    right=right, gain=gain, pad_x=pad_x, pad_y=pad_y)

    def _det_post(self, jnp, jax, pred, geom, H, W):
        """Detector postprocess on device: best-class person filter →
        top-k → greedy NMS → frame-coord scale-back (+5 px pad).
        Returns (out_boxes (M,4), scores (M,), valid (M,))."""
        from ..ops.nms import nms_jax

        M = self.max_persons
        obj = pred[:, 4]
        cls_conf = pred[:, 5:] * obj[:, None]
        best = jnp.argmax(cls_conf, axis=1)
        conf = jnp.max(cls_conf, axis=1)
        keep = ((obj > self.conf_thres) & (conf > self.conf_thres)
                & (best == self.person_class))
        scores = jnp.where(keep, conf, -jnp.inf)

        k = min(self.topk, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, k)
        xywh = pred[idx, :4]
        boxes = jnp.stack([xywh[:, 0] - xywh[:, 2] / 2,
                           xywh[:, 1] - xywh[:, 3] / 2,
                           xywh[:, 0] + xywh[:, 2] / 2,
                           xywh[:, 1] + xywh[:, 3] / 2], axis=1)

        keep_idx, _ = nms_jax(boxes, top_scores, self.iou_thres, M,
                              plus_one=False)
        valid = keep_idx >= 0
        sel = jnp.maximum(keep_idx, 0)
        b = boxes[sel]
        sc = jnp.where(valid, top_scores[sel], 0.0)
        valid = valid & (sc > 0.0)

        bx = (b[:, 0::2] - geom["pad_x"]) / geom["gain"]
        by = (b[:, 1::2] - geom["pad_y"]) / geom["gain"]
        bx = jnp.round(jnp.clip(bx, 0, W))
        by = jnp.round(jnp.clip(by, 0, H))
        pad = float(self.padding)
        x1 = jnp.maximum(0.0, bx[:, 0] - pad)
        y1 = jnp.maximum(0.0, by[:, 0] - pad)
        x2 = jnp.minimum(float(W), bx[:, 1] + pad)
        y2 = jnp.minimum(float(H), by[:, 1] + pad)
        out_boxes = jnp.stack([x1, y1, x2, y2], axis=1)
        return out_boxes, sc, valid

    def _build(self, H: int, W: int):
        import jax
        import jax.numpy as jnp

        from ..core.train import normalize_images
        from ..ops.affine import classic_affine_matrix, crop_boxes
        from ..ops.boxes import xyxy_to_cs
        from ..ops.decode import get_final_preds
        from ..ops.flip import flip_back, flip_back_offset

        cfg = self.cfg
        pw, ph = self._pose.input_wh
        target_type = cfg.MODEL.TARGET_TYPE
        pairs = tuple(map(tuple, self._pose.flip_pairs))
        flip = self._pose._flip
        M = self.max_persons

        geom = self._letterbox_geom(H, W)
        nH, nW = geom["nH"], geom["nW"]
        top, bottom = geom["top"], geom["bottom"]
        left, right = geom["left"], geom["right"]

        def run(pose_vars, yolo_vars, frame_u8):
            frame = frame_u8.astype(jnp.float32)
            # -- device letterbox (antialias=False == cv2 INTER_LINEAR's
            # plain bilinear sampling; the default antialiased downscale
            # diverges wildly from the reference preprocessing)
            img = jax.image.resize(frame, (nH, nW, 3), method="linear",
                                   antialias=False)
            img = jnp.pad(img, ((top, bottom), (left, right), (0, 0)),
                          constant_values=114.0)
            x_det = img[None] / 255.0
            pred = self._active_yolo().apply(yolo_vars, x_det,
                                             train=False)[0]
            # best-class person filter → top-k → NMS → frame coords
            # (boxes.py:78-92, :38-50) + ±5 px pad
            out_boxes, sc, valid = self._det_post(jnp, jax, pred, geom,
                                                  H, W)

            # -- pose: batched crop → forward → decode
            center, scale = xyxy_to_cs(out_boxes, (pw, ph))
            mats = jax.vmap(lambda c, s: classic_affine_matrix(
                c, s, 0.0, (pw, ph), inv=True))(center, scale)
            crops = crop_boxes(frame, mats, (ph, pw))
            from ..core.infer import cast_to_compute_dtype
            xc = cast_to_compute_dtype(self._pose._active_model(),
                                       normalize_images(crops))
            if flip:
                xc = jnp.concatenate([xc, xc[:, :, ::-1, :]], axis=0)
            out = self._pose._active_model().apply(pose_vars, xc,
                                                   train=False)
            hm = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            if flip:
                hm, hm_f = hm[:M], hm[M:]
                hm_f = (flip_back_offset(hm_f, pairs)
                        if target_type == "offset"
                        else flip_back(hm_f, pairs))
                hm = (hm + hm_f) * 0.5
            preds, maxvals, _ = get_final_preds(
                hm, center, scale, target_type=target_type,
                post_process=cfg.TEST.POST_PROCESS, kpd=cfg.LOSS.KPD)
            return preds, maxvals, out_boxes, sc, valid

        return jax.jit(run)

    # ------------------------------------------------- low-bandwidth mode

    def _build_det_lowbw(self, H: int, W: int):
        """Detection-only graph taking the HOST-letterboxed u8 canvas —
        the canvas is ~2-4x smaller than the raw frame, so this is the
        upload-bytes-minimising serving shape for slow links."""
        import jax
        import jax.numpy as jnp

        geom = self._letterbox_geom(H, W)

        def run_det(yolo_vars, canvas_u8):
            x_det = canvas_u8.astype(jnp.float32)[None] / 255.0
            pred = self._active_yolo().apply(yolo_vars, x_det,
                                             train=False)[0]
            return self._det_post(jnp, jax, pred, geom, H, W)

        return jax.jit(run_det)

    def _build_pose_lowbw(self, n_crops: int):
        """Pose graph over HOST-cropped u8 person patches (native OpenMP
        warp, udppose_native.cpp:64-74): upload n x ph x pw x 3 bytes
        instead of the whole frame.  Bucketed per crop count."""
        import jax
        import jax.numpy as jnp

        from ..core.train import normalize_images
        from ..ops.decode import get_final_preds
        from ..ops.flip import flip_back, flip_back_offset

        cfg = self.cfg
        target_type = cfg.MODEL.TARGET_TYPE
        pairs = tuple(map(tuple, self._pose.flip_pairs))
        flip = self._pose._flip

        def run_pose(pose_vars, crops_u8, center, scale):
            from ..core.infer import cast_to_compute_dtype
            xc = cast_to_compute_dtype(self._pose._active_model(),
                                       normalize_images(crops_u8))
            if flip:
                xc = jnp.concatenate([xc, xc[:, :, ::-1, :]], axis=0)
            out = self._pose._active_model().apply(pose_vars, xc,
                                                   train=False)
            hm = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            if flip:
                hm, hm_f = hm[:n_crops], hm[n_crops:]
                hm_f = (flip_back_offset(hm_f, pairs)
                        if target_type == "offset"
                        else flip_back(hm_f, pairs))
                hm = (hm + hm_f) * 0.5
            preds, maxvals, _ = get_final_preds(
                hm, center, scale, target_type=target_type,
                post_process=cfg.TEST.POST_PROCESS, kpd=cfg.LOSS.KPD)
            return preds, maxvals

        return jax.jit(run_pose)

    def _letterbox_host(self, frame):
        """Host letterbox with the same static geometry as the device
        path (cv2 INTER_LINEAR — the behaviour the device path was
        parity-matched to)."""
        H, W = frame.shape[:2]
        g = self._letterbox_geom(H, W)
        try:
            import cv2
            img = cv2.resize(frame, (g["nW"], g["nH"]),
                             interpolation=cv2.INTER_LINEAR)
        except ImportError:
            # native OpenMP kernel (numpy fallback inside): parity with
            # cv2 INTER_LINEAR within 1 u8 LSB (tested)
            from ..native import resize_bilinear
            img = resize_bilinear(frame, (g["nH"], g["nW"]))
        canvas = np.full((g["nH"] + g["top"] + g["bottom"],
                          g["nW"] + g["left"] + g["right"], 3), 114,
                         np.uint8)
        canvas[g["top"]:g["top"] + g["nH"],
               g["left"]:g["left"] + g["nW"]] = img
        return canvas

    @staticmethod
    def _classic_mats_np(center, scale, out_size_wh):
        """Numpy twin of ops.affine.classic_affine_matrix(..., inv=True)
        at rot=0 (host-side: avoids eager device round trips for a
        handful of 2x3 matrices)."""
        from ..ops.affine import classic_affine_mats_np
        return classic_affine_mats_np(center, scale, out_size_wh)

    def _lowbw_submit_det(self, frame):
        """Low-bw stage 1: host letterbox → async detection dispatch.
        Returns (det_handle, canvas_bytes)."""
        H, W = frame.shape[:2]
        canvas = self._letterbox_host(frame)
        if self._det_calibrating():
            # record amax on this canvas; the frame still serves through
            # the (fp-traced) graph below until the table freezes
            self._calibrate_det(canvas)
        det = self._runs.get(("det", H, W))
        if det is None:
            det = self._runs[("det", H, W)] = self._build_det_lowbw(H, W)
        return det(self.yolo_vars, canvas), canvas.nbytes

    def _lowbw_submit_pose(self, frame, det_handle, canvas_bytes):
        """Low-bw stage 2: fetch the detections, host-crop the persons
        with the native OpenMP warp, async pose dispatch.  Returns the
        finished dict (empty frame) or a pending tuple for
        ``_lowbw_fetch``."""
        import jax

        from ..native import warp_affine_batch
        from ..ops.boxes import xyxy_to_cs

        boxes, scores, valid = jax.device_get(det_handle)
        n = int(valid.astype(np.int32).sum())
        assert valid[:n].all(), "low-bw: valid rows are not a prefix"
        J = self.num_joints
        if n == 0:
            return {"keypoints": np.zeros((0, J, 2), np.float32),
                    "maxvals": np.zeros((0, J, 1), np.float32),
                    "boxes": np.zeros((0, 4), np.float32),
                    "scores": np.zeros((0,), np.float32),
                    "bytes_uploaded": canvas_bytes}

        pw, ph = self._pose.input_wh
        bucket = 1
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, self.max_persons)
        center, scale = xyxy_to_cs(boxes[:n, :4], (pw, ph))
        pad = bucket - n
        center_p = np.concatenate([center, np.tile(center[:1], (pad, 1))])
        scale_p = np.concatenate([scale, np.tile(scale[:1], (pad, 1))])
        mats = self._classic_mats_np(center_p, scale_p, (pw, ph))
        crops = warp_affine_batch(np.ascontiguousarray(frame), mats,
                                  (ph, pw))
        crops_u8 = np.clip(np.rint(crops), 0, 255).astype(np.uint8)

        if (self._pose.quantize == "int8"
                and self._pose.act_scales is None):
            # --low-bw self-calibration: these crops exist host-side, so
            # feed them to the pose engine's amax collector and serve this
            # frame bf16; once the table freezes, drop the fp-traced pose
            # graphs so the next bucket build traces the int8 model
            self._pose.calibrate_crops(crops_u8)
            if self._pose.act_scales is not None:
                # table froze: pre-quantize the kernels now (the graphs
                # are dropped anyway, so the treedef change is free) and
                # retrace around the int8 model
                self._pose._maybe_prepare()
                for k in [k for k in self._runs
                          if isinstance(k, tuple) and k
                          and k[0] == "pose_lowbw"]:
                    del self._runs[k]

        pose = self._runs.get(("pose_lowbw", bucket))
        if pose is None:
            pose = self._runs[("pose_lowbw", bucket)] = \
                self._build_pose_lowbw(bucket)
        handle = pose(self._pose.variables, crops_u8, center_p, scale_p)
        bytes_up = (canvas_bytes + crops_u8.nbytes + center_p.nbytes
                    + scale_p.nbytes)
        return (handle, n, boxes, scores, bytes_up)

    @staticmethod
    def _lowbw_fetch(pending):
        """Block on a ``_lowbw_submit_pose`` result → the result dict."""
        import jax
        if isinstance(pending, dict):          # empty frame, already done
            return pending
        handle, n, boxes, scores, bytes_up = pending
        preds, maxvals = jax.device_get(handle)
        return {"keypoints": np.asarray(preds)[:n],
                "maxvals": np.asarray(maxvals)[:n],
                "boxes": boxes[:n], "scores": scores[:n],
                "bytes_uploaded": bytes_up}

    def infer_frame_low_bw(self, frame):
        """Bytes-minimising two-dispatch serving mode (VERDICT r2 #5).

        Upload 1: the host-letterboxed canvas (u8, ~2-4x smaller than the
        frame) → device detection (same YOLO + top-k + NMS graph).
        Upload 2: the detected persons host-cropped with the native
        OpenMP warp (u8, bucketed count) → device pose + decode.

        Wins whenever host→device bandwidth is the bottleneck (measured
        ~18 MB/s on the axon tunnel); on PCIe-attached accelerators
        infer_frame's single dispatch is preferred.  Returns the same
        dict as infer_frame plus 'bytes_uploaded'."""
        handle, nb = self._lowbw_submit_det(frame)
        return self._lowbw_fetch(self._lowbw_submit_pose(frame, handle, nb))

    def infer_stream_low_bw(self, frames):
        """Two-stage software-pipelined --low-bw serving: while frame i's
        pose batch is in flight, frame i+1's canvas uploads and detects —
        so the detection readback (a host round-trip the single-dispatch
        mode doesn't have) hides behind the previous frame's pose stage.
        ``frames``: iterable of RGB uint8 frames; yields one
        ``infer_frame_low_bw``-style result dict per frame, in order
        (≤2 frames are in flight at once)."""
        from collections import deque
        det_q, pose_q = deque(), deque()
        for rgb in frames:
            det_q.append((rgb, self._lowbw_submit_det(rgb)))
            if len(det_q) >= 2:
                rgb0, (h, nb) = det_q.popleft()
                pose_q.append(self._lowbw_submit_pose(rgb0, h, nb))
            if len(pose_q) >= 2:
                yield self._lowbw_fetch(pose_q.popleft())
        for rgb0, (h, nb) in det_q:
            pose_q.append(self._lowbw_submit_pose(rgb0, h, nb))
        for p in pose_q:
            yield self._lowbw_fetch(p)

    # -------------------------------------------------------------- API

    def submit_frame(self, frame):
        """Dispatch the fused graph for one frame WITHOUT blocking on the
        result (JAX async dispatch): returns an opaque handle for
        ``fetch``.  The software-pipelined serving loop
        (tools/infer.py --pipeline) keeps N frames in flight so the host
        work of frame i+1 (video decode, BGR→RGB, upload staging)
        overlaps the device compute + readback of frame i — the overlap
        the reference's strictly sequential loop
        (inference_engine.py:360-384) cannot express."""
        self._require_pose_calibrated("submit_frame/infer_frame")
        if self._det_calibrating():
            self._calibrate_det(self._letterbox_host(frame))
        H, W = frame.shape[:2]
        run = self._runs.get((H, W))
        if run is None:
            run = self._runs[(H, W)] = self._build(H, W)
        return run(self._pose.variables, self.yolo_vars, frame)

    def fetch(self, handle):
        """Block on a ``submit_frame`` handle → the infer_frame dict."""
        import jax
        preds, maxvals, boxes, scores, valid = jax.device_get(handle)
        # greedy NMS fills keep slots in order, so valid rows are a prefix
        n = int(valid.astype(np.int32).sum())
        assert valid[:n].all(), \
            "FusedDetectPose: valid rows are not a prefix (NMS fill order)"
        return {"keypoints": preds[:n], "maxvals": maxvals[:n],
                "boxes": boxes[:n], "scores": scores[:n]}

    def infer_frame(self, frame):
        """frame (H, W, 3) RGB uint8 → dict with keypoints (n, J, 2),
        maxvals (n, J, 1), boxes (n, 4), scores (n,) — n = detected
        persons (≤ max_persons).  One dispatch, one readback."""
        return self.fetch(self.submit_frame(frame))

    def infer_frames(self, frames):
        """Batched video mode: frames (F, H, W, 3) RGB uint8 → list of F
        per-frame dicts.  The whole chunk runs as ONE dispatch (the
        single-frame graph vmapped over F), amortising per-dispatch cost
        over the chunk — the offline-video throughput shape the
        reference's frame-by-frame loop can't express.  One jit cache
        entry per (F, H, W)."""
        import jax
        frames = np.asarray(frames)
        n_frames = frames.shape[0]
        if n_frames == 0:
            return []
        self._require_pose_calibrated("infer_frames")
        while self._det_calibrating():
            # offline-video warmup: calibrate the detector on the chunk's
            # leading frames (cycling if the chunk is shorter than the
            # calibration budget), then dispatch the whole chunk int8
            self._calibrate_det(self._letterbox_host(
                frames[self._det_calib.seen % n_frames]))
        if self.mesh is not None:
            # pad the chunk to a data-axis-divisible frame count
            n_data = self.mesh.shape["data"]
            pad = (-n_frames) % n_data
            if pad:
                frames = np.concatenate(
                    [frames, np.repeat(frames[-1:], pad, axis=0)])
        F, H, W = frames.shape[:3]
        key = ("batch", F, H, W)
        run = self._runs.get(key)
        if run is None:
            inner = self._runs.get((H, W)) or self._build(H, W)
            self._runs[(H, W)] = inner
            vm = jax.vmap(inner, in_axes=(None, None, 0))
            if self.mesh is not None:
                from ..parallel import batch_sharding, replicated
                bs = batch_sharding(self.mesh)
                rep = replicated(self.mesh)
                run = jax.jit(vm, in_shardings=(rep, rep, bs),
                              out_shardings=rep)
            else:
                run = jax.jit(vm)
            self._runs[key] = run
        preds, maxvals, boxes, scores, valid = jax.device_get(
            run(self._pose.variables, self.yolo_vars, frames))
        out = []
        for f in range(n_frames):
            n = int(valid[f].astype(np.int32).sum())
            assert valid[f, :n].all(), \
                "FusedDetectPose: valid rows are not a prefix (frame %d)" % f
            out.append({"keypoints": preds[f, :n], "maxvals": maxvals[f, :n],
                        "boxes": boxes[f, :n], "scores": scores[f, :n]})
        return out

    def draw_keypoints(self, image, keypoints, radius=1):
        from .io import draw_keypoints
        draw_keypoints(image, keypoints, self.skeleton, radius)
        return image
