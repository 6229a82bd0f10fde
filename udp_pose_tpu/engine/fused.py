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
                 mesh=None):
        import jax
        import jax.numpy as jnp

        from ..models.yolov5 import YOLOv5
        from .pose_engine import UdpPosePipeline

        # reuse the pose pipeline's model build + weight loading
        self._pose = UdpPosePipeline(pose_cfg, pose_weights,
                                     flip_test=flip_test)
        self.cfg = self._pose.cfg
        self.num_joints = self._pose.num_joints
        self.skeleton = self._pose.skeleton
        self.max_persons = max_persons
        self.det_size = det_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.topk = topk
        self.person_class = person_class
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
        self._runs = {}   # (H, W) -> jitted graph

    # ------------------------------------------------------------ graph

    def _build(self, H: int, W: int):
        import jax
        import jax.numpy as jnp

        from ..core.train import normalize_images
        from ..ops.affine import classic_affine_matrix, crop_boxes
        from ..ops.boxes import xyxy_to_cs
        from ..ops.decode import get_final_preds
        from ..ops.flip import flip_back, flip_back_offset
        from ..ops.nms import nms_jax

        cfg = self.cfg
        pw, ph = self._pose.input_wh
        target_type = cfg.MODEL.TARGET_TYPE
        pairs = tuple(map(tuple, self._pose.flip_pairs))
        flip = self._pose._flip
        det = self.det_size
        M = self.max_persons

        # static letterbox geometry (boxes.py letterbox :19-35)
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
            pred = self.yolo.apply(yolo_vars, x_det, train=False)[0]

            # -- best-class scores, person filter (boxes.py:78-92)
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

            # -- back to frame coords (boxes.py:38-50) + ±5 px pad
            bx = (b[:, 0::2] - pad_x) / gain
            by = (b[:, 1::2] - pad_y) / gain
            bx = jnp.round(jnp.clip(bx, 0, W))
            by = jnp.round(jnp.clip(by, 0, H))
            x1 = jnp.maximum(0.0, bx[:, 0] - 5)
            y1 = jnp.maximum(0.0, by[:, 0] - 5)
            x2 = jnp.minimum(float(W), bx[:, 1] + 5)
            y2 = jnp.minimum(float(H), by[:, 1] + 5)
            out_boxes = jnp.stack([x1, y1, x2, y2], axis=1)

            # -- pose: batched crop → forward → decode
            center, scale = xyxy_to_cs(out_boxes, (pw, ph))
            mats = jax.vmap(lambda c, s: classic_affine_matrix(
                c, s, 0.0, (pw, ph), inv=True))(center, scale)
            crops = crop_boxes(frame, mats, (ph, pw))
            xc = normalize_images(crops)
            if flip:
                xc = jnp.concatenate([xc, xc[:, :, ::-1, :]], axis=0)
            out = self._pose.model.apply(pose_vars, xc, train=False)
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

    # -------------------------------------------------------------- API

    def infer_frame(self, frame):
        """frame (H, W, 3) RGB uint8 → dict with keypoints (n, J, 2),
        maxvals (n, J, 1), boxes (n, 4), scores (n,) — n = detected
        persons (≤ max_persons).  One dispatch, one readback."""
        import jax
        H, W = frame.shape[:2]
        run = self._runs.get((H, W))
        if run is None:
            run = self._runs[(H, W)] = self._build(H, W)
        preds, maxvals, boxes, scores, valid = jax.device_get(
            run(self._pose.variables, self.yolo_vars, frame))
        # greedy NMS fills keep slots in order, so valid rows are a prefix
        n = int(valid.astype(np.int32).sum())
        assert valid[:n].all(), \
            "FusedDetectPose: valid rows are not a prefix (NMS fill order)"
        return {"keypoints": preds[:n], "maxvals": maxvals[:n],
                "boxes": boxes[:n], "scores": scores[:n]}

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
