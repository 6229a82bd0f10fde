"""End-to-end detect-then-pose inference CLI (parity: inference_engine.py).

Sources: --source image.jpg | dir/ | video.mp4 | webcam N
Detector: --bbox-dir (YOLO label files, the pose-labeling mode) or
full-frame fallback (one box covering the image) when no detector weights
are wired.  Pose: --pose-cfg experiment yaml, --pose-weights msgpack/.pth.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="detect-then-pose inference")
    p.add_argument("--source", required=True,
                   help="image / dir / video path, or 'webcam:<id>'")
    p.add_argument("--pose-cfg", required=True)
    p.add_argument("--pose-weights", default="")
    p.add_argument("--bbox-dir", default="",
                   help="YOLO label dir (pose-labeling mode)")
    p.add_argument("--detector", default="",
                   help="native detector, e.g. 'yolov5n' or 'yolov5s'")
    p.add_argument("--detector-weights", default="")
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300,
                   help="NMS detection cap (inference_engine.py --max-det)")
    p.add_argument("--det-size", type=int, default=640,
                   help="detector letterbox size (inference_engine.py "
                        "--imgsz)")
    p.add_argument("--padding", type=int, default=5,
                   help="±px person-box padding before the pose crop "
                        "(inference_engine.py --padding)")
    p.add_argument("--classes", type=int, nargs="+", default=None,
                   help="keep only these detector class ids before NMS "
                        "(inference_engine.py --classes; two-stage path)")
    p.add_argument("--agnostic-nms", action="store_true",
                   help="class-agnostic NMS (inference_engine.py "
                        "--agnostic-nms; two-stage path)")
    p.add_argument("--save-dir", default="infer_out")
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--show-fps", action="store_true")
    p.add_argument("--person-class", type=int, default=0)
    p.add_argument("--fused", action="store_true",
                   help="compile detect+pose into ONE device dispatch per "
                        "frame (engine/fused.py; needs --detector)")
    p.add_argument("--max-persons", type=int, default=16)
    p.add_argument("--low-bw", action="store_true",
                   help="with --fused: bytes-minimising serving mode — "
                        "host letterbox upload + native host crops "
                        "(wins on slow host→device links)")
    p.add_argument("--chunk", type=int, default=1,
                   help="with --fused on video files: frames per dispatch "
                        "(batched offline-video mode; amortises host "
                        "round-trips over the chunk)")
    p.add_argument("--pipeline", type=int, default=1,
                   help="with --fused on video/webcam: frames kept in "
                        "flight (async dispatch depth) — host decode and "
                        "upload staging of frame i+1 overlap device "
                        "compute/readback of frame i")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="PTQ serving mode for the pose net (equivalent to "
                        "TPU.QUANTIZE int8): first frames serve bf16 while "
                        "calibrating, then convs run w8a8 on the MXU int8 "
                        "path")
    p.add_argument("--act-scales", default="",
                   help="pose-net calibration table (json): load if it "
                        "exists, else write it there after "
                        "self-calibration")
    p.add_argument("--det-act-scales", default="",
                   help="detector calibration table (json), same "
                        "load-or-write semantics; with --quantize int8 "
                        "and no table the detector self-calibrates on "
                        "its first letterboxed frames")
    p.add_argument("--save-pose-txt", action="store_true",
                   help="directory mode: write reference-format pose label "
                        "files (x/img_w y/img_h conf per joint, first "
                        "person, 13 joints — inference_engine.py:314-332)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def _flush_chunk(frames_bgr, fused, pose, writer, args, fps, keep=None):
    """Run one batched fused dispatch over a chunk of BGR frames and write
    the annotated results (keep: trim a padded tail chunk)."""
    import cv2
    import numpy as np
    rgb = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
                    for f in frames_bgr])
    fps.start()
    results = fused.infer_frames(rgb)
    fps.stop(sync_value=results[0]["keypoints"], debug=args.show_fps,
             count=len(frames_bgr) if keep is None else keep)
    for frame, res in list(zip(frames_bgr, results))[:keep]:
        out = pose.draw_keypoints(frame, res["keypoints"])
        if args.show_fps and fps.fps:
            cv2.putText(out, f"Pose FPS: {fps.fps}", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
        if not args.no_save:
            writer.update(out)


def main():
    args = parse_args()
    from udp_pose_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()
    import cv2
    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.engine.detector import LabelBoxDetector
    from udp_pose_tpu.engine.io import FPS, VideoReader, VideoWriter
    from udp_pose_tpu.engine.pose_engine import UdpPosePipeline

    cfg = load_config(args.pose_cfg, args.opts)
    from udp_pose_tpu.utils.platform import maybe_enable_compilation_cache
    maybe_enable_compilation_cache(cfg.TPU.COMPILATION_CACHE)
    if args.fused and not args.detector:
        raise SystemExit("--fused needs --detector")
    if args.low_bw and not args.fused:
        raise SystemExit("--low-bw needs --fused")
    if args.low_bw and args.chunk > 1:
        raise SystemExit("--low-bw and --chunk are mutually exclusive "
                         "(the chunked path uploads whole frames; pick "
                         "one serving shape for your link)")
    if args.pipeline > 1 and not args.fused:
        raise SystemExit("--pipeline needs --fused")
    if args.fused and (args.classes is not None or args.agnostic_nms):
        raise SystemExit("--classes/--agnostic-nms apply to the two-stage "
                         "path only (the fused graph's in-device NMS is "
                         "person-class, class-aware by construction)")
    if (args.classes is not None or args.agnostic_nms) \
            and not args.detector:
        raise SystemExit("--classes/--agnostic-nms need --detector (they "
                         "configure the detector's NMS)")
    if args.det_size != 640 and not args.detector:
        raise SystemExit("--det-size needs --detector")
    if args.pipeline > 1 and args.chunk > 1:
        raise SystemExit("--pipeline and --chunk are mutually exclusive "
                         "(the chunked path is already batched)")
    if args.pipeline > 1 and args.low_bw and args.pipeline != 2:
        print("note: --low-bw pipelining is the fixed 2-stage stream "
              "(detection of frame i+1 behind pose of frame i); "
              f"--pipeline {args.pipeline} runs at depth 2", file=sys.stderr)
    quantize = args.quantize or (cfg.TPU.QUANTIZE or "")
    if quantize and args.fused and not args.low_bw and not (
            args.act_scales and os.path.exists(args.act_scales)):
        raise SystemExit(
            "--quantize with --fused needs a precomputed calibration "
            "table (--act-scales pointing at an existing json): the "
            "fused graph's crops only exist in-graph, so it cannot "
            "self-calibrate — produce the table with a two-stage run "
            "(--quantize int8 --act-scales f.json, no --fused), "
            "tools/test.py ... TPU.QUANTIZE int8, or serve --low-bw "
            "(which host-crops and self-calibrates)")
    det_scales = (args.det_act_scales
                  if args.det_act_scales
                  and os.path.exists(args.det_act_scales) else None)
    fused = None
    if args.fused:
        from udp_pose_tpu.engine.fused import FusedDetectPose
        from udp_pose_tpu.utils.checkpoint import load_weights
        w = load_weights(args.detector_weights) \
            if args.detector_weights else None
        pose_scales = (args.act_scales
                       if args.act_scales
                       and os.path.exists(args.act_scales) else None)
        fused = FusedDetectPose(
            cfg, args.pose_weights or None,
            yolo_variant=args.detector.replace("yolov5", ""),
            yolo_weights=w, max_persons=args.max_persons,
            det_size=args.det_size,
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            person_class=args.person_class, padding=args.padding,
            quantize=quantize or None,
            pose_act_scales=pose_scales, det_act_scales=det_scales)
        pose = fused._pose
    else:
        scales = (args.act_scales
                  if args.act_scales and os.path.exists(args.act_scales)
                  else None)
        pose = UdpPosePipeline(cfg, args.pose_weights or None,
                               quantize=quantize or None, act_scales=scales)
    label_det = (LabelBoxDetector(args.bbox_dir, args.person_class)
                 if args.bbox_dir else None)
    yolo_det = None
    if args.detector and not args.fused:
        from udp_pose_tpu.engine.detector import build_flax_yolo_detector
        from udp_pose_tpu.utils.checkpoint import load_weights
        variant = args.detector.replace("yolov5", "")
        w = load_weights(args.detector_weights) \
            if args.detector_weights else None
        yolo_det = build_flax_yolo_detector(
            variant=variant, weights=w, input_size=args.det_size,
            conf_thres=args.conf_thres,
            iou_thres=args.iou_thres, person_class=args.person_class,
            max_det=args.max_det, quantize=quantize or None,
            act_scales=det_scales,
            calib_batches=cfg.TPU.QUANTIZE_CALIB_BATCHES,
            classes=args.classes, agnostic_nms=args.agnostic_nms,
            padding=args.padding)

    def boxes_for(frame, path=None):
        if label_det is not None and path is not None:
            return label_det.infer_for(frame, path)
        if yolo_det is not None:
            return yolo_det.infer(frame)
        h, w = frame.shape[:2]
        return np.array([[0, 0, w - 1, h - 1]], np.float32)

    os.makedirs(args.save_dir, exist_ok=True)
    fps = FPS()

    def write_pose_txt(path, kps, maxvals, img_hw, n_joints=13):
        """Reference label format: per-line ``x/w y/h conf`` for the first
        person's first 13 joints (inference_engine.py:314-332)."""
        h, w = img_hw
        txt = os.path.join(
            args.save_dir,
            os.path.splitext(os.path.basename(path))[0] + ".txt")
        with open(txt, "w") as f:
            for k, mv in zip(kps[0][:n_joints], maxvals[0][:n_joints]):
                f.write("%f %f %f\n" % (k[0] / w, k[1] / h, float(mv[0])))

    def overlay_fps(img):
        """pose-FPS text on frames (inference_engine.py:372-386)."""
        if args.show_fps and fps.fps:
            cv2.putText(img, f"Pose FPS: {fps.fps}", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
        return img

    def process(frame, path=None):
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if fused is not None and not (label_det and path):
            fps.start()
            out = (fused.infer_frame_low_bw(rgb) if args.low_bw
                   else fused.infer_frame(rgb))
            fps.stop(sync_value=out["keypoints"], debug=args.show_fps)
            if args.save_pose_txt and path and len(out["keypoints"]):
                write_pose_txt(path, out["keypoints"], out["maxvals"],
                               frame.shape[:2])
            return overlay_fps(pose.draw_keypoints(frame, out["keypoints"]))
        boxes = boxes_for(rgb, path)
        if boxes is None:
            return frame
        fps.start()
        kps, maxvals = pose.infer_pose(rgb, boxes)
        fps.stop(sync_value=kps, debug=args.show_fps)
        if args.save_pose_txt and path and len(kps):
            write_pose_txt(path, kps, maxvals, frame.shape[:2])
        return overlay_fps(pose.draw_keypoints(frame, kps))

    def pipelined(frames_bgr, emit):
        """Software-pipelined fused serving: keep ``args.pipeline`` frames
        in flight so host decode/upload staging of frame i+1 overlaps the
        device compute + readback of frame i (submit_frame/fetch,
        engine/fused.py; with --low-bw, the 2-stage
        ``infer_stream_low_bw`` — detection of i+1 hides behind pose of
        i).  ``emit(annotated_bgr) -> bool`` (False stops — webcam 'q')."""
        from collections import deque

        if args.low_bw:
            buf = deque()          # BGR originals of in-flight frames

            def rgb_frames():
                for frame in frames_bgr:
                    buf.append(frame)
                    yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

            fps.start()
            for out in fused.infer_stream_low_bw(rgb_frames()):
                fps.stop(sync_value=out["keypoints"], debug=args.show_fps)
                fps.start()
                if emit(overlay_fps(pose.draw_keypoints(
                        buf.popleft(), out["keypoints"]))) is False:
                    return
            return

        inflight = deque()
        fps.start()

        def drain_one():
            # pipelined --show-fps is fetch-to-fetch THROUGHPUT: the
            # interval includes draw/write/decode of the previous frame
            # (they overlap device work — that's the point), unlike the
            # sequential process() timer which brackets inference only
            bgr, handle = inflight.popleft()
            out = fused.fetch(handle)
            fps.stop(sync_value=out["keypoints"], debug=args.show_fps)
            fps.start()
            return emit(overlay_fps(
                pose.draw_keypoints(bgr, out["keypoints"])))

        for frame in frames_bgr:
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            inflight.append((frame, fused.submit_frame(rgb)))
            if len(inflight) >= args.pipeline and drain_one() is False:
                return
        while inflight:
            if drain_one() is False:
                return

    src = args.source
    if src.startswith("webcam"):
        from udp_pose_tpu.engine.io import WebcamStream
        cam_id = int(src.split(":")[1]) if ":" in src else 0
        if fused is not None and args.pipeline > 1:
            def show(out):
                cv2.imshow("pose", out)
                return cv2.waitKey(1) != ord("q")
            pipelined(WebcamStream(cam_id), show)
        else:
            for frame in WebcamStream(cam_id):
                out = process(frame)
                cv2.imshow("pose", out)
                if cv2.waitKey(1) == ord("q"):
                    break
    elif os.path.isdir(src):
        if args.pipeline > 1:
            raise SystemExit("--pipeline applies to video/webcam sources "
                             "(directory and single-image modes run "
                             "frame-at-a-time)")
        for path in sorted(glob.glob(os.path.join(src, "*"))):
            frame = cv2.imread(path)
            if frame is None:
                continue
            out = process(frame, path)
            if not args.no_save:
                cv2.imwrite(os.path.join(args.save_dir,
                                         os.path.basename(path)), out)
    elif os.path.splitext(src)[1].lower() in (".mp4", ".avi", ".mov",
                                              ".mkv") or \
            src.startswith(("rtsp://", "rtmp://", "http://", "https://")):
        # network streams (rtsp/rtmp/http) ride the same cv2-backed
        # reader; all video serving modes (--fused/--pipeline/--low-bw/
        # --chunk) apply unchanged
        reader = VideoReader(src)
        name = os.path.basename(src).split("?")[0] or "stream.mp4"
        writer = VideoWriter(os.path.join(args.save_dir, "out_" + name),
                             reader.fps or 30.0)
        if fused is not None and args.chunk > 1:
            # batched offline-video mode: pad the tail chunk so one jit
            # cache entry serves the whole file
            pending = []
            for frame in reader:
                pending.append(frame)
                if len(pending) == args.chunk:
                    _flush_chunk(pending, fused, pose, writer, args, fps)
                    pending = []
            if pending:
                pad = [pending[-1]] * (args.chunk - len(pending))
                _flush_chunk(pending + pad, fused, pose, writer, args, fps,
                             keep=len(pending))
        elif fused is not None and args.pipeline > 1:
            def emit(out):
                if not args.no_save:
                    writer.update(out)
                return True
            pipelined(reader, emit)
        else:
            for frame in reader:
                out = process(frame)
                if not args.no_save:
                    writer.update(out)
        writer.write()
    else:
        if args.pipeline > 1:
            raise SystemExit("--pipeline applies to video/webcam sources "
                             "(directory and single-image modes run "
                             "frame-at-a-time)")
        frame = cv2.imread(src)
        if frame is None:
            raise SystemExit(f"cannot read {src}")
        out = process(frame, src)
        if not args.no_save:
            out_path = os.path.join(args.save_dir, os.path.basename(src))
            cv2.imwrite(out_path, out)
            print(f"saved {out_path}")

    if (args.act_scales and getattr(pose, "act_scales", None)
            and not os.path.exists(args.act_scales)):
        pose.save_act_scales(args.act_scales)
        print(f"saved int8 calibration table to {args.act_scales}")
    if args.det_act_scales and not os.path.exists(args.det_act_scales):
        got = (fused.det_act_scales if fused is not None else
               yolo_det.get_act_scales() if yolo_det is not None else None)
        if got:
            from udp_pose_tpu.models.quantize import save_act_scales
            save_act_scales(args.det_act_scales, got)
            print("saved detector int8 calibration table to "
                  f"{args.det_act_scales}")


if __name__ == "__main__":
    main()
