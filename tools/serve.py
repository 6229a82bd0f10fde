"""Pose-serving daemon CLI: HTTP endpoints over the TPU engines.

Beyond-reference serving surface (the reference's deployment story stops
at the ``inference_engine.py`` video loop): a long-lived process exposing
``/v1/pose`` (client supplies boxes; crops micro-batched ACROSS requests
into one device dispatch), ``/v1/detect_pose`` (fused detect+pose graph),
``/healthz`` and ``/metrics``.  See udp_pose_tpu/engine/server.py.

    python tools/serve.py --cfg configs/coco/hrnet_w32_256x192_udp_offset.yaml \
        --weights model.msgpack --detector yolov5n --port 8080
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True, help="pose model yaml")
    p.add_argument("--weights", default="",
                   help="msgpack / .pth / .onnx pose weights "
                        "(default: random init, smoke mode)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080,
                   help="0 picks a free port (printed on startup)")
    p.add_argument("--flip", dest="flip", action="store_true",
                   default=None, help="force flip-test on (default: cfg)")
    p.add_argument("--no-flip", dest="flip", action="store_false",
                   help="force flip-test off (serving protocol)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="max crops per device dispatch")
    p.add_argument("--pad-on-device", action="store_true",
                   help="upload only real crop rows and zero-pad to the "
                        "bucket on device — saves host->device bytes on "
                        "bandwidth-starved links at the cost of one extra "
                        "pipelined dispatch per batch (DESIGN.md probe)")
    p.add_argument("--window-ms", type=float, default=3.0,
                   help="micro-batch collection window after the first "
                        "request")
    p.add_argument("--detector", default="",
                   help="enable /v1/detect_pose with this yolov5 variant "
                        "(n/s/m/l or yolov5n/...)")
    p.add_argument("--detector-weights", default="")
    p.add_argument("--max-persons", type=int, default=16)
    p.add_argument("--max-frames", type=int, default=8,
                   help="cross-request FRAME batching cap for "
                        "/v1/detect_pose: same-resolution frames from "
                        "concurrent clients coalesce into one vmapped "
                        "fused dispatch (1 disables)")
    p.add_argument("--quantize", default=None, choices=[None, "", "int8"],
                   help="int8 = w8a8 PTQ serving (self-calibrates on the "
                        "first batches); '' forces off")
    p.add_argument("--act-scales", default="",
                   help="precomputed int8 calibration table (json)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from udp_pose_tpu.utils.platform import (
        maybe_enable_compilation_cache, maybe_force_platform)
    maybe_force_platform()
    # daemon restarts skip the 1-7 min cold compile when the yaml sets
    # TPU.COMPILATION_CACHE (or $UDP_POSE_COMPILATION_CACHE is exported)
    from udp_pose_tpu.config import load_config
    cfg = load_config(args.cfg)
    maybe_enable_compilation_cache(cfg.TPU.COMPILATION_CACHE)

    from udp_pose_tpu.engine.server import PoseServer, PoseService

    det_weights = None
    if args.detector_weights:
        from udp_pose_tpu.utils.checkpoint import load_weights
        det_weights = load_weights(args.detector_weights)
    service = PoseService(
        cfg, weights=args.weights or None, flip_test=args.flip,
        quantize=args.quantize, act_scales=args.act_scales or None,
        max_batch=args.max_batch, window_ms=args.window_ms,
        detector=args.detector, detector_weights=det_weights,
        max_persons=args.max_persons, pad_on_device=args.pad_on_device,
        max_frames=args.max_frames)
    server = PoseServer(service, host=args.host, port=args.port)

    def stop(signum, frame):
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, stop)
    signal.signal(signal.SIGINT, stop)
    print(f"serving on http://{server.host}:{server.port}", flush=True)
    try:
        server.serve_forever()
    finally:
        server.shutdown()


if __name__ == "__main__":
    sys.exit(main())
