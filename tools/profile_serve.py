"""Serving-daemon load probe: does cross-request micro-batching pay?

Drives ``engine.server.PoseService.pose`` (host warp → CropBatcher →
one padded device dispatch) with N concurrent client threads and
measures requests/s and crops/s:

  * concurrency scan at the shipping batcher settings (window 3 ms,
    max_batch 64) — throughput should rise with clients as their crops
    coalesce into one dispatch;
  * the same load with ``max_batch=1`` (every request dispatches alone,
    the reference's per-caller serving shape) as the baseline.

Goes through the real service path (decode-free: in-memory RGB arrays)
so the measurement isolates batching, not HTTP/JSON overhead — the
/v1/pose endpoint adds json+base64 per request on top.

``--frames`` probes /v1/detect_pose's FrameBatcher instead: concurrent
clients submit same-resolution 720p frames; batched (max_frames 8,
vmapped infer_frames dispatches) vs unbatched (max_frames 1, the old
serialized-lock shape).

Usage: python tools/profile_serve.py [--frames] [threads ...]
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_load(service, img, boxes, n_threads, requests_per_thread):
    """Fire requests from n_threads concurrently; returns (req/s, crops/s,
    mean latency ms)."""
    lat = []
    lock = threading.Lock()
    start = threading.Barrier(n_threads + 1)

    def client():
        mine = []
        start.wait()
        for _ in range(requests_per_thread):
            t0 = time.perf_counter()
            out = service.pose(img, boxes)
            assert out["keypoints"].shape[0] == len(boxes)
            mine.append(time.perf_counter() - t0)
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(n_threads)]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    n_req = n_threads * requests_per_thread
    return n_req / dt, n_req * len(boxes) / dt, 1e3 * float(np.mean(lat))


def run_frame_load(service, frame, n_threads, requests_per_thread):
    lat = []
    lock = threading.Lock()
    start = threading.Barrier(n_threads + 1)

    def client():
        mine = []
        start.wait()
        for _ in range(requests_per_thread):
            t0 = time.perf_counter()
            out = service.detect_pose(frame)
            assert "keypoints" in out
            mine.append(time.perf_counter() - t0)
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(n_threads)]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    n_req = n_threads * requests_per_thread
    return n_req / dt, 1e3 * float(np.mean(lat))


def main_frames(thread_counts):
    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.engine.server import PoseService

    cfg = load_config(os.path.join(
        REPO, "configs", "coco", "hrnet_w32_256x192_udp_offset.yaml"))
    cfg.defrost()
    cfg.TPU.DTYPE = "bfloat16"

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (720, 1280, 3)).astype(np.uint8)

    for tag, max_frames in (("frame-batched (max_frames 8)", 8),
                            ("unbatched (max_frames 1)", 1)):
        service = PoseService(cfg, flip_test=False, detector="yolov5n",
                              max_persons=16, window_ms=3.0,
                              max_frames=max_frames)
        try:
            # warm every reachable (F, H, W) graph: 1 plus the
            # power-of-two frame buckets the coalescer can form
            service.fused.infer_frame(frame)
            print("  warmed F=1", file=sys.stderr, flush=True)
            f = 2
            while f <= max_frames:
                service.fused.infer_frames(np.tile(frame[None],
                                                   (f, 1, 1, 1)))
                print(f"  warmed F={f}", file=sys.stderr, flush=True)
                f *= 2
            run_frame_load(service, frame, max(thread_counts), 2)
            print(f"--- {tag}", flush=True)
            for n in thread_counts:
                rps, ms = run_frame_load(service, frame, n, 6)
                occ = (np.mean(service.frame_batcher.log_snapshot()[-6 * n:])
                       if service.frame_batcher.batch_log else 0)
                print(f"  {n:2d} clients: {rps:6.1f} frames/s  "
                      f"mean latency {ms:6.1f} ms  mean batch {occ:.1f}",
                      flush=True)
        finally:
            service.close()


def main(thread_counts):
    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.engine.server import PoseService
    # (No persistent compilation cache here: on the axon relay, executing
    # a cache-deserialized executable hangs — see bench.py._run NOTE.)

    cfg = load_config(os.path.join(
        REPO, "configs", "coco", "hrnet_w32_256x192_udp_offset.yaml"))
    cfg.defrost()
    cfg.TPU.DTYPE = "bfloat16"

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (720, 1280, 3)).astype(np.uint8)
    boxes = np.array([[100 + 180 * i, 80, 260 + 180 * i, 560]
                      for i in range(4)], np.float32)   # typical 4-person

    for tag, kwargs in (("batched (window 3ms, max 64)",
                         dict(max_batch=64, window_ms=3.0)),
                        ("batched + pad-on-device",
                         dict(max_batch=64, window_ms=3.0,
                              pad_on_device=True)),
                        ("unbatched (max_batch 1)",
                         dict(max_batch=1, window_ms=0.0))):
        service = PoseService(cfg, flip_test=False, **kwargs)
        # warm/compile: hit every power-of-two bucket the scan can reach
        # (requests carry 4 crops, so coalesced dispatches land on buckets
        # 4..max_batch — compiling one mid-measurement would poison that
        # row with a ~minute-long remote compile).  With max_batch=1 each
        # 4-crop job still dispatches alone into bucket 4.
        from udp_pose_tpu.engine.server import host_crops
        crops1, c1, s1 = host_crops(img, boxes[:1], service.pipe.input_wh)
        n = 4
        while n <= max(kwargs["max_batch"], 4):
            service.batcher.infer(np.tile(crops1, (n, 1, 1, 1)),
                                  np.tile(c1, (n, 1)), np.tile(s1, (n, 1)))
            print(f"  warmed bucket {n}", file=sys.stderr, flush=True)
            n *= 2
        if kwargs.get("pad_on_device"):
            # every reachable total is a multiple of the 4-crop request;
            # warm each (total, pad) pair so its tiny pad jit doesn't
            # compile mid-measurement (pad==0 totals skip the pad graph
            # and are already warm from the bucket loop above)
            from udp_pose_tpu.engine.pose_engine import _next_bucket
            for n in range(4, kwargs["max_batch"] + 1, 4):
                if _next_bucket(n) == n:
                    continue
                service.batcher.infer(
                    np.tile(crops1, (n, 1, 1, 1)),
                    np.tile(c1, (n, 1)), np.tile(s1, (n, 1)))
            print("  warmed pad jits (totals 4..max step 4)",
                  file=sys.stderr, flush=True)
        run_load(service, img, boxes, max(thread_counts), 2)
        print(f"--- {tag}", flush=True)
        for n in thread_counts:
            rps, cps, ms = run_load(service, img, boxes, n, 8)
            occ = (np.mean(tuple(service.batcher.batch_log)[-8 * n:])
                   if service.batcher.batch_log else 0)
            print(f"  {n:2d} clients: {rps:6.1f} req/s  {cps:7.1f} crops/s "
                  f"  mean latency {ms:6.1f} ms  mean batch {occ:.1f}",
                  flush=True)
        service.close()


if __name__ == "__main__":
    argv = sys.argv[1:]
    frames = "--frames" in argv
    counts = [int(a) for a in argv if a != "--frames"] or [1, 4, 8, 16]
    (main_frames if frames else main)(counts)
