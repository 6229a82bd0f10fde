"""Serving daemon tests: batcher math parity, cross-request coalescing,
the HTTP layer (endpoints, errors, metrics), and the CLI as a real
subprocess.  Tiny pose model on CPU."""

import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_YAML = """
DATASET:
  DATASET: coco
MODEL:
  NAME: pose_resnet
  TARGET_TYPE: gaussian
  IMAGE_SIZE: [96, 128]
  HEATMAP_SIZE: [24, 32]
  NUM_JOINTS: 17
  INIT_WEIGHTS: false
  EXTRA:
    NUM_LAYERS: 18
    NUM_DECONV_LAYERS: 2
    NUM_DECONV_FILTERS: [64, 64]
    NUM_DECONV_KERNELS: [4, 4]
    DECONV_WITH_BIAS: false
    FINAL_CONV_KERNEL: 1
TPU:
  DTYPE: float32
TEST:
  FLIP_TEST: false
"""


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    path = tmp_path_factory.mktemp("serve") / "tiny.yaml"
    path.write_text(CFG_YAML)
    from udp_pose_tpu.config import load_config
    return load_config(str(path)), str(path)


@pytest.fixture(scope="module")
def service(tiny_cfg):
    from udp_pose_tpu.engine.server import PoseService
    cfg, _ = tiny_cfg
    svc = PoseService(cfg, max_batch=64, window_ms=5.0)
    yield svc
    svc.close()


def _frame(seed=0, hw=(240, 320)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (*hw, 3)).astype(np.uint8)


BOXES = np.array([[40.0, 30.0, 120.0, 200.0],
                  [150.0, 60.0, 260.0, 230.0],
                  [10.0, 10.0, 90.0, 110.0]], np.float32)


def test_pose_matches_manual_graph(service, tiny_cfg):
    """Through-the-batcher result == make_infer_fn on the same padded
    bucket (the batcher adds no math of its own)."""
    from udp_pose_tpu.core.infer import make_infer_fn
    from udp_pose_tpu.engine.server import host_crops

    cfg, _ = tiny_cfg
    img = _frame(1)
    got = service.pose(img, BOXES)
    assert got["keypoints"].shape == (3, 17, 2)
    assert got["scores"].shape == (3, 17, 1)

    crops, center, scale = host_crops(img, BOXES, service.pipe.input_wh)
    pad = 4 - 3                                  # _next_bucket(3) == 4
    crops = np.concatenate([crops, crops[:1]])
    center = np.concatenate([center, center[:1]])
    scale = np.concatenate([scale, scale[:1]])
    infer = make_infer_fn(service.pipe.model, target_type="gaussian",
                          flip_test=False, post_process=cfg.TEST.POST_PROCESS,
                          kpd=cfg.LOSS.KPD)
    preds, maxvals, _ = infer(service.pipe.variables, crops, center, scale)
    np.testing.assert_array_equal(got["keypoints"], np.asarray(preds)[:3])
    np.testing.assert_array_equal(got["scores"], np.asarray(maxvals)[:3])
    assert pad == 1


def test_zero_boxes(service):
    out = service.pose(_frame(2), np.zeros((0, 4), np.float32))
    assert out["keypoints"].shape == (0, 17, 2)


def test_bad_boxes_rejected(service):
    with pytest.raises(ValueError):
        service.pose(_frame(3), np.zeros((2, 3), np.float32))
    with pytest.raises(ValueError):
        service.pose(_frame(3), np.zeros((300, 4), np.float32))


def test_concurrent_requests_coalesce(tiny_cfg):
    """N threads sending the same job within the window must coalesce
    into fewer dispatches, and every thread gets the same answer."""
    from udp_pose_tpu.engine.server import PoseService
    cfg, _ = tiny_cfg
    svc = PoseService(cfg, max_batch=64, window_ms=250.0)
    try:
        img = _frame(4)
        svc.pose(img, BOXES)                     # compile the bucket
        n_before = len(svc.batcher.batch_log)
        results = [None] * 6
        errs = []

        def worker(i):
            try:
                results[i] = svc.pose(img, BOXES)
            except Exception as e:               # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs
        dispatches = list(svc.batcher.batch_log)[n_before:]
        assert sum(dispatches) == 18             # all 6x3 crops served
        assert max(dispatches) > 3               # at least one coalesced
        for r in results[1:]:
            np.testing.assert_array_equal(r["keypoints"],
                                          results[0]["keypoints"])
    finally:
        svc.close()


def test_pad_on_device_matches_host_pad(tiny_cfg):
    """--pad-on-device (device_put real rows + on-device zero-pad) must
    return the same keypoints as the host-tiled padding path: padded
    rows are row-independent and discarded, so the fill value cannot
    matter."""
    from udp_pose_tpu.engine.server import PoseService
    cfg, _ = tiny_cfg
    img = _frame(7)
    svc_host = PoseService(cfg, max_batch=64, window_ms=0.0)
    svc_dev = PoseService(cfg, max_batch=64, window_ms=0.0,
                          pad_on_device=True)
    try:
        ref = svc_host.pose(img, BOXES)          # 3 crops -> bucket 4
        out = svc_dev.pose(img, BOXES)
        assert svc_dev.batcher._pad_fns, "pad jit never engaged"
        np.testing.assert_allclose(out["keypoints"], ref["keypoints"],
                                   atol=1e-5)
        np.testing.assert_allclose(out["scores"], ref["scores"],
                                   atol=1e-6)
        # exact-bucket batch (4 crops, pad 0) must skip the pad graph
        boxes4 = np.concatenate([BOXES, BOXES[:1]])
        n_fns = len(svc_dev.batcher._pad_fns)
        out4 = svc_dev.pose(img, boxes4)
        assert len(svc_dev.batcher._pad_fns) == n_fns
        assert out4["keypoints"].shape[0] == 4
    finally:
        svc_host.close()
        svc_dev.close()


def test_pad_on_device_int8_calibration_sees_buckets(tiny_cfg):
    """int8 + --pad-on-device: while calibrating, the batcher must feed
    calibrate_crops BUCKET-shaped (host-tiled) batches — its collector
    jit is shape-keyed, so off-bucket totals would recompile the full
    forward per distinct total — and only engage the device-pad graph
    after the scales freeze."""
    from udp_pose_tpu.engine.server import PoseService
    cfg, _ = tiny_cfg
    cfg = cfg.clone()
    cfg.defrost()
    cfg.TPU.QUANTIZE_CALIB_BATCHES = 2
    img = _frame(11)
    svc = PoseService(cfg, quantize="int8", max_batch=64, window_ms=0.0,
                      pad_on_device=True)
    try:
        seen = []
        orig = svc.pipe.calibrate_crops
        svc.pipe.calibrate_crops = lambda c: (seen.append(c.shape[0]),
                                              orig(c))[1]
        svc.pose(img, BOXES)                     # calib 1 (3 -> bucket 4)
        assert not svc.batcher._pad_fns          # host-tiled during calib
        svc.pose(img, BOXES)                     # calib 2 -> freeze
        assert svc.pipe.act_scales is not None
        assert seen == [4, 4], "calibration saw off-bucket shapes"
        out = svc.pose(img, BOXES)               # int8 + device pad
        assert svc.batcher._pad_fns, "device pad never engaged post-freeze"
        assert np.isfinite(out["keypoints"]).all()
        assert out["keypoints"].shape == (3, 17, 2)
    finally:
        svc.close()


@pytest.fixture(scope="module")
def http_server(service):
    from udp_pose_tpu.engine.server import PoseServer
    server = PoseServer(service, port=0)
    server.serve_in_thread()
    yield f"http://127.0.0.1:{server.port}"
    server.httpd.shutdown()
    server.httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read()


def _post(url, body, headers):
    req = urllib.request.Request(url, data=body, headers=headers,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _npy_bytes(img):
    import io
    buf = io.BytesIO()
    np.save(buf, img)
    return buf.getvalue()


def test_http_healthz(http_server):
    status, body = _get(http_server + "/healthz")
    state = json.loads(body)
    assert status == 200 and state["status"] == "ok"
    assert state["model"] == "pose_resnet" and not state["detector"]


def test_http_pose_npy(http_server, service):
    img = _frame(5)
    status, out = _post(
        http_server + "/v1/pose", _npy_bytes(img),
        {"Content-Type": "application/x-npy",
         "X-Boxes": json.dumps(BOXES.tolist())})
    assert status == 200
    kp = np.asarray(out["keypoints"], np.float32)
    assert kp.shape == (3, 17, 2) and out["latency_ms"] > 0
    direct = service.pose(img, BOXES)            # same bucket, same graph
    np.testing.assert_allclose(kp, direct["keypoints"], atol=1e-4)


def test_http_pose_jpeg_json(http_server):
    import base64
    import cv2
    img = _frame(6)
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1])
    assert ok
    body = json.dumps({
        "image_b64": base64.b64encode(enc.tobytes()).decode(),
        "boxes": BOXES.tolist(),
    }).encode()
    status, out = _post(http_server + "/v1/pose", body,
                        {"Content-Type": "application/json"})
    assert status == 200
    assert np.asarray(out["keypoints"]).shape == (3, 17, 2)


def test_http_errors(http_server):
    # missing boxes
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/v1/pose", _npy_bytes(_frame(7)),
              {"Content-Type": "application/x-npy"})
    assert e.value.code == 400
    # undecodable image
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/v1/pose", b"not an image",
              {"Content-Type": "image/jpeg",
               "X-Boxes": json.dumps(BOXES.tolist())})
    assert e.value.code == 400
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(http_server + "/nope")
    assert e.value.code == 404
    # detector endpoint while the server runs pose-only
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/v1/detect_pose", _npy_bytes(_frame(8)),
              {"Content-Type": "application/x-npy"})
    assert e.value.code == 409


def test_http_runtime_error_is_500_not_409(http_server, service,
                                           monkeypatch):
    """Only EngineStateError maps to 409; a bare RuntimeError (e.g.
    jaxlib's XlaRuntimeError on a dead device) must surface as 500 so
    5xx-keyed monitoring fires."""
    def boom(img, boxes):
        raise RuntimeError("device exploded")
    monkeypatch.setattr(service, "pose", boom)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/v1/pose", _npy_bytes(_frame(8)),
              {"Content-Type": "application/x-npy",
               "X-Boxes": json.dumps(BOXES.tolist())})
    assert e.value.code == 500


def test_http_metrics(http_server):
    status, body = _get(http_server + "/metrics")
    text = body.decode()
    assert status == 200
    assert 'udp_pose_requests_total{endpoint="pose",code="200"}' in text
    assert "udp_pose_latency_seconds" in text
    assert "udp_pose_batch_crops" in text


def test_detect_pose_inprocess(tiny_cfg):
    """Fused detect+pose behind the service (random-init yolov5n at a
    small det size; asserts the contract, not detections)."""
    from udp_pose_tpu.engine.server import PoseService
    cfg, _ = tiny_cfg
    svc = PoseService(cfg, detector="yolov5n", max_persons=4,
                      det_kwargs={"det_size": 192})
    try:
        out = svc.detect_pose(_frame(9, hw=(144, 192)))
        n = len(out["boxes"])
        assert np.asarray(out["keypoints"]).shape == (n, 17, 2)
        assert np.asarray(out["det_scores"]).shape == (n,)
    finally:
        svc.close()


def test_detect_pose_frames_coalesce(tiny_cfg):
    """Concurrent /v1/detect_pose callers with same-resolution frames
    must coalesce into one vmapped infer_frames dispatch (the old code
    serialised them behind a lock), and each caller's result must match
    its own single-frame answer.  Mixed resolutions split into separate
    dispatches within the drained batch."""
    from udp_pose_tpu.engine.server import PoseService
    cfg, _ = tiny_cfg
    svc = PoseService(cfg, detector="yolov5n", max_persons=4,
                      det_kwargs={"det_size": 192}, window_ms=250.0,
                      max_frames=8)
    try:
        frames = [_frame(20 + i, hw=(144, 192)) for i in range(4)]
        other = _frame(30, hw=(96, 128))
        # singles first: compiles + golden per-frame answers
        singles = [svc.fused.infer_frame(f) for f in frames]
        svc.fused.infer_frame(other)
        svc.fused.infer_frames(np.stack(frames))          # compile F=4
        n_before = len(svc.frame_batcher.batch_log)

        results = [None] * 5
        errs = []

        def worker(i):
            try:
                results[i] = (svc.detect_pose(frames[i]) if i < 4
                              else svc.detect_pose(other))
            except Exception as e:               # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs
        log = list(svc.frame_batcher.batch_log)[n_before:]
        assert sum(log) == 5
        assert max(log) > 1, "no frames coalesced"
        for i in range(4):
            np.testing.assert_allclose(results[i]["boxes"],
                                       singles[i]["boxes"], atol=1e-4)
            np.testing.assert_allclose(results[i]["keypoints"],
                                       singles[i]["keypoints"],
                                       rtol=1e-4, atol=1e-3)
        n = len(results[4]["boxes"])
        assert np.asarray(results[4]["keypoints"]).shape == (n, 17, 2)
    finally:
        svc.close()


def test_serve_cli_subprocess(tiny_cfg, tmp_path):
    """tools/serve.py end-to-end: boot, healthz, one pose request,
    graceful SIGTERM."""
    _, cfg_path = tiny_cfg
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--cfg", cfg_path, "--port", "0", "--no-flip",
         "--window-ms", "1"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()
        assert line.startswith("serving on "), line
        base = line.strip().split()[-1]
        status, body = _get(base + "/healthz")
        assert status == 200 and json.loads(body)["status"] == "ok"
        status, out = _post(
            base + "/v1/pose", _npy_bytes(_frame(10)),
            {"Content-Type": "application/x-npy",
             "X-Boxes": json.dumps(BOXES.tolist())})
        assert status == 200
        assert np.asarray(out["keypoints"]).shape == (3, 17, 2)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            rc = proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
    assert rc == 0, (rc, proc.stderr.read()[-1500:])
