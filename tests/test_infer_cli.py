"""tools/infer.py driven as a real subprocess (the user-facing serving
CLI): image source with --fused, the --low-bw mode, and the new flag
guards.  Tiny pose model on CPU."""

import os
import subprocess
import sys

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


def _run(args, timeout=540, expect_rc=0):
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "infer.py")] + args,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout)
    assert p.returncode == expect_rc, (p.returncode, p.stdout[-1500:],
                                       p.stderr[-1500:])
    return p.stdout + p.stderr


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    import cv2
    tmp = tmp_path_factory.mktemp("infer_cli")
    cfg = str(tmp / "tiny.yaml")
    with open(cfg, "w") as f:
        f.write(CFG_YAML)
    src = tmp / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = cv2.resize(rng.integers(0, 255, (9, 9, 3)).astype(np.uint8),
                         (320, 240), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(src / f"f{i}.jpg"), img)
    return {"cfg": cfg, "src": str(src), "tmp": tmp}


def test_fused_image_dir(cli_env):
    out_dir = str(cli_env["tmp"] / "out_fused")
    _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--fused", "--max-persons", "4",
          "--save-dir", out_dir])
    assert sorted(os.listdir(out_dir)) == ["f0.jpg", "f1.jpg"]


def test_low_bw_image_dir(cli_env):
    out_dir = str(cli_env["tmp"] / "out_lbw")
    _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--fused", "--low-bw",
          "--max-persons", "4", "--save-dir", out_dir])
    assert sorted(os.listdir(out_dir)) == ["f0.jpg", "f1.jpg"]


@pytest.fixture(scope="module")
def tiny_video(cli_env):
    import cv2
    path = str(cli_env["tmp"] / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5.0,
                        (320, 240))
    assert w.isOpened(), "cv2 mp4v writer unavailable"
    rng = np.random.default_rng(1)
    for _ in range(5):
        img = cv2.resize(rng.integers(0, 255, (9, 9, 3)).astype(np.uint8),
                         (320, 240), interpolation=cv2.INTER_CUBIC)
        w.write(img)
    w.release()
    return path


def test_pipelined_video(cli_env, tiny_video):
    """--pipeline 3 on a real video file: the async submit/fetch loop
    drains correctly (incl. the in-flight tail) and writes every frame."""
    import cv2
    out_dir = str(cli_env["tmp"] / "out_pipe")
    _run(["--source", tiny_video, "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--fused", "--pipeline", "3",
          "--max-persons", "4", "--save-dir", out_dir])
    out = os.path.join(out_dir, "out_clip.mp4")
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5, n


def test_pipelined_low_bw_video(cli_env, tiny_video):
    """--low-bw --pipeline: the 2-stage pipelined stream (detection of
    frame i+1 behind pose of frame i) writes every frame."""
    import cv2
    out_dir = str(cli_env["tmp"] / "out_pipe_lbw")
    _run(["--source", tiny_video, "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--fused", "--low-bw",
          "--pipeline", "2", "--max-persons", "4", "--save-dir", out_dir])
    out = os.path.join(out_dir, "out_clip.mp4")
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5, n


def test_stream_url_source(cli_env, tiny_video):
    """Network-stream serving: an http:// video URL rides the same
    cv2-backed reader and the pipelined fused path."""
    import http.server
    import socketserver
    import threading

    import cv2
    serve_dir = os.path.dirname(tiny_video)

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=serve_dir, **k)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            out_dir = str(cli_env["tmp"] / "out_stream")
            url = f"http://127.0.0.1:{port}/{os.path.basename(tiny_video)}"
            _run(["--source", url, "--pose-cfg", cli_env["cfg"],
                  "--detector", "yolov5n", "--fused", "--pipeline", "2",
                  "--max-persons", "4", "--save-dir", out_dir])
        finally:
            srv.shutdown()
    out = os.path.join(out_dir, "out_" + os.path.basename(tiny_video))
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5, n


def test_quantize_int8_calibrate_then_reuse(cli_env):
    """--quantize int8 --act-scales: run 1 self-calibrates (bf16-served)
    and writes the table; run 2 loads it and serves int8 directly.  Uses
    --bbox-dir so no detector is needed."""
    tmp = cli_env["tmp"]
    bbox_dir = str(tmp / "bboxes")
    os.makedirs(bbox_dir, exist_ok=True)
    for i in range(2):
        with open(os.path.join(bbox_dir, f"f{i}.txt"), "w") as f:
            f.write("0 0.5 0.5 0.5 0.8\n")
    calib = str(tmp / "calib.json")
    out_dir = str(tmp / "out_q")
    args = ["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
            "--bbox-dir", bbox_dir, "--quantize", "int8",
            "--act-scales", calib, "--save-dir", out_dir]
    out = _run(args + ["TPU.QUANTIZE_CALIB_BATCHES", "1"])
    assert "saved int8 calibration table" in out
    assert os.path.exists(calib)
    out2 = _run(args)                      # table exists → loaded, no save
    assert "saved int8 calibration table" not in out2
    assert sorted(os.listdir(out_dir)) == ["f0.jpg", "f1.jpg"]


def test_quantize_int8_detector_table(cli_env):
    """Two-stage --detector --quantize int8: the detector self-calibrates
    on its letterboxed frames (independent of person detections) and
    --det-act-scales persists the table; a second run loads it."""
    tmp = cli_env["tmp"]
    det_calib = str(tmp / "det_calib.json")
    out_dir = str(tmp / "out_det_q")
    args = ["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
            "--detector", "yolov5n", "--quantize", "int8",
            "--det-act-scales", det_calib, "--save-dir", out_dir]
    out = _run(args + ["TPU.QUANTIZE_CALIB_BATCHES", "2"])
    assert "saved detector int8 calibration table" in out
    assert os.path.exists(det_calib)
    out2 = _run(args)                      # table exists → loaded, no save
    assert "saved detector int8 calibration table" not in out2


def test_low_bw_quantize_self_calibrates(cli_env):
    """--fused --low-bw --quantize int8 needs NO precomputed table (the
    low-bw path host-crops, so both nets self-calibrate) — the guard that
    blocks single-dispatch fused int8 must not fire here."""
    out_dir = str(cli_env["tmp"] / "out_lbw_q")
    _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--fused", "--low-bw",
          "--quantize", "int8", "--max-persons", "4",
          "--save-dir", out_dir, "TPU.QUANTIZE_CALIB_BATCHES", "1"])
    assert sorted(os.listdir(out_dir)) == ["f0.jpg", "f1.jpg"]


def test_flag_guards(cli_env):
    # --low-bw without --fused and with --chunk must error loudly
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--low-bw"], expect_rc=1, timeout=120)
    assert "--low-bw needs --fused" in out
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--detector", "yolov5n", "--fused", "--low-bw",
                "--chunk", "4"], expect_rc=1, timeout=120)
    assert "mutually exclusive" in out
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--pipeline", "2"], expect_rc=1, timeout=120)
    assert "--pipeline needs --fused" in out
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--detector", "yolov5n", "--fused", "--quantize", "int8"],
               expect_rc=1, timeout=120)
    assert "needs a precomputed calibration table" in out
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--detector", "yolov5n", "--fused", "--pipeline", "2",
                "--chunk", "4"], expect_rc=1, timeout=120)
    assert "--pipeline and --chunk are mutually exclusive" in out
    # --pipeline on a directory source must refuse (it would silently run
    # the sequential loop otherwise)
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--detector", "yolov5n", "--fused", "--pipeline", "2"],
               expect_rc=1, timeout=300)
    assert "applies to video/webcam sources" in out
    # --classes / --agnostic-nms are host-NMS (two-stage) options
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--detector", "yolov5n", "--fused", "--agnostic-nms"],
               expect_rc=1, timeout=120)
    assert "two-stage path only" in out
    # ... and need a detector at all (silently-dead flags refused)
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--classes", "0"], expect_rc=1, timeout=120)
    assert "need --detector" in out
    out = _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
                "--det-size", "320"], expect_rc=1, timeout=120)
    assert "--det-size needs --detector" in out


def test_detector_nms_flags_plumbed(cli_env):
    """--det-size/--padding/--classes/--agnostic-nms reach the two-stage
    detector (inference_engine.py --imgsz/--padding/--classes/
    --agnostic-nms), and --padding reaches the fused in-graph scale-back."""
    out_dir = str(cli_env["tmp"] / "out_flags")
    _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--det-size", "320", "--padding", "9",
          "--classes", "0", "--agnostic-nms", "--save-dir", out_dir])
    assert sorted(os.listdir(out_dir)) == ["f0.jpg", "f1.jpg"]
    out_dir2 = str(cli_env["tmp"] / "out_flags_fused")
    _run(["--source", cli_env["src"], "--pose-cfg", cli_env["cfg"],
          "--detector", "yolov5n", "--fused", "--det-size", "320",
          "--padding", "9", "--save-dir", out_dir2])
    assert sorted(os.listdir(out_dir2)) == ["f0.jpg", "f1.jpg"]
