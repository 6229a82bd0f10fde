"""Preemption-safe training (utils/preemption.py).

Cloud-TPU eviction delivers SIGTERM; the train CLI must checkpoint at
the next step boundary, exit cleanly, and AUTO_RESUME must continue
EXACTLY — the epoch loader is epoch-seeded and deterministic, so a
mid-epoch resume that replays the batch order and skips the consumed
prefix reproduces the uninterrupted run bit-for-bit.  The reference
can only resume at epoch (tools/train.py:169-179) or
CHECKPOINT_PERIOD (engine.py:82-84) granularity.

Driven against the REAL tools/train.py in a subprocess, killed
mid-epoch with SIGTERM, resumed, and compared leaf-by-leaf against an
uninterrupted control run.
"""

import pytest

import os
import signal
import subprocess
import sys
import time

import numpy as np

from ref_harness import make_mini_coco

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_YAML = """
OUTPUT_DIR: {out}
AUTO_RESUME: true
PRINT_FREQ: 1
WORKERS: 0
DATASET:
  DATASET: coco
  ROOT: {root}
  TRAIN_SET: val2017
  TEST_SET: val2017
MODEL:
  NAME: pose_resnet
  TARGET_TYPE: gaussian
  IMAGE_SIZE: [64, 64]
  HEATMAP_SIZE: [16, 16]
  NUM_JOINTS: 17
  INIT_WEIGHTS: false
  EXTRA:
    NUM_LAYERS: 18
    NUM_DECONV_LAYERS: 3
    NUM_DECONV_FILTERS: [32, 32, 32]
    NUM_DECONV_KERNELS: [4, 4, 4]
    DECONV_WITH_BIAS: false
    FINAL_CONV_KERNEL: 1
TPU:
  DTYPE: float32
TRAIN:
  BATCH_SIZE_PER_GPU: 2
  BEGIN_EPOCH: 0
  END_EPOCH: 2
  LR: 0.001
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
  POST_PROCESS: false
"""


def _env():
    return dict(os.environ, UDP_POSE_PLATFORM="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1")


def _write_cfg(tmp_path, name, out, root):
    cfg_file = str(tmp_path / name)
    with open(cfg_file, "w") as f:
        f.write(CFG_YAML.format(out=out, root=root))
    return cfg_file


def _run(cfg_file, timeout=560):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_file],
        env=_env(), cwd=REPO, capture_output=True, text=True,
        timeout=timeout)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    return p.stdout + p.stderr


def _find(out, fname):
    for dirpath, _d, files in os.walk(out):
        if fname in files:
            return os.path.join(dirpath, fname)
    raise FileNotFoundError(f"{fname} under {out}")


def _leaves(path):
    from udp_pose_tpu.utils.checkpoint import load_weights
    import jax
    tree = load_weights(path)
    return jax.tree_util.tree_leaves_with_path(tree)


def test_sigterm_midepoch_resume_bit_exact(tmp_path):
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=16, seed=7)

    # ---- control: uninterrupted 2-epoch run --------------------------
    out_a = str(tmp_path / "out_a")
    log_a = _run(_write_cfg(tmp_path, "a.yaml", out_a, root))
    assert "preempted" not in log_a

    # ---- preempted run: SIGTERM after a few epoch-0 steps -------------
    out_b = str(tmp_path / "out_b")
    cfg_b = _write_cfg(tmp_path, "b.yaml", out_b, root)
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_b],
        env=_env(), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 540
    for line in p.stdout:
        if "Epoch [0][2/" in line or time.time() > deadline:
            break
    p.send_signal(signal.SIGTERM)
    tail = p.stdout.read()
    assert p.wait(timeout=120) == 0, tail[-3000:]
    assert "preempted: saved mid-epoch checkpoint" in tail
    ckpt = _find(out_b, "checkpoint.msgpack")
    assert os.path.exists(ckpt)
    # mid-epoch: the final artifact must NOT exist yet
    try:
        _find(out_b, "final_state.msgpack")
        raise AssertionError("preempted run wrote final_state")
    except FileNotFoundError:
        pass

    # ---- resume: must continue mid-epoch-0 and finish ------------------
    log_c = _run(cfg_b)
    assert "mid-epoch preemption save" in log_c

    # ---- bit-exact equivalence with the control run --------------------
    a = _leaves(_find(out_a, "final_state.msgpack"))
    b = _leaves(_find(out_b, "final_state.msgpack"))
    assert len(a) == len(b) and len(a) > 0
    for (ka, va), (kb, vb) in zip(a, b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(ka))


def test_sigterm_iteration_mode(tmp_path):
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=2, seed=5)
    out = str(tmp_path / "out")
    cfg_file = str(tmp_path / "rsn.yaml")
    with open(cfg_file, "w") as f:
        f.write(f"""
OUTPUT_DIR: {out}
AUTO_RESUME: true
PRINT_FREQ: 1
WORKERS: 0
DATASET:
  DATASET: coco
  ROOT: {root}
  TRAIN_SET: val2017
  TEST_SET: val2017
MODEL:
  NAME: rsn
  TARGET_TYPE: gaussian
  IMAGE_SIZE: [64, 64]
  HEATMAP_SIZE: [16, 16]
  NUM_JOINTS: 17
  INIT_WEIGHTS: false
  EXTRA:
    STAGE_NUM: 1
    UPSAMPLE_CHANNEL_NUM: 32
    LAYERS: [1, 1, 1, 1]
TPU:
  DTYPE: float32
TRAIN:
  BATCH_SIZE_PER_GPU: 2
  MAX_ITER: 400
  CHECKPOINT_PERIOD: 1000
  WARMUP_ITERS: 2
  ITER_BASELINE_DEVICES: 1
  LR: 0.0005
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
""")
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_file],
        env=_env(), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 540
    seen_iter = None
    for line in p.stdout:
        if "Iter [" in line:
            seen_iter = line
            if "Iter [3/" in line or time.time() > deadline:
                break
    p.send_signal(signal.SIGTERM)
    tail = p.stdout.read()
    assert p.wait(timeout=120) == 0, (seen_iter, tail[-3000:])
    assert "preempted: saved iteration checkpoint" in tail
    # iter-last symlink written by the preemption save
    _find(out, "iter-last.msgpack")

    # resume completes the remaining iterations from iteration+1
    cfg2 = cfg_file  # same cfg, but cap the remaining work for test speed
    with open(cfg2) as f:
        content = f.read().replace("MAX_ITER: 400", "MAX_ITER: 8")
    with open(cfg2, "w") as f:
        f.write(content)
    log = _run(cfg2)
    assert "resumed at iteration" in log


def test_guard_unit():
    from udp_pose_tpu.utils.preemption import PreemptionGuard
    g = PreemptionGuard()
    try:
        assert g.should_stop() is False
        os.kill(os.getpid(), signal.SIGTERM)
        # signal delivery is synchronous for self-kill on the main thread
        assert g.preempted and g.should_stop() is True
        # multi-host: never act on an unsynced flag (no collective here)
        assert g.should_stop(num_shards=2, sync=False) is False
    finally:
        g.restore()
