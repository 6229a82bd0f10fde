"""Iteration-based RSN training recipe (VERDICT r1 #10).

Drives the REAL tools/train.py CLI on CPU with TRAIN.MAX_ITER set:
 * iteration scaling — iters × (8-GPU baseline / device width)
   (RSN/exps/RSN18.coco/train.py:36-38),
 * iter-<N>.msgpack checkpoints + iter-last.msgpack symlink
   (engine.py:162-169),
 * AUTO_RESUME picks up at the last iteration checkpoint.
"""

import os
import subprocess
import sys

import pytest

from ref_harness import make_mini_coco

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_YAML = """
OUTPUT_DIR: {out}
AUTO_RESUME: true
PRINT_FREQ: 2
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
  MAX_ITER: 12
  CHECKPOINT_PERIOD: 4
  WARMUP_ITERS: 2
  ITER_BASELINE_DEVICES: 1
  LR: 0.0005
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
"""


def _run(cfg_file, timeout=560):
    # conftest exports an 8-virtual-device XLA flag; the CLI under test
    # must see ONE device (the iteration scaling math keys off width)
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_file],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    return p.stdout + p.stderr


def _run_dir(out):
    for dirpath, _d, files in os.walk(out):
        if any(f.startswith("iter-") for f in files):
            return dirpath
    raise FileNotFoundError(out)


def test_rsn_iteration_training_and_resume(tmp_path):
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=2, seed=5)
    out = str(tmp_path / "run")
    cfg_file = str(tmp_path / "exp.yaml")
    with open(cfg_file, "w") as f:
        f.write(CFG_YAML.format(out=out, root=root))

    text = _run(cfg_file)
    run_dir = _run_dir(out)
    files = sorted(os.listdir(run_dir))
    # device width 1, baseline 1 → 12 iters, ckpt every 4
    assert "iter-3.msgpack" in files and "iter-7.msgpack" in files, files
    assert "iter-11.msgpack" in files, files
    link = os.path.join(run_dir, "iter-last.msgpack")
    assert os.path.islink(link)
    assert os.readlink(link) == "iter-11.msgpack"
    assert "iteration mode: 12 iters" in text

    # resume: drop the last checkpoint, rerun → continues from iter-8
    os.remove(os.path.join(run_dir, "iter-11.msgpack"))
    os.remove(link)
    os.symlink("iter-7.msgpack", link)
    text2 = _run(cfg_file)
    assert "resumed at iteration 8" in text2
    assert os.path.exists(os.path.join(run_dir, "iter-11.msgpack"))


def test_4xrsn18_iteration_training(tmp_path):
    """The reference's best-model SHAPE (4XRSN18: STAGE_NUM=4,
    4XRSN18.coco/config.py:50) drives the real iteration-mode train CLI:
    4-stage chaining + per-stage losses + iter checkpoints, end-to-end."""
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=2, seed=9)
    out = str(tmp_path / "run4x")
    cfg_file = str(tmp_path / "exp4x.yaml")
    cfg_text = CFG_YAML.format(out=out, root=root).replace(
        "STAGE_NUM: 1", "STAGE_NUM: 4").replace(
        "MAX_ITER: 12", "MAX_ITER: 4").replace(
        "CHECKPOINT_PERIOD: 4", "CHECKPOINT_PERIOD: 2")
    with open(cfg_file, "w") as f:
        f.write(cfg_text)

    text = _run(cfg_file)
    run_dir = _run_dir(out)
    files = sorted(os.listdir(run_dir))
    assert "iter-1.msgpack" in files and "iter-3.msgpack" in files, files
    assert "iteration mode: 4 iters" in text
    # 4-stage per-stage losses all flow into one finite total
    assert "Loss" in text


def test_iteration_resume_bit_exact(tmp_path):
    """A resumed iteration-mode run must be bit-identical to an
    uninterrupted one: the data stream fast-forwards past consumed
    batches — whole epochs by plan arithmetic (the dataset rng reseeds
    per epoch, so skipping their builds is free AND exact), the partial
    epoch by replaying the consumed prefix's aug-rng draws.  Before the
    round-3 fix the stream restarted at epoch 0, silently re-training
    early batches at late-schedule LR."""
    import numpy as np

    root = str(tmp_path / "data")
    # 4 images / batch 2 -> 2 batches per epoch; resuming at iteration 3
    # exercises BOTH paths: skip epoch 0 whole (2 batches) + replay 1
    # prefix batch of epoch 1
    make_mini_coco(root, n_images=4, seed=9)
    yaml = CFG_YAML.replace("MAX_ITER: 12", "MAX_ITER: 7").replace(
        "CHECKPOINT_PERIOD: 4", "CHECKPOINT_PERIOD: 3")

    out_a = str(tmp_path / "run_a")
    cfg_a = str(tmp_path / "a.yaml")
    with open(cfg_a, "w") as f:
        f.write(yaml.format(out=out_a, root=root))
    _run(cfg_a)

    out_b = str(tmp_path / "run_b")
    cfg_b = str(tmp_path / "b.yaml")
    with open(cfg_b, "w") as f:
        f.write(yaml.replace("MAX_ITER: 7", "MAX_ITER: 3").format(
            out=out_b, root=root))
    _run(cfg_b)                                  # stops after iter 2
    with open(cfg_b, "w") as f:
        f.write(yaml.format(out=out_b, root=root))
    text = _run(cfg_b)                           # resumes at iter 3
    assert "resumed at iteration 3" in text

    def leaves(out):
        import jax
        from udp_pose_tpu.utils.checkpoint import load_weights
        for dirpath, _d, files in os.walk(out):
            if "final_state.msgpack" in files:
                return jax.tree_util.tree_leaves_with_path(load_weights(
                    os.path.join(dirpath, "final_state.msgpack")))
        raise FileNotFoundError(out)

    a, b = leaves(out_a), leaves(out_b)
    assert len(a) == len(b) and len(a) > 0
    for (ka, va), (kb, vb) in zip(a, b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(ka))
