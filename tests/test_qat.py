"""Quantization-aware training (models/quantize.FakeQuantModel).

QAT closes the one gap the PTQ tests bound but cannot remove: serving-time
int8 drift.  Training through the straight-through fake-quant grid makes
the weights land ON the int8 grid the serving path (QuantizedModel) snaps
to, so deployment matches the trained forward.  These tests pin:

 (a) grid parity — with a frozen table, the fake-quant forward equals the
     int8 serving forward up to fp-vs-int32 accumulation order,
 (b) the STE trains — loss decreases, params move, convs engage,
 (c) deployment — int8 decode on a QAT-trained model matches QAT eval to
     sub-pixel and stays decisive on the overfit targets,
 (d) the bitwise fallback contract (skip-everything == original module),
 (e) the TPU.QAT CLI surface on the real tools/train.py.

The reference has no QAT at all (int8 only via MNN/OpenVINO export,
deep_hrnet/scripts/export_mnn.sh) — this is a native extension.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from udp_pose_tpu.core.infer import make_infer_fn
from udp_pose_tpu.core.loss import make_loss_fn
from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                     normalize_images)
from udp_pose_tpu.models import build_model
from udp_pose_tpu.models.quantize import (FakeQuantModel, QuantizedModel,
                                          calibrate)
from udp_pose_tpu.ops.targets import batch_gaussian_targets

from test_quantize import _tiny_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def qat_trained():
    """Tiny pose_resnet overfit THROUGH the fake-quant grid on 2 fixed
    images until heatmaps peak decisively."""
    cfg = _tiny_cfg()
    cfg.TRAIN.LR = 3e-3
    base = build_model(cfg)
    fq = FakeQuantModel(base)
    rng = np.random.default_rng(11)
    B, J = 2, 17
    images = rng.integers(0, 256, (B, 64, 64, 3)).astype(np.uint8)
    joints = rng.uniform(8, 56, (B, J, 2)).astype(np.float32)
    vis = np.ones((B, J), np.float32)
    target, weight = batch_gaussian_targets(
        jnp.asarray(joints), jnp.asarray(vis), (16, 16), (64, 64), 2.0)
    batch = {"image": np.asarray(normalize_images(images)),
             "target": np.asarray(target), "target_weight": np.asarray(weight)}
    state = create_train_state(cfg, fq, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(make_loss_fn(cfg))
    losses = []
    for _ in range(160):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, base, fq, variables, images, joints, losses


def _centers_scales(B):
    center = np.tile(np.array([[32.0, 32.0]], np.float32), (B, 1))
    scale = np.tile(np.array([[0.32, 0.32]], np.float32), (B, 1))
    return center, scale


def test_qat_ste_trains(qat_trained):
    cfg, base, fq, variables, images, joints, losses = qat_trained
    # the STE passed gradients: loss collapsed by >10x on the overfit set
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    # fake-quant sites actually engaged during tracing
    assert len(fq.engaged) > 10, fq.engaged
    assert not any("final_layer" in p for p in fq.engaged)
    # and the QAT model decodes its own training targets decisively
    infer = make_infer_fn(fq, target_type="gaussian", flip_test=False)
    center, scale = _centers_scales(images.shape[0])
    p, _, _ = infer(variables, images, center, scale)
    dist = np.linalg.norm(np.asarray(p) - joints, axis=-1)
    assert np.median(dist) < 3.0, np.median(dist)


def test_fake_quant_frozen_table_matches_int8_grid(qat_trained):
    """With the SAME frozen activation table, the QAT eval forward and the
    int8 serving forward compute on identical grid points — outputs agree
    up to fp32-conv vs int32-accumulate ordering."""
    cfg, base, fq, variables, images, *_ = qat_trained
    x = jnp.asarray(normalize_images(images))
    table = calibrate(base, variables, [x])
    out_fq = FakeQuantModel(base, act_scales=table).apply(
        variables, x, train=False)
    out_i8 = QuantizedModel(base, table).apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fq), np.asarray(out_i8),
                               rtol=2e-3, atol=2e-3)


def test_qat_int8_deployment_drift_subpixel(qat_trained):
    """Deploy the QAT-trained weights through the standard PTQ path
    (calibrate → QuantizedModel): decoded keypoints match the QAT eval
    forward sub-pixel at the median and stay decisive on the targets."""
    cfg, base, fq, variables, images, joints, _ = qat_trained
    B = images.shape[0]
    center, scale = _centers_scales(B)
    table = calibrate(base, variables,
                      [jnp.asarray(normalize_images(images))])

    infer_qat = make_infer_fn(fq, target_type="gaussian", flip_test=False)
    infer_i8 = make_infer_fn(QuantizedModel(base, table),
                             target_type="gaussian", flip_test=False)
    p_qat, mv_qat, _ = infer_qat(variables, images, center, scale)
    p_i8, mv_i8, _ = infer_i8(variables, images, center, scale)

    drift = np.linalg.norm(np.asarray(p_qat) - np.asarray(p_i8), axis=-1)
    assert np.median(drift) < 0.5, np.median(drift)
    assert np.max(np.abs(np.asarray(mv_qat) - np.asarray(mv_i8))) < 0.1
    dist = np.linalg.norm(np.asarray(p_i8) - joints, axis=-1)
    assert np.median(dist) < 3.0, np.median(dist)


def test_fake_quant_skip_everything_is_bitwise_fallback(qat_trained):
    cfg, base, fq, variables, images, *_ = qat_trained
    x = jnp.asarray(normalize_images(images))
    out_base = base.apply(variables, x, train=False)
    out_skip = FakeQuantModel(base, skip=("*",)).apply(variables, x,
                                                       train=False)
    np.testing.assert_array_equal(np.asarray(out_base), np.asarray(out_skip))


def test_fake_quant_gradients_finite_nonzero(qat_trained):
    """Gradients flow through the STE into every engaged conv kernel."""
    cfg, base, fq, variables, images, *_ = qat_trained
    x = jnp.asarray(normalize_images(images))

    def loss(params):
        out = fq.apply({**variables, "params": params}, x, train=False)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


QAT_CFG_YAML = """
OUTPUT_DIR: {out}
PRINT_FREQ: 2
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
  QAT: int8
TRAIN:
  BATCH_SIZE_PER_GPU: 2
  BEGIN_EPOCH: 0
  END_EPOCH: 1
  LR: 0.001
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
"""


def test_test_cli_qat_int8_eval(tmp_path):
    """TPU.QAT int8 through the real tools/test.py: a QAT checkpoint
    evaluates the way it trained (fake-quant convs, dynamic scales) —
    the eval half of the CLI surface."""
    from flax import serialization
    from ref_harness import make_mini_coco

    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=5)
    cfg = _tiny_cfg()
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.COLOR_RGB = True
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 96, 3)), train=False)
    wpath = str(tmp_path / "w.msgpack")
    with open(wpath, "wb") as f:
        f.write(serialization.to_bytes(variables))
    cfg.TEST.MODEL_FILE = wpath
    ypath = str(tmp_path / "tiny.yaml")
    with open(ypath, "w") as f:
        f.write(cfg.dump())

    env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         "--cfg", ypath, "TPU.QAT", "int8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, (p.stdout[-1500:], p.stderr[-1500:])
    blob = p.stdout + p.stderr
    assert "QAT int8: evaluating through the fake-quant grid" in blob
    assert "AP" in blob


def test_train_cli_qat_int8(tmp_path):
    """TPU.QAT int8 drives the real tools/train.py end-to-end."""
    from ref_harness import make_mini_coco
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=2, seed=3)
    out = str(tmp_path / "run")
    cfg_file = str(tmp_path / "exp.yaml")
    with open(cfg_file, "w") as f:
        f.write(QAT_CFG_YAML.format(out=out, root=root))
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_file],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=560)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    text = p.stdout + p.stderr
    assert "QAT int8: training through the fake-quant grid" in text


def test_train_cli_qat_with_pp_refused(tmp_path):
    """TPU.QAT + TPU.PP must fail fast: the pipeline stages build their
    own modules and bypass the fake-quant wrapper, so training would
    silently run full-precision while claiming QAT."""
    from ref_harness import make_mini_coco
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=2, seed=3)
    out = str(tmp_path / "run")
    cfg_file = str(tmp_path / "exp.yaml")
    with open(cfg_file, "w") as f:
        f.write(QAT_CFG_YAML.format(out=out, root=root))
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_file, "TPU.PP", "true"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    assert p.returncode != 0
    assert "TPU.QAT is not supported together with TPU.PP" in (
        p.stdout + p.stderr)
