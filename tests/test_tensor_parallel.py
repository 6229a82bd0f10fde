"""Tensor parallelism (parallel/mesh.tensor_parallel_sharding).

The reference replicates every parameter on every GPU (DataParallel /
DDP+NCCL); the TPU-native extension shards channel dims over the mesh
'model' axis — conv kernels over C_out, BN vectors and adam moments over
C — and lets GSPMD insert the collectives.  These tests pin:

 (a) the sharding rule itself (which leaves shard, which replicate),
 (b) numerical equivalence: a tp-sharded forward and a dp+tp-sharded
     train-step trajectory match the replicated single-layout run,
 (c) the memory claim: sharded leaves' addressable shards are 1/n,
 (d) the TPU.TP CLI surface on the real tools/train.py.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from udp_pose_tpu.config import default_config
from udp_pose_tpu.core.loss import make_loss_fn
from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                     normalize_images)
from udp_pose_tpu.models import build_model
from udp_pose_tpu.parallel import (make_mesh, replicated, shard_batch,
                                   tensor_parallel_sharding)
from udp_pose_tpu.ops.targets import batch_gaussian_targets

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg():
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_sharding_rule_selects_wide_channel_dims():
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    tree = {
        "conv_kernel": jnp.zeros((3, 3, 64, 128)),   # C_out 128 → sharded
        "bn_scale": jnp.zeros((128,)),               # C 128 → sharded
        "narrow": jnp.zeros((3, 3, 16, 17)),         # 17 % 2 != 0 → repl
        "small": jnp.zeros((32,)),                   # < min_size → repl
        "scalar": jnp.zeros(()),                     # no dims → repl
    }
    sh = tensor_parallel_sharding(tree, mesh, min_size=64)
    assert sh["conv_kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
    assert sh["bn_scale"].spec == jax.sharding.PartitionSpec("model")
    assert sh["narrow"].spec == jax.sharding.PartitionSpec()
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()

    # on a model-axis of 1 nothing shards
    mesh1 = make_mesh(8, 1, devices=jax.devices()[:8])
    sh1 = tensor_parallel_sharding(tree, mesh1, min_size=64)
    assert all(s.spec == jax.sharding.PartitionSpec()
               for s in jax.tree_util.tree_leaves(sh1))


@pytest.fixture(scope="module")
def tiny_batch():
    cfg = _tiny_cfg()
    rng = np.random.default_rng(3)
    B, J = 8, 17
    images = rng.integers(0, 256, (B, 64, 64, 3)).astype(np.uint8)
    joints = rng.uniform(8, 56, (B, J, 2)).astype(np.float32)
    vis = np.ones((B, J), np.float32)
    target, weight = batch_gaussian_targets(
        jnp.asarray(joints), jnp.asarray(vis), (16, 16), (64, 64), 2.0)
    batch = {"image": np.asarray(normalize_images(images)),
             "target": np.asarray(target),
             "target_weight": np.asarray(weight)}
    return cfg, batch


def test_tp_forward_matches_replicated(tiny_batch):
    cfg, batch = tiny_batch
    model = build_model(cfg)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ref = np.asarray(fwd(variables, batch["image"]))

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    v_tp = jax.device_put(variables,
                          tensor_parallel_sharding(variables, mesh))
    x_sh = shard_batch(mesh, batch["image"])
    got = np.asarray(fwd(v_tp, x_sh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_tp_train_trajectory_matches_replicated(tiny_batch):
    """3 fwd+bwd+adam steps with params/opt-state channel-sharded over
    'model' and the batch over 'data' — losses and final params match the
    replicated dp-only run."""
    cfg, batch = tiny_batch
    model = build_model(cfg)

    def run(state_sharding_of):
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   steps_per_epoch=10)
        mesh = make_mesh(4, 2, devices=jax.devices()[:8])
        state = jax.device_put(state, state_sharding_of(state, mesh))
        step = make_train_step(make_loss_fn(cfg))
        sharded = shard_batch(mesh, batch)
        losses = []
        for _ in range(3):
            state, metrics = step(state, sharded)
            losses.append(float(metrics["loss"]))
        return losses, jax.device_get(state.params)

    losses_rep, params_rep = run(lambda s, m: replicated(m))
    losses_tp, params_tp = run(
        lambda s, m: tensor_parallel_sharding(s, m, min_size=64))

    # the tp layout changes reduction/collective order; the fp32
    # reassociation drift passes through adam's sqrt-normalisation —
    # near-zero gradients make early adam updates sign-sensitive, so a
    # <0.01% element tail diverges by up to ~5·lr after 3 steps
    # (measured: 1/36864 elements at 5.3e-3 with lr=1e-3); the tight
    # semantic check is the GRADIENT comparison in the next test
    np.testing.assert_allclose(losses_tp, losses_rep, rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(params_tp),
                    jax.tree_util.tree_leaves(params_rep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-2)


def test_tp_gradients_match_replicated(tiny_batch):
    """The rigorous equivalence: raw fwd+bwd gradients at identical
    params under the tp layout equal the replicated layout's (no
    optimizer in the loop to amplify fp noise)."""
    cfg, batch = tiny_batch
    model = build_model(cfg)
    loss_fn = make_loss_fn(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)

    def grads_under(place):
        mesh = make_mesh(4, 2, devices=jax.devices()[:8])
        params = jax.device_put(state.params, place(state.params, mesh))
        bs = jax.device_put(state.batch_stats, place(state.batch_stats,
                                                     mesh))
        b = shard_batch(mesh, batch)

        def loss_of(p):
            out, _ = model.apply({"params": p, "batch_stats": bs},
                                 b["image"], train=True,
                                 mutable=["batch_stats"])
            nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            loss, _ = loss_fn(nchw, b["target"], b["target_weight"])
            return loss

        return jax.device_get(jax.jit(jax.grad(loss_of))(params))

    g_rep = grads_under(lambda t, m: replicated(m))
    g_tp = grads_under(lambda t, m: tensor_parallel_sharding(t, m, 64))
    for a, b in zip(jax.tree_util.tree_leaves(g_tp),
                    jax.tree_util.tree_leaves(g_rep)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.max(np.abs(b)), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale,
                                   rtol=1e-4, atol=1e-4)


def test_tp_shards_are_fractional(tiny_batch):
    """The point of tp: per-chip bytes of wide leaves drop to 1/n."""
    cfg, batch = tiny_batch
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    state = jax.device_put(state, tensor_parallel_sharding(state, mesh))
    k = state.params["backbone"]["layer4_1"]["cb2"]["conv"]["kernel"]
    assert k.shape[-1] >= 256
    shard = k.addressable_shards[0].data
    assert shard.shape[-1] == k.shape[-1] // 2, (shard.shape, k.shape)
    # adam moments follow the same layout
    mu = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, state.opt_state))
    wide = [m for m in mu
            if getattr(m, "shape", ()) and m.shape == k.shape]
    assert wide and all(
        m.addressable_shards[0].data.shape[-1] == k.shape[-1] // 2
        for m in wide)


TP_CFG_YAML = """
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
  TP: true
  MESH:
    DATA: 2
    MODEL: 2
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


def test_train_cli_tensor_parallel(tmp_path):
    """TPU.TP over a 2x2 virtual mesh drives the real tools/train.py."""
    from ref_harness import make_mini_coco
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=9)
    out = str(tmp_path / "run")
    cfg_file = str(tmp_path / "exp.yaml")
    with open(cfg_file, "w") as f:
        f.write(TP_CFG_YAML.format(out=out, root=root))
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", cfg_file],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=560)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    text = p.stdout + p.stderr
    assert "tensor-parallel over 2 devices" in text
