"""Orbax checkpoint backend (utils/orbax_ckpt.py, TPU.CKPT_BACKEND).

SURVEY.md §5.4 names orbax as the TPU-native equivalent of the
reference's torch.save checkpoints; the msgpack backend keeps artifact
parity, this one adds async commit + per-shard parallel IO.  Pinned
here:
 * round-trip equality + metadata (epoch/perf/step_in_epoch)
 * sharded save on one mesh → restore DIRECTLY into a different mesh
   layout (no host-gather hop) — the restored leaves carry the target
   sharding
 * retention (max_to_keep) drops the oldest step
 * the train CLI drives it end-to-end (TPU.CKPT_BACKEND orbax) with
   AUTO_RESUME across two invocations
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from ref_harness import make_mini_coco

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _small_state(key=0):
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.core.train import create_train_state
    from udp_pose_tpu.models import build_model

    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [32, 32, 32],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    return cfg, model, create_train_state(cfg, model,
                                          jax.random.PRNGKey(key), 10)


def test_roundtrip_metadata_and_retention(tmp_path):
    from udp_pose_tpu.utils.orbax_ckpt import OrbaxBackend, load_any

    _cfg, _model, state = _small_state()
    be = OrbaxBackend(str(tmp_path), max_to_keep=2)
    be.save(state, {"epoch": 3, "perf": 0.5, "step_in_epoch": 7})
    be.wait()

    _cfg, _model, fresh = _small_state(key=1)
    restored, begin, perf, skip = load_any(be, str(tmp_path), fresh,
                                           iter_mode=False)
    assert (begin, perf, skip) == (4, 0.5, 7)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))

    # retention: saves at steps 1 and 2 (state.step bumps) keep only 2
    for bump in (1, 2):
        s2 = state.replace(step=state.step + bump)
        be.save(s2, {"epoch": 3 + bump, "perf": 0.5})
    be.wait()
    steps = sorted(int(p) for p in os.listdir(tmp_path / "orbax")
                   if p.isdigit())
    assert len(steps) == 2 and steps[-1] == 2
    # latest wins
    restored, begin, _perf, _skip = load_any(be, str(tmp_path), fresh,
                                             iter_mode=False)
    assert begin == 6
    be.close()


def test_iter_mode_meta(tmp_path):
    from udp_pose_tpu.utils.orbax_ckpt import OrbaxBackend, load_any

    _cfg, _model, state = _small_state()
    be = OrbaxBackend(str(tmp_path))
    be.save(state, {"iteration": 41})
    be.wait()
    _cfg, _model, fresh = _small_state(key=1)
    restored, start_iter = load_any(be, str(tmp_path), fresh,
                                    iter_mode=True)
    assert start_iter == 42
    be.close()


def test_sharded_save_restore_across_mesh_layouts(tmp_path):
    """Save under a (4,2) mesh, restore into a (2,4)-replicated template:
    leaves must be equal AND carry the TARGET sharding (orbax places
    shards directly; no host-gather round trip)."""
    from udp_pose_tpu.parallel import make_mesh, replicated
    from udp_pose_tpu.utils.orbax_ckpt import OrbaxBackend, load_any

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    _cfg, _model, state = _small_state()

    mesh_a = make_mesh(4, 2)
    state_a = jax.device_put(state, replicated(mesh_a))
    be = OrbaxBackend(str(tmp_path))
    be.save(state_a, {"epoch": 0, "perf": 0.1})
    be.wait()

    mesh_b = make_mesh(2, 4)
    _cfg, _model, fresh = _small_state(key=1)
    fresh_b = jax.device_put(fresh, replicated(mesh_b))
    restored, begin, _perf, _skip = load_any(be, str(tmp_path), fresh_b,
                                             iter_mode=False)
    assert begin == 1
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    tpl = jax.tree_util.tree_leaves(fresh_b.params)[0]
    assert leaf.sharding.is_equivalent_to(tpl.sharding, leaf.ndim)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))
    be.close()


@pytest.mark.slow
def test_train_cli_orbax_autoresume(tmp_path):
    """tools/train.py with TPU.CKPT_BACKEND orbax: run 1 epoch, then a
    second invocation with END_EPOCH 2 resumes from the orbax step."""
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=11)
    out = str(tmp_path / "out")
    cfg_file = str(tmp_path / "cfg.yaml")
    yaml = f"""
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
  CKPT_BACKEND: orbax
TRAIN:
  BATCH_SIZE_PER_GPU: 2
  BEGIN_EPOCH: 0
  END_EPOCH: {{end}}
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
  POST_PROCESS: false
"""
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")

    def run(end):
        with open(cfg_file, "w") as f:
            f.write(yaml.format(end=end))
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "train.py"),
             "--cfg", cfg_file],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=560)
        assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
        return p.stdout + p.stderr

    log1 = run(1)
    assert "orbax checkpoint backend" in log1
    # orbax step dir exists under the run dir
    found = False
    for dirpath, dirs, _files in os.walk(out):
        if os.path.basename(dirpath) == "orbax" and dirs:
            found = True
    assert found, "no orbax step directory written"

    log2 = run(2)
    assert "resumed (orbax) at epoch 1" in log2
