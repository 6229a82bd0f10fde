"""Pipeline parallelism for multi-stage RSN (parallel/pipeline.py).

The reference trains its multi-stage RSNs fully replicated on every GPU
(RSN/exps/*/train.py, DDP) — no pipeline parallelism exists anywhere in
it.  The TPU-native extension places stage s on pipeline rank s of the
mesh 'model' axis (stage params stack — models/rsn.RSNUniformStage),
streams microbatches through a lax.scan GPipe schedule and shifts the
inter-stage payload with lax.ppermute; the backward pipeline is plain
jax.grad through the scan.  These tests pin:

 (a) the variable-layout round trip (standard RSN tree <-> stem+stacked),
 (b) eval-mode equivalence: the pipelined forward over a dp×pp mesh
     EXACTLY reproduces the standard full-RSN apply (running-stats BN
     makes eval independent of the microbatch split),
 (c) train-mode gradients match a sequential-microbatch reference with
     identical BN semantics,
 (d) the train step optimizes sharded stacked params (loss decreases,
     per-chip stage shards are 1/S),
 (e) pipeline-trained weights merge back into the standard RSN tree and
     reproduce the pipelined eval forward (the validate/export path),
 (f) the 4-stage (4XRSN) shape pipelines on a (2,4) mesh and matches the
     monolithic apply,
 (g) the REAL tools/train.py CLI with TPU.PP trains end-to-end on a
     4-virtual-device mesh and ships merged standard-tree weights.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from udp_pose_tpu.config import default_config
from udp_pose_tpu.core.loss import rsn_multi_stage_loss
from udp_pose_tpu.core.rsn import _rsn_normalize, make_rsn_optimizer
from udp_pose_tpu.models.rsn import (rsn_from_cfg, stem_from_cfg,
                                     uniform_stage_from_cfg)
from udp_pose_tpu.parallel import make_mesh
from udp_pose_tpu.parallel.pipeline import (_stage_io_shapes,
                                            create_pipelined_rsn_state,
                                            make_pipeline_forward,
                                            make_pipelined_rsn_train_step,
                                            merge_rsn_variables,
                                            pipeline_state_sharding,
                                            split_rsn_variables)

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow

S = 2          # stages == pipeline ranks
N_MICRO = 2


def _tiny_rsn_cfg():
    cfg = default_config()
    cfg.MODEL.NAME = "rsn"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.EXTRA.merge_from_dict({
        "STAGE_NUM": S, "LAYERS": [1, 1, 1, 1],
        "UPSAMPLE_CHANNEL_NUM": 64})
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_rsn_cfg()
    rsn = rsn_from_cfg(cfg)
    variables = jax.jit(lambda r: rsn.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    stage = uniform_stage_from_cfg(cfg)
    x_sh, skip_sh = _stage_io_shapes((16, 16), 1, jnp.float32)
    zs = [jnp.zeros(s.shape) for s in skip_sh]
    template = jax.jit(lambda r: stage.init(
        r, jnp.zeros(x_sh.shape), zs, zs, train=False))(jax.random.PRNGKey(1))
    stem_v, stacked = split_rsn_variables(variables, S, template)
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8)
    return cfg, rsn, variables, stem_v, stacked, images


def test_variable_layout_round_trip(setup):
    cfg, rsn, variables, stem_v, stacked, images = setup
    # stacked leaves carry the leading stage axis
    lead = {l.shape[0] for l in jax.tree_util.tree_leaves(stacked)}
    assert lead == {S}
    back = merge_rsn_variables(stem_v, stacked, variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        back, variables)


def test_pipelined_eval_forward_matches_full_rsn(setup):
    """dp=2 × pp=2: the scan/ppermute pipeline reproduces the standard
    monolithic RSN apply exactly (eval mode: BN running stats, so no
    microbatch-statistics caveat applies)."""
    cfg, rsn, variables, stem_v, stacked, images = setup
    ref = jax.jit(lambda v, x: rsn.apply(
        v, _rsn_normalize(x), train=False, all_stages=True))(variables,
                                                             images)
    mesh = make_mesh(2, S, devices=jax.devices()[:2 * S])
    fwd = make_pipeline_forward(cfg, mesh, n_micro=N_MICRO)
    out = jax.jit(lambda sv, st, x: fwd(sv, st, x, False)[0])(
        {"params": stem_v["params"], "batch_stats": stem_v["batch_stats"]},
        {"params": stacked["params"],
         "batch_stats": stacked["batch_stats"]}, images)
    assert out.shape[:3] == (S, N_MICRO, 4)
    B = images.shape[0]
    for i in range(S):
        for j in range(4):
            got = np.asarray(out[i, :, j]).reshape(B, 16, 16, 17)
            np.testing.assert_allclose(got, np.asarray(ref[i][j]),
                                       rtol=2e-5, atol=2e-5)


def test_pipelined_gradients_match_sequential_microbatches(setup):
    """Train-mode fwd+bwd: gradients through the scan+ppermute pipeline
    equal a plain sequential-microbatch implementation with identical BN
    semantics (data=1 so per-shard == per-microbatch stats)."""
    cfg, rsn, variables, stem_v, stacked, images = setup
    stem = stem_from_cfg(cfg)
    stage = uniform_stage_from_cfg(cfg)
    rng = np.random.default_rng(3)
    B, J = images.shape[0], 17
    labels = rng.uniform(0, 255, (B, 5, J, 16, 16)).astype(np.float32)
    valid = np.ones((B, J, 1), np.float32)
    mb = B // N_MICRO
    params0 = {"stem": stem_v["params"], "stages": stacked["params"]}
    bs = {"stem": stem_v["batch_stats"], "stages": stacked["batch_stats"]}

    mesh = make_mesh(1, S, devices=jax.devices()[:S])
    fwd = make_pipeline_forward(cfg, mesh, n_micro=N_MICRO)

    def pp_loss(params):
        out, _, _ = fwd(
            {"params": params["stem"], "batch_stats": bs["stem"]},
            {"params": params["stages"], "batch_stats": bs["stages"]},
            images, True)
        outputs = [[out[i, :, j].reshape(B, 16, 16, J)
                    .transpose(0, 3, 1, 2).astype(jnp.float32)
                    for j in range(4)] for i in range(S)]
        return rsn_multi_stage_loss(outputs, valid, labels, S)

    def seq_loss(params):
        x0, _ = stem.apply(
            {"params": params["stem"], "batch_stats": bs["stem"]},
            _rsn_normalize(images), train=True, mutable=["batch_stats"])
        x_sh, skip_sh = _stage_io_shapes((16, 16), mb, x0.dtype)
        per = [[[] for _ in range(4)] for _ in range(S)]
        for m in range(N_MICRO):
            x = x0[m * mb:(m + 1) * mb]
            s1 = [jnp.zeros(s.shape, x0.dtype) for s in skip_sh]
            s2 = [jnp.zeros(s.shape, x0.dtype) for s in skip_sh]
            for s in range(S):
                pv = jax.tree_util.tree_map(lambda a: a[s],
                                            params["stages"])
                bv = jax.tree_util.tree_map(lambda a: a[s], bs["stages"])
                (res, s1, s2, cross), _ = stage.apply(
                    {"params": pv, "batch_stats": bv}, x, s1, s2,
                    train=True, mutable=["batch_stats"])
                x = cross
                for j in range(4):
                    per[s][j].append(res[j])
        outputs = [[jnp.concatenate(per[i][j])
                    .transpose(0, 3, 1, 2).astype(jnp.float32)
                    for j in range(4)] for i in range(S)]
        return rsn_multi_stage_loss(outputs, valid, labels, S)

    l_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(params0)
    l_sq, g_sq = jax.jit(jax.value_and_grad(seq_loss))(params0)
    np.testing.assert_allclose(float(l_pp), float(l_sq), rtol=1e-5)
    # conv biases under train-mode BN have mathematically ZERO gradient
    # (mean subtraction cancels any per-channel constant), so those leaves
    # are pure fp noise (~5e-7 of the global grad scale, measured); the
    # atol is set from the GLOBAL scale so rtol stays meaningful on the
    # real (weight/BN-scale) leaves.
    glob = max(float(np.max(np.abs(np.asarray(l))))
               for l in jax.tree_util.tree_leaves(g_sq))
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_sq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6 * glob)


def test_pipelined_train_step_optimizes_sharded_state(setup):
    cfg = setup[0]
    tx = make_rsn_optimizer(1e-3, 0.0, 100, warmup_iters=5)
    state = create_pipelined_rsn_state(cfg, jax.random.PRNGKey(0), tx)
    mesh = make_mesh(2, S, devices=jax.devices()[:2 * S])
    state = jax.device_put(state, pipeline_state_sharding(state, mesh))

    # per-chip stage shards are 1/S — the pp memory claim
    for leaf in jax.tree_util.tree_leaves(state.params["stages"]):
        assert leaf.shape[0] == S
        assert leaf.addressable_shards[0].data.shape[0] == 1

    rng = np.random.default_rng(1)
    B, J = 8, 17
    batch = {
        "image": rng.integers(0, 256, (B, 64, 64, 3)).astype(np.float32),
        "labels": rng.uniform(0, 255, (B, 5, J, 16, 16)).astype(np.float32),
        "valid": np.ones((B, J, 1), np.float32),
    }
    step = make_pipelined_rsn_train_step(cfg, mesh, n_micro=N_MICRO)
    bs_before = jax.device_get(state.batch_stats["stages"])
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6
    # BN running stats moved (masked per-tick updates engaged)
    moved = sum(
        float(jnp.sum(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(bs_before),
                        jax.tree_util.tree_leaves(
                            jax.device_get(state.batch_stats["stages"]))))
    assert moved > 0.0


def test_pipeline_trained_weights_merge_into_standard_rsn(setup):
    """The deployment path: convert a pipelined state back to the standard
    RSN tree and check the monolithic eval forward equals the pipelined
    one — validate/export run unchanged on pipeline-trained weights."""
    cfg, rsn, variables, stem_v, stacked, images = setup
    tx = make_rsn_optimizer(1e-3, 0.0, 100, warmup_iters=5)
    state = create_pipelined_rsn_state(
        cfg, jax.random.PRNGKey(0), tx,
        init_variables=variables)        # convert an existing tree
    mesh = make_mesh(2, S, devices=jax.devices()[:2 * S])
    state = jax.device_put(state, pipeline_state_sharding(state, mesh))
    batch = {
        "image": np.asarray(images, np.float32),
        "labels": np.zeros((8, 5, 17, 16, 16), np.float32),
        "valid": np.ones((8, 17, 1), np.float32),
    }
    step = make_pipelined_rsn_train_step(cfg, mesh, n_micro=N_MICRO)
    state, _ = step(state, batch)

    merged = merge_rsn_variables(
        {"params": jax.device_get(state.params["stem"]),
         "batch_stats": jax.device_get(state.batch_stats["stem"])},
        {"params": jax.device_get(state.params["stages"]),
         "batch_stats": jax.device_get(state.batch_stats["stages"])},
        variables)
    ref = jax.jit(lambda v, x: rsn.apply(
        v, _rsn_normalize(x), train=False))(merged, images)

    fwd = make_pipeline_forward(cfg, mesh, n_micro=N_MICRO)
    out = jax.jit(lambda sv, st, x: fwd(sv, st, x, False)[0])(
        {"params": state.params["stem"],
         "batch_stats": state.batch_stats["stem"]},
        {"params": state.params["stages"],
         "batch_stats": state.batch_stats["stages"]}, images)
    got = np.asarray(out[S - 1, :, 3]).reshape(8, 16, 16, 17)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_4stage_pipeline_eval_matches_full_rsn():
    """4XRSN shape (STAGE_NUM=4, the reference's best published model,
    4XRSN18.coco/config.py:50) through the pipeline on a (data=2, model=4)
    mesh — the full-depth chaining (stage s feeds cross+skips to s+1 three
    hops deep) exactly reproduces the monolithic apply."""
    cfg = _tiny_rsn_cfg()
    cfg.MODEL.IMAGE_SIZE = [32, 32]
    cfg.MODEL.HEATMAP_SIZE = [8, 8]
    cfg.MODEL.EXTRA.merge_from_dict({"STAGE_NUM": 4,
                                     "UPSAMPLE_CHANNEL_NUM": 32})
    rsn = rsn_from_cfg(cfg)
    variables = jax.jit(lambda r: rsn.init(
        r, jnp.zeros((1, 32, 32, 3)), train=False))(jax.random.PRNGKey(2))
    stage = uniform_stage_from_cfg(cfg)
    x_sh, skip_sh = _stage_io_shapes((8, 8), 1, jnp.float32)
    zs = [jnp.zeros(s.shape) for s in skip_sh]
    template = jax.jit(lambda r: stage.init(
        r, jnp.zeros(x_sh.shape), zs, zs, train=False))(jax.random.PRNGKey(3))
    stem_v, stacked = split_rsn_variables(variables, 4, template)
    rng = np.random.default_rng(13)
    images = rng.integers(0, 256, (8, 32, 32, 3)).astype(np.uint8)

    ref = jax.jit(lambda v, x: rsn.apply(
        v, _rsn_normalize(x), train=False, all_stages=True))(variables,
                                                             images)
    mesh = make_mesh(2, 4, devices=jax.devices()[:8])
    fwd = make_pipeline_forward(cfg, mesh, n_micro=2)
    out = jax.jit(lambda sv, st, x: fwd(sv, st, x, False)[0])(
        {"params": stem_v["params"], "batch_stats": stem_v["batch_stats"]},
        {"params": stacked["params"],
         "batch_stats": stacked["batch_stats"]}, images)
    assert out.shape[:3] == (4, 2, 4)
    for i in range(4):
        got = np.asarray(out[i, :, 3]).reshape(8, 8, 8, 17)
        np.testing.assert_allclose(got, np.asarray(ref[i][3]),
                                   rtol=2e-5, atol=2e-5)


def test_mesh_axis_mismatch_raises(setup):
    cfg = setup[0]
    mesh = make_mesh(2, 4, devices=jax.devices()[:8])   # 4 != STAGE_NUM
    with pytest.raises(ValueError, match="STAGE_NUM"):
        make_pipeline_forward(cfg, mesh, n_micro=2)


def test_pp_train_cli(tmp_path):
    """The REAL tools/train.py with TPU.PP on a (data=2, model=2) virtual
    mesh: pipelined iter-mode training runs end-to-end, the checkpoint is
    the pipelined layout, and final_state.msgpack is the MERGED standard
    RSN tree (the deployment contract)."""
    import subprocess

    from udp_pose_tpu.utils.checkpoint import load_weights

    sys.path.insert(0, os.path.dirname(__file__))
    from ref_harness import make_mini_coco

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=11)
    out = str(tmp_path / "run_pp")
    cfg_file = str(tmp_path / "pp.yaml")
    with open(cfg_file, "w") as f:
        f.write(f"""
OUTPUT_DIR: {out}
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
  IMAGE_SIZE: [32, 32]
  HEATMAP_SIZE: [8, 8]
  NUM_JOINTS: 17
  INIT_WEIGHTS: false
  EXTRA:
    STAGE_NUM: 2
    UPSAMPLE_CHANNEL_NUM: 16
    LAYERS: [1, 1, 1, 1]
TPU:
  DTYPE: float32
  PP: true
  PP_MICROBATCHES: 2
  MESH:
    DATA: 2
    MODEL: 2
TRAIN:
  BATCH_SIZE_PER_GPU: 2
  MAX_ITER: 2
  CHECKPOINT_PERIOD: 2
  WARMUP_ITERS: 1
  ITER_BASELINE_DEVICES: 2
  LR: 0.0005
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
""")
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         "--cfg", cfg_file],
        env=env, cwd=repo, capture_output=True, text=True, timeout=840)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    text = p.stdout + p.stderr
    assert "pipeline-parallel over 2 stages" in text
    # final weights are the MERGED standard tree → loadable by validate /
    # export / tools/test.py unchanged
    final = None
    for dirpath, _d, files in os.walk(out):
        if "final_state.msgpack" in files:
            final = os.path.join(dirpath, "final_state.msgpack")
    assert final, out
    tree = load_weights(final)
    assert "stage0_down" in tree["params"] and "stage1_up" in tree["params"]
    assert "stages" not in tree["params"]


def test_pp_train_cli_epoch_mode(tmp_path):
    """Epoch-mode PP (TRAIN.MAX_ITER 0): the rolling checkpoint.msgpack
    keeps the pipelined {'stem','stages'} layout (resume restores into
    it), but BOTH deployment artifacts — model_best.msgpack from the
    best-epoch save and final_state.msgpack — must be the MERGED
    standard RSN tree (round-3 review fix: they were raw pipelined)."""
    import subprocess

    from flax import serialization

    from udp_pose_tpu.utils.checkpoint import load_weights

    sys.path.insert(0, os.path.dirname(__file__))
    from ref_harness import make_mini_coco

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "data")
    make_mini_coco(root, n_images=4, seed=12)
    out = str(tmp_path / "run_pp_epoch")
    cfg_file = str(tmp_path / "pp_epoch.yaml")
    with open(cfg_file, "w") as f:
        f.write(f"""
OUTPUT_DIR: {out}
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
  IMAGE_SIZE: [32, 32]
  HEATMAP_SIZE: [8, 8]
  NUM_JOINTS: 17
  INIT_WEIGHTS: false
  EXTRA:
    STAGE_NUM: 2
    UPSAMPLE_CHANNEL_NUM: 16
    LAYERS: [1, 1, 1, 1]
TPU:
  DTYPE: float32
  PP: true
  PP_MICROBATCHES: 2
  MESH:
    DATA: 2
    MODEL: 2
TRAIN:
  BATCH_SIZE_PER_GPU: 2
  MAX_ITER: 0
  BEGIN_EPOCH: 0
  END_EPOCH: 1
  WARMUP_ITERS: 1
  LR: 0.0005
TEST:
  BATCH_SIZE_PER_GPU: 2
  USE_GT_BBOX: true
  FLIP_TEST: false
""")
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         "--cfg", cfg_file],
        env=env, cwd=repo, capture_output=True, text=True, timeout=840)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    text = p.stdout + p.stderr
    assert "pipeline-parallel over 2 stages" in text

    found = {}
    for dirpath, _d, files in os.walk(out):
        for f in ("final_state.msgpack", "model_best.msgpack",
                  "checkpoint.msgpack"):
            if f in files:
                found[f] = os.path.join(dirpath, f)
    # model_best only appears when an epoch improves perf (AP 0 on this
    # 2-step random-init run never does, reference semantics) — when it
    # exists it must be merged like final_state; its save path is the
    # same save_final the assertions below pin
    assert set(found) >= {"final_state.msgpack",
                          "checkpoint.msgpack"}, found
    for f in ("final_state.msgpack", "model_best.msgpack"):
        if f not in found:
            continue
        tree = load_weights(found[f])
        assert "stage0_down" in tree["params"], f
        assert "stages" not in tree["params"], f
    with open(found["checkpoint.msgpack"], "rb") as fh:
        ckpt = serialization.msgpack_restore(fh.read())
    assert "stages" in ckpt["state"]["params"]   # pipelined rolling ckpt


def test_4xrsn50_pp_per_chip_state_is_one_over_S():
    """The claim parallel/pipeline.py:20 makes — per-chip param+adam
    memory 1/S at 4XRSN50 scale — measured at the REAL 4×RSN-50 shapes
    (configs/coco/4xrsn50_384x288.yaml, RSN/README.md:33-34) via
    sharding metadata: eval_shape the pipelined train state (no arrays
    materialize), apply pipeline_state_sharding over a 4-stage 'model'
    axis, and account each leaf's per-device shard bytes exactly."""
    import os

    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.core.rsn import make_rsn_optimizer
    from udp_pose_tpu.parallel import make_mesh
    from udp_pose_tpu.parallel.pipeline import (create_pipelined_rsn_state,
                                                pipeline_state_sharding)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo,
                                   "configs/coco/4xrsn50_384x288.yaml"))
    S4 = cfg.MODEL.EXTRA.STAGE_NUM
    assert S4 == 4
    tx = make_rsn_optimizer(cfg.TRAIN.LR, cfg.TRAIN.WD, max_iters=100)
    state = jax.eval_shape(lambda: create_pipelined_rsn_state(
        cfg, jax.random.PRNGKey(0), tx))
    mesh = make_mesh(2, S4)              # dp2 x pp4 on the 8-device mesh
    shardings = pipeline_state_sharding(state, mesh)

    def bytes_total_and_per_chip(tree, shs):
        total = per_chip = 0
        for leaf, sh in zip(jax.tree_util.tree_leaves(tree),
                            jax.tree_util.tree_leaves(
                                shs, is_leaf=lambda x: hasattr(
                                    x, "shard_shape"))):
            n = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            shard = sh.shard_shape(leaf.shape)
            per_chip += int(np.prod(shard)) * leaf.dtype.itemsize
            total += n
        return total, per_chip

    # params + adam moments (opt_state) are the big state; stem is tiny
    tot_p, chip_p = bytes_total_and_per_chip(state.params,
                                             shardings.params)
    tot_o, chip_o = bytes_total_and_per_chip(state.opt_state,
                                             shardings.opt_state)
    tot, chip = tot_p + tot_o, chip_p + chip_o
    # 4XRSN50-scale is real model state (params+2 adam moments, fp32)
    assert tot > 800e6, tot
    # per-chip state is 1/S of the stages' state plus the replicated
    # stem; the stem is <6% of the total, so the ratio lands near 1/4
    ratio = chip / tot
    assert ratio < 1.0 / S4 + 0.06, (chip / 1e6, tot / 1e6, ratio)
    # and the dominant stacked leaves shard EXACTLY 1/S
    stages_leaves = [
        (l, s) for l, s in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(shardings.params,
                                      is_leaf=lambda x: hasattr(
                                          x, "shard_shape")))
        if l.ndim >= 1 and l.shape[0] == S4]
    assert stages_leaves
    for leaf, sh in stages_leaves[:40]:
        assert sh.shard_shape(leaf.shape)[0] == 1
