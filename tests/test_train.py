"""Train-step smoke + multi-device pjit tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from udp_pose_tpu.config import default_config
from udp_pose_tpu.core.loss import make_loss_fn
from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                     multistep_lr, normalize_images)
from udp_pose_tpu.models import build_model
from udp_pose_tpu.parallel import make_mesh, shard_batch


def _tiny_cfg():
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_LAYERS = 3
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [64, 64, 64]
    cfg.MODEL.EXTRA.NUM_DECONV_KERNELS = [4, 4, 4]
    cfg.MODEL.EXTRA.DECONV_WITH_BIAS = False
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    cfg.TPU.DTYPE = "float32"
    return cfg


def _batch(rng, B=8, J=17, img=64, hm=16):
    return {
        "image": rng.uniform(-1, 1, (B, img, img, 3)).astype(np.float32),
        "target": rng.uniform(0, 1, (B, J, hm, hm)).astype(np.float32),
        "target_weight": np.ones((B, J), np.float32),
    }


def test_multistep_lr_schedule():
    sched = multistep_lr(1e-3, [2, 4], 0.1, steps_per_epoch=10)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(15), 1e-3)       # epoch 1: not yet decayed
    assert np.isclose(sched(25), 1e-3 * 0.1)  # epoch 2
    assert np.isclose(sched(45), 1e-3 * 0.01)  # epoch 4


def test_normalize_images_matches_torchvision():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    gold = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-6)


def test_train_step_reduces_loss():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(make_loss_fn(cfg))
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_train_step_sharded_over_mesh():
    """The same step with the batch sharded over 8 devices — numerical
    equivalence with the single-device run (grad all-reduce via GSPMD)."""
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(make_loss_fn(cfg))
    rng = np.random.default_rng(2)
    batch = _batch(rng, B=8)

    _, m_single = step(state, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                steps_per_epoch=10)
    sharded = shard_batch(mesh, batch)
    _, m_sharded = step(state2, sharded)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-4)


def test_infer_fn_flip_test_consistency():
    """Flip-test on a fresh model must roughly agree with no-flip decode on
    symmetric input (smoke: shapes + finite values)."""
    from udp_pose_tpu.core.infer import make_infer_fn
    cfg = _tiny_cfg()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    infer = make_infer_fn(model, target_type="gaussian", flip_test=True,
                          post_process=False)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    center = np.tile(np.array([[100.0, 100.0]], np.float32), (4, 1))
    scale = np.tile(np.array([[0.8, 0.8]], np.float32), (4, 1))
    preds, maxvals, hm = infer(variables, imgs, center, scale)
    assert preds.shape == (4, 17, 2)
    assert maxvals.shape == (4, 17, 1)
    assert np.isfinite(np.asarray(preds)).all()


def test_multihost_helpers_single_process():
    from udp_pose_tpu.parallel.multihost import (gather_eval_results,
                                                 global_batch_from_local,
                                                 initialize_distributed,
                                                 process_shard_info)
    initialize_distributed(num_processes=1)  # no-op path
    idx, n = process_shard_info()
    assert idx == 0 and n == 1
    mesh = make_mesh()
    rng = np.random.default_rng(7)
    local = {"image": rng.uniform(size=(8, 4, 4, 3)).astype(np.float32)}
    out = global_batch_from_local(mesh, local)
    assert out["image"].shape == (8, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out["image"]), local["image"])
    p, b, paths = gather_eval_results(np.zeros((3, 17, 3)),
                                      np.zeros((3, 6)), ["a", "b", "c"])
    assert p.shape == (3, 17, 3) and paths == ["a", "b", "c"]
