"""Utils: vis grids, zipreader, checkpoint round-trip + AUTO_RESUME."""

import os
import zipfile

import cv2
import jax
import numpy as np

from udp_pose_tpu.config import default_config
from udp_pose_tpu.utils import vis, zipreader


def test_vis_debug_images(tmp_path):
    cfg = default_config()
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_PRED = True
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 64, 48, 3), np.uint8)
    joints = rng.uniform(5, 40, (4, 17, 2))
    vis_flags = np.ones((4, 17, 1))
    target = rng.uniform(0, 1, (4, 17, 16, 12)).astype(np.float32)
    prefix = str(tmp_path / "dbg")
    vis.save_debug_images(cfg, imgs, joints, vis_flags, target, target,
                          prefix)
    assert os.path.exists(prefix + "_gt.jpg")
    assert os.path.exists(prefix + "_hm_gt.jpg")
    assert os.path.exists(prefix + "_hm_pred.jpg")
    grid = cv2.imread(prefix + "_hm_gt.jpg")
    assert grid.shape == (4 * 16, 18 * 12, 3)


def test_zipreader_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 40, 3), np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    zpath = str(tmp_path / "images.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("sub/pic.png", png)
    out = zipreader.imread(f"{zpath}@sub/pic.png")
    np.testing.assert_array_equal(out, img)
    assert zipreader.is_zip_path(f"{zpath}@x")
    assert not zipreader.is_zip_path("/plain/path.jpg")


def test_checkpoint_roundtrip_and_resume(tmp_path):
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import create_train_state, make_train_step
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.checkpoint import (load_checkpoint,
                                               save_checkpoint)
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
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    step = make_train_step(make_loss_fn(cfg))
    rng = np.random.default_rng(2)
    batch = {"image": rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32),
             "target": rng.uniform(0, 1, (2, 17, 16, 16)).astype(np.float32),
             "target_weight": np.ones((2, 17), np.float32)}
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    save_checkpoint(str(tmp_path), state, epoch=3, perf=0.5, is_best=True)
    assert (tmp_path / "checkpoint.msgpack").exists()
    assert (tmp_path / "model_best.msgpack").exists()

    fresh = create_train_state(cfg, model, jax.random.PRNGKey(1), 10)
    restored, begin_epoch, best, skip = load_checkpoint(str(tmp_path), fresh)
    assert begin_epoch == 4 and best == 0.5 and skip == 0
    assert int(restored.step) == 2
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # resumed state steps identically to the original
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
