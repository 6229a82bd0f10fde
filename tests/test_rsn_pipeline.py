"""RSN pipeline: dataset semantics, train step learns, infer fn runs."""

import json
import os

import cv2
import jax
import numpy as np
import pytest

from udp_pose_tpu.config import default_config


@pytest.fixture(scope="module")
def syn_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("rsncoco")
    (root / "annotations").mkdir()
    (root / "images" / "val2017").mkdir(parents=True)
    rng = np.random.default_rng(120)
    images, annotations = [], []
    aid = 1
    for img_id in (1, 2):
        W, H = 400, 400
        cv2.imwrite(str(root / "images" / "val2017" / ("%012d.jpg" % img_id)),
                    rng.integers(0, 255, (H, W, 3), np.uint8))
        images.append({"id": img_id, "width": W, "height": H,
                       "file_name": "%012d.jpg" % img_id})
        kps = []
        for j in range(17):
            kps += [float(rng.uniform(150, 250)),
                    float(rng.uniform(150, 250)), 2]
        annotations.append({"id": aid, "image_id": img_id, "category_id": 1,
                            "keypoints": kps, "num_keypoints": 17,
                            "bbox": [140, 140, 120, 120], "area": 14400.0,
                            "iscrowd": 0})
        aid += 1
    with open(root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return root


def _cfg(root):
    cfg = default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "val2017"
    cfg.MODEL.NAME = "rsn"
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.MODEL.EXTRA.STAGE_NUM = 1
    cfg.MODEL.EXTRA.UPSAMPLE_CHANNEL_NUM = 64
    cfg.TEST.USE_GT_BBOX = True
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_rsn_dataset_train_sample(syn_coco):
    from udp_pose_tpu.data.rsn import RSNCOCODataset
    cfg = _cfg(syn_coco)
    ds = RSNCOCODataset(cfg, str(syn_coco), "val2017", is_train=True)
    ds.seed(0)
    s = ds[0]
    assert s["image"].shape == (256, 192, 3)
    assert s["labels"].shape == (5, 17, 64, 48)
    assert s["valid"].shape == (17, 1)
    # 255-amplitude labels for visible joints
    assert s["labels"].max() > 200
    # coarser kernels spread wider: mass ordering
    mass = s["labels"].sum(axis=(1, 2, 3))
    assert mass[0] > mass[-1]


def test_rsn_dataset_eval_sample_box_extension(syn_coco):
    from udp_pose_tpu.data.rsn import RSNCOCODataset, RSN_COCO
    cfg = _cfg(syn_coco)
    ds = RSNCOCODataset(cfg, str(syn_coco), "val2017", is_train=False)
    s = ds[0]
    assert "labels" not in s
    rec_scale = ds.db[0]["scale"]
    # test-time extension applied then aspect-fitted
    sx = rec_scale[0] * (1 + RSN_COCO["test_x_ext"])
    sy = rec_scale[1] * (1 + RSN_COCO["test_y_ext"])
    if sx > ds.w_h_ratio * sy:
        sy = sx / ds.w_h_ratio
    else:
        sx = sy * ds.w_h_ratio
    np.testing.assert_allclose(s["scale"], [sx, sy], rtol=1e-5)


def test_rsn_train_step_reduces_loss(syn_coco):
    from udp_pose_tpu.core.rsn import make_rsn_optimizer, make_rsn_train_step
    from udp_pose_tpu.core.train import TrainState
    from udp_pose_tpu.data.base import collate
    from udp_pose_tpu.data.rsn import RSNCOCODataset
    from udp_pose_tpu.models import build_model
    import jax.numpy as jnp

    cfg = _cfg(syn_coco)
    model = build_model(cfg)
    ds = RSNCOCODataset(cfg, str(syn_coco), "val2017", is_train=True)
    ds.seed(0)
    full = collate([ds[0], ds[1]])
    batch = {k: full[k] for k in ("image", "labels", "valid")}
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 256, 192, 3)), train=True))(jax.random.PRNGKey(0))
    tx = make_rsn_optimizer(5e-4, 1e-5, max_iters=100, warmup_iters=5)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = make_rsn_train_step(stage_num=1)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    assert losses[-1] < losses[0]


def test_rsn_infer_fn(syn_coco):
    from udp_pose_tpu.core.rsn import make_rsn_infer_fn
    from udp_pose_tpu.models import build_model
    import jax.numpy as jnp
    cfg = _cfg(syn_coco)
    model = build_model(cfg)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 256, 192, 3)), train=False))(jax.random.PRNGKey(0))
    infer = make_rsn_infer_fn(
        model, flip_test=True,
        flip_pairs=((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                    (13, 14), (15, 16)))
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 256, 192, 3), np.uint8)
    center = np.tile([[200.0, 200.0]], (2, 1)).astype(np.float32)
    scale = np.tile([[1.0, 1.33]], (2, 1)).astype(np.float32)
    preds, maxvals, hm = infer(variables, imgs, center, scale)
    assert preds.shape == (2, 17, 2)
    assert np.isfinite(np.asarray(preds)).all()


def test_warmup_linear_decay_schedule():
    from udp_pose_tpu.core.rsn import warmup_linear_decay
    s = warmup_linear_decay(1e-3, warmup_iters=10, max_iters=110)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(60)) == pytest.approx(5e-4)
    assert float(s(110)) == pytest.approx(0.0, abs=1e-9)
