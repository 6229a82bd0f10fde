"""Coverage for the less-travelled augmentation/dataset paths:
half-body transform, select_data filtering, RSN-over-MPII graft."""

import json

import cv2
import numpy as np
import pytest

from udp_pose_tpu.config import default_config


def _coco_cfg(root):
    cfg = default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "val2017"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.TEST.USE_GT_BBOX = True
    return cfg


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("aug_coco")
    (root / "annotations").mkdir()
    (root / "images" / "val2017").mkdir(parents=True)
    rng = np.random.default_rng(210)
    cv2.imwrite(str(root / "images" / "val2017" / ("%012d.jpg" % 1)),
                rng.integers(0, 255, (400, 400, 3), np.uint8))
    kps = []
    for j in range(17):
        kps += [float(150 + 5 * j), float(120 + 8 * j), 2]
    ann = {"id": 1, "image_id": 1, "category_id": 1, "keypoints": kps,
           "num_keypoints": 17, "bbox": [130, 100, 120, 180],
           "area": 21600.0, "iscrowd": 0}
    with open(root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump({"images": [{"id": 1, "width": 400, "height": 400,
                               "file_name": "%012d.jpg" % 1}],
                   "annotations": [ann],
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return root


def test_half_body_transform_forced(tiny_coco):
    from udp_pose_tpu.data import build_dataset
    cfg = _coco_cfg(tiny_coco)
    cfg.DATASET.PROB_HALF_BODY = 1.0
    cfg.DATASET.NUM_JOINTS_HALF_BODY = 8
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.ROT_FACTOR = 0.0
    cfg.DATASET.FLIP = False
    ds = build_dataset(cfg, image_set="val2017", is_train=True)
    full_c = ds.db[0]["center"].copy()
    ds.seed(0)
    s = ds[0]
    # half-body replaces the centre/scale (×1.5 of sub-box, aspect-fitted)
    assert not np.allclose(s["center"], full_c)
    # reference semantics direct: upper-body mean when selected
    rng = np.random.default_rng(1)
    c, sc = ds.half_body_transform(ds.db[0]["joints_3d"],
                                   ds.db[0]["joints_3d_vis"], rng)
    assert c is not None and sc.shape == (2,)
    assert sc[0] / sc[1] == pytest.approx(ds.aspect_ratio, rel=1e-5)


def test_select_data_ks_filter(tiny_coco):
    from udp_pose_tpu.data import build_dataset
    cfg = _coco_cfg(tiny_coco)
    ds = build_dataset(cfg, image_set="val2017", is_train=False)
    kept = ds.select_data(list(ds.db))
    assert len(kept) <= len(ds.db)
    # a record whose joints are far from the box centre must be dropped
    bad = dict(ds.db[0])
    bad = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in bad.items()}
    bad["joints_3d"] = bad["joints_3d"].copy()
    bad["joints_3d"][:, 0] += 5000.0
    assert ds.select_data([bad]) == []


@pytest.fixture(scope="module")
def tiny_mpii(tmp_path_factory):
    root = tmp_path_factory.mktemp("aug_mpii")
    (root / "annot").mkdir()
    (root / "images").mkdir()
    rng = np.random.default_rng(211)
    cv2.imwrite(str(root / "images" / "img0.jpg"),
                rng.integers(0, 255, (300, 300, 3), np.uint8))
    anno = [{"image": "img0.jpg", "center": [150.0, 150.0], "scale": 1.0,
             "joints": (rng.uniform(100, 200, (16, 2)) + 1).tolist(),
             "joints_vis": [1] * 16}]
    with open(root / "annot" / "valid.json", "w") as f:
        json.dump(anno, f)
    return root


def test_rsn_mpii_graft(tiny_mpii):
    from udp_pose_tpu.data.rsn import RSNMPIIDataset, RSN_MPII
    cfg = default_config()
    cfg.DATASET.DATASET = "mpii"
    cfg.DATASET.ROOT = str(tiny_mpii)
    cfg.DATASET.TEST_SET = "valid"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    ds = RSNMPIIDataset(cfg, str(tiny_mpii), "valid", is_train=True)
    assert ds.num_joints == 16
    assert ds.attr == RSN_MPII
    ds.seed(0)
    s = ds[0]
    assert s["image"].shape == (128, 96, 3)
    assert s["labels"].shape == (5, 16, 32, 24)
    assert s["valid"].shape == (16, 1)
    # eval sample uses the MPII test extensions
    ds_eval = RSNMPIIDataset(cfg, str(tiny_mpii), "valid", is_train=False)
    s2 = ds_eval[0]
    assert "labels" not in s2
