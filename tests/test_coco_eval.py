"""Native COCO keypoint evaluator + dataset tests on synthetic data.

The evaluator replaces pycocotools (absent in this image); these tests pin
its behaviour on analytically-known cases and drive the dataset pipeline
end-to-end (json → db → __getitem__ → evaluate).
"""

import json
import os

import cv2
import numpy as np
import pytest

from udp_pose_tpu.config import default_config
from udp_pose_tpu.eval.cocoeval import COCOKeypointEval, compute_oks


def _make_gt(rng, n_images=6, people_per_image=2):
    anns, image_ids = [], []
    aid = 1
    for img_id in range(1, n_images + 1):
        image_ids.append(img_id)
        for _ in range(people_per_image):
            cx, cy = rng.uniform(100, 500, 2)
            w, h = rng.uniform(80, 160), rng.uniform(160, 300)
            kps = []
            nv = 0
            for j in range(17):
                x = cx + rng.uniform(-w / 2, w / 2)
                y = cy + rng.uniform(-h / 2, h / 2)
                v = 2 if rng.random() > 0.15 else 0
                nv += v > 0
                kps += [float(x), float(y), v]
            anns.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": nv,
                "bbox": [cx - w / 2, cy - h / 2, w, h],
                "area": float(w * h), "iscrowd": 0,
            })
            aid += 1
    return anns, image_ids


def _dets_from_gt(anns, jitter=0.0, rng=None, score=0.9):
    dets = []
    for a in anns:
        kp = np.asarray(a["keypoints"], np.float64).reshape(-1, 3).copy()
        if jitter and rng is not None:
            kp[:, :2] += rng.normal(0, jitter, (17, 2))
        kp[:, 2] = 1.0
        dets.append({"image_id": a["image_id"],
                     "keypoints": kp.ravel().tolist(), "score": score})
    return dets


def test_perfect_predictions_ap_1():
    rng = np.random.default_rng(60)
    anns, img_ids = _make_gt(rng)
    ev = COCOKeypointEval(anns, img_ids)
    nv = ev.evaluate(_dets_from_gt(anns))
    assert nv["AP"] == pytest.approx(1.0)
    assert nv["AR"] == pytest.approx(1.0)


def test_no_detections_ap_0():
    rng = np.random.default_rng(61)
    anns, img_ids = _make_gt(rng)
    ev = COCOKeypointEval(anns, img_ids)
    nv = ev.evaluate([])
    assert nv["AP"] == pytest.approx(0.0) or nv["AP"] == -1.0


def test_half_detected():
    rng = np.random.default_rng(62)
    anns, img_ids = _make_gt(rng, n_images=10, people_per_image=1)
    ev = COCOKeypointEval(anns, img_ids)
    nv = ev.evaluate(_dets_from_gt(anns[:5]))
    assert nv["AR"] == pytest.approx(0.5, abs=0.01)
    assert nv["AP"] == pytest.approx(0.5, abs=0.01)


def test_jitter_degrades_monotonically():
    rng = np.random.default_rng(63)
    anns, img_ids = _make_gt(rng, n_images=12)
    aps = []
    for jit in (0.0, 5.0, 20.0, 60.0):
        ev = COCOKeypointEval(anns, img_ids)
        nv = ev.evaluate(_dets_from_gt(anns, jitter=jit,
                                       rng=np.random.default_rng(1)))
        aps.append(nv["AP"])
    assert aps[0] == pytest.approx(1.0)
    assert all(aps[i] >= aps[i + 1] - 1e-9 for i in range(len(aps) - 1))
    assert aps[-1] < 0.9


def test_false_positives_lower_ap_not_ar():
    rng = np.random.default_rng(64)
    anns, img_ids = _make_gt(rng, n_images=8, people_per_image=1)
    dets = _dets_from_gt(anns, score=0.9)
    # junk detections with *lower* score: AP@101-pt stays, AR unaffected
    junk = []
    for a in anns:
        kp = (np.asarray(a["keypoints"]).reshape(-1, 3)
              + np.array([500.0, 500.0, 0.0])).ravel().tolist()
        junk.append({"image_id": a["image_id"], "keypoints": kp,
                     "score": 0.1})
    ev = COCOKeypointEval(anns, img_ids)
    nv = ev.evaluate(dets + junk)
    assert nv["AR"] == pytest.approx(1.0)
    # junk with *higher* score must hurt AP
    for j in junk:
        j["score"] = 0.99
    ev2 = COCOKeypointEval(anns, img_ids)
    nv2 = ev2.evaluate(dets + junk)
    assert nv2["AP"] < nv["AP"]


def test_compute_oks_formula():
    """OKS vs the closed formula for one visible keypoint pair."""
    gt = {"keypoints": [100.0, 100.0, 2] + [0.0, 0.0, 0] * 16,
          "bbox": [80, 80, 40, 40], "area": 1600.0}
    dt = {"keypoints": [103.0, 104.0, 1] + [0.0, 0.0, 0] * 16, "score": 1.0}
    oks = compute_oks([gt], [dt])[0, 0]
    sigma = 0.26 / 10.0
    e = (3.0 ** 2 + 4.0 ** 2) / ((2 * sigma) ** 2) / (1600.0 + np.spacing(1)) / 2
    assert oks == pytest.approx(np.exp(-e), rel=1e-9)


# -- dataset pipeline end-to-end -------------------------------------------

@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    """A tiny on-disk COCO val set with images."""
    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "images" / "val2017").mkdir(parents=True)
    rng = np.random.default_rng(70)
    images, annotations = [], []
    aid = 1
    for img_id in range(1, 5):
        W, H = 640, 480
        img = rng.integers(0, 255, (H, W, 3), np.uint8)
        name = "%012d.jpg" % img_id
        cv2.imwrite(str(root / "images" / "val2017" / name), img)
        images.append({"id": img_id, "width": W, "height": H,
                       "file_name": name})
        for _ in range(2):
            cx, cy = rng.uniform(150, 450), rng.uniform(150, 330)
            w, h = rng.uniform(60, 120), rng.uniform(120, 200)
            kps = []
            for j in range(17):
                kps += [float(cx + rng.uniform(-w / 3, w / 3)),
                        float(cy + rng.uniform(-h / 3, h / 3)), 2]
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17,
                "bbox": [cx - w / 2, cy - h / 2, w, h],
                "area": float(w * h), "iscrowd": 0,
            })
            aid += 1
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    with open(root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump(gt, f)
    return root


def _cfg(root):
    cfg = default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.COLOR_RGB = True
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.TEST.USE_GT_BBOX = True
    return cfg


def test_dataset_loads_and_getitem(synthetic_coco):
    from udp_pose_tpu.data import build_dataset
    cfg = _cfg(synthetic_coco)
    ds = build_dataset(cfg, is_train=False)
    assert len(ds) == 8
    sample = ds[0]
    assert sample["image"].shape == (256, 192, 3)
    assert sample["target"].shape == (17, 64, 48)
    assert sample["target_weight"].shape == (17,)
    # visible joints produce ~unit-peak gaussians (peak is at the continuous
    # sub-pixel centre, so the max *grid* value is slightly below 1)
    assert 0.95 < sample["target"].max() <= 1.0 + 1e-6


def test_dataset_train_augmentation(synthetic_coco):
    from udp_pose_tpu.data import build_dataset
    cfg = _cfg(synthetic_coco)
    cfg.DATASET.CUTOUT = [1.0, 0.2, 1]
    ds = build_dataset(cfg, image_set="val2017", is_train=True)
    ds.seed(0)
    s1 = ds[0]
    ds.seed(1)
    s2 = ds[0]
    assert not np.array_equal(s1["image"], s2["image"])  # random aug applied


def test_dataset_evaluate_perfect_predictions(synthetic_coco, tmp_path):
    """gt joints fed back as predictions ⇒ AP = 1 through the whole
    rescoring + OKS-NMS + evaluator path (coco.py:289-366 equivalent)."""
    from udp_pose_tpu.data import build_dataset
    cfg = _cfg(synthetic_coco)
    ds = build_dataset(cfg, is_train=False)
    n = len(ds)
    preds = np.zeros((n, 17, 3), np.float32)
    boxes = np.zeros((n, 6))
    paths = []
    for i, rec in enumerate(ds.db):
        preds[i, :, :2] = rec["joints_3d"][:, :2]
        preds[i, :, 2] = 0.95
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200)
        boxes[i, 5] = 1.0
        paths.append(rec["image"])
    name_values, ap = ds.evaluate(cfg, preds, str(tmp_path), boxes, paths)
    assert ap == pytest.approx(1.0)


def test_loader_shards_and_batches(synthetic_coco):
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.data.base import epoch_loader
    cfg = _cfg(synthetic_coco)
    ds = build_dataset(cfg, is_train=False)
    batches = list(epoch_loader(ds, batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 256, 192, 3)
    # sharded: two shards see disjoint-but-complete coverage
    b0 = list(epoch_loader(ds, 2, seed=0, shard_index=0, num_shards=2))
    b1 = list(epoch_loader(ds, 2, seed=0, shard_index=1, num_shards=2))
    assert len(b0) == len(b1) == 2
