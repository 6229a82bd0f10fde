"""MPII dataset + PCKh eval end-to-end on synthetic data, incl. the .mat
ground-truth protocol (mpii.py:96-181)."""

import json
import os

import cv2
import numpy as np
import pytest
from scipy.io import savemat

from udp_pose_tpu.config import default_config

JOINT_NAMES = ["rank", "rkne", "rhip", "lhip", "lkne", "lank", "pelvis",
               "thorax", "upperneck", "head", "rwri", "relb", "rsho",
               "lsho", "lelb", "lwri"]


@pytest.fixture(scope="module")
def syn_mpii(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpii")
    (root / "annot").mkdir()
    (root / "images").mkdir()
    rng = np.random.default_rng(160)
    anno = []
    n = 4
    gt_joints = np.zeros((16, 2, n))
    headboxes = np.zeros((2, 2, n))
    for i in range(n):
        name = f"img{i}.jpg"
        cv2.imwrite(str(root / "images" / name),
                    rng.integers(0, 255, (400, 400, 3), np.uint8))
        joints = rng.uniform(120, 280, (16, 2))
        anno.append({
            "image": name,
            "center": [200.0, 200.0],
            "scale": 1.2,
            "joints": (joints + 1).tolist(),      # matlab 1-based
            "joints_vis": [1] * 16,
        })
        gt_joints[:, :, i] = joints + 1            # gt .mat is 1-based too
        headboxes[0, :, i] = [180, 120]
        headboxes[1, :, i] = [220, 170]
    with open(root / "annot" / "valid.json", "w") as f:
        json.dump(anno, f)
    savemat(str(root / "annot" / "gt_valid.mat"), {
        "dataset_joints": np.array([JOINT_NAMES], dtype=object),
        "jnt_missing": np.zeros((16, n)),
        "pos_gt_src": gt_joints,
        "headboxes_src": headboxes,
    })
    return root


def _cfg(root):
    cfg = default_config()
    cfg.DATASET.DATASET = "mpii"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "valid"
    cfg.MODEL.IMAGE_SIZE = [256, 256]
    cfg.MODEL.HEATMAP_SIZE = [64, 64]
    cfg.MODEL.NUM_JOINTS = 16
    return cfg


def test_mpii_db_and_getitem(syn_mpii):
    from udp_pose_tpu.data import build_dataset
    cfg = _cfg(syn_mpii)
    ds = build_dataset(cfg, is_train=False)
    assert len(ds) == 4
    # center y-shift + 1.25 scale + 0-based conversion (mpii.py:56-64)
    rec = ds.db[0]
    assert rec["scale"][0] == pytest.approx(1.2 * 1.25)
    assert rec["center"][1] == pytest.approx(200 + 15 * 1.2 - 1)
    s = ds[0]
    assert s["image"].shape == (256, 256, 3)
    assert s["target"].shape == (16, 64, 64)


def test_mpii_pckh_eval_perfect_predictions(syn_mpii, tmp_path):
    from udp_pose_tpu.data import build_dataset
    cfg = _cfg(syn_mpii)
    ds = build_dataset(cfg, is_train=False)
    # perfect predictions = 0-based gt joints
    preds = np.zeros((4, 16, 2), np.float32)
    for i, a in enumerate(ds.db):
        preds[i] = a["joints_3d"][:, :2]
    name_value, mean = ds.evaluate(cfg, preds, str(tmp_path))
    assert mean == pytest.approx(100.0)
    assert name_value["Mean@0.1"] == pytest.approx(100.0)
    assert os.path.exists(tmp_path / "pred.mat")
    # off-by-50px predictions crater PCKh
    name_value2, mean2 = ds.evaluate(cfg, preds + 50.0, str(tmp_path))
    assert mean2 < 5.0


def test_sharded_validate_matches_unsharded(syn_mpii, tmp_path):
    import jax
    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.parallel import make_mesh
    import jax.numpy as jnp
    cfg = _cfg(syn_mpii)
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [32, 32, 32],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    ds = build_dataset(cfg, is_train=False)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 256, 256, 3)), train=False))(jax.random.PRNGKey(0))
    nv1, perf1 = validate(cfg, ds, model, variables, str(tmp_path))
    mesh = make_mesh()
    nv2, perf2 = validate(cfg, ds, model, variables, str(tmp_path),
                          mesh=mesh)
    assert perf1 == pytest.approx(perf2, abs=1e-4)
