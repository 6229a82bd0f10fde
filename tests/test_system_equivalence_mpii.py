"""MPII composed reference-equivalence (VERDICT r4 item 5).

The COCO system harness (test_system_equivalence.py) runs the reference's
ENTIRE torch validate pipeline against ours; this module does the same for
MPII: `deep_hrnet/lib/dataset/mpii.py` (json db :43-94, PCKh-from-.mat
evaluate :96-181) driven by `lib/core/function.py:validate` (:114-274),
vs `udp_pose_tpu.core.validate` + `data/mpii.py` on the SAME synthetic
MPII set and the SAME brief-trained weights through the flax→torch
reverse bridge — flip-test on and off — asserting

  * the accumulated pred arrays match (strict budgets: peaked heatmaps),
  * the PCKh tables (Head..Ankle, Mean, Mean@0.1) are identical,
  * pred.mat is written by both.
"""

import importlib
import json
import os

import cv2
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scipy.io import savemat

from ref_harness import (RefEvalTransform, install_reference_env,
                         reference_present)
from test_system_equivalence import (RESNET_EXTRA, _capture_evaluate,
                                     _torch_twin_from_trained)

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not reference_present(),
                                 reason="reference checkout not present")]

JOINT_NAMES = ["rank", "rkne", "rhip", "lhip", "lkne", "lank", "pelvis",
               "thorax", "upperneck", "head", "rwri", "relb", "rsho",
               "lsho", "lelb", "lwri"]

N_IMAGES = 6


@pytest.fixture(scope="module")
def mpii_root(tmp_path_factory):
    """Synthetic MPII: images + annot/valid.json (1-based, matlab style)
    + annot/gt_valid.mat in the official eval layout (mpii.py:105-117)."""
    root = tmp_path_factory.mktemp("mpii_sys")
    (root / "annot").mkdir()
    (root / "images").mkdir()
    rng = np.random.default_rng(164)
    anno = []
    gt_joints = np.zeros((16, 2, N_IMAGES))
    headboxes = np.zeros((2, 2, N_IMAGES))
    for i in range(N_IMAGES):
        name = f"img{i}.jpg"
        small = rng.integers(0, 255, (9, 9, 3)).astype(np.uint8)
        img = cv2.resize(small, (400, 400), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(root / "images" / name), img)
        joints = rng.uniform(130, 270, (16, 2))
        anno.append({
            "image": name,
            "center": [200.0, 200.0],
            "scale": 1.2,
            "joints": (joints + 1).tolist(),       # matlab 1-based
            "joints_vis": [1] * 16,
        })
        gt_joints[:, :, i] = joints + 1            # gt .mat is 1-based too
        headboxes[0, :, i] = [180, 140]
        headboxes[1, :, i] = [220, 190]
    with open(root / "annot" / "valid.json", "w") as f:
        json.dump(anno, f)
    savemat(str(root / "annot" / "gt_valid.mat"), {
        "dataset_joints": np.array([JOINT_NAMES], dtype=object),
        "jnt_missing": np.zeros((16, N_IMAGES)),
        "pos_gt_src": gt_joints,
        "headboxes_src": headboxes,
    })
    return root


def _mpii_cfg(root, flip):
    from udp_pose_tpu.config import default_config
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [256, 256]
    cfg.MODEL.HEATMAP_SIZE = [64, 64]
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.SIGMA = 2
    cfg.MODEL.EXTRA.merge_from_dict(dict(
        RESNET_EXTRA, NUM_DECONV_FILTERS=[64, 64, 64]))
    cfg.TPU.DTYPE = "float32"
    cfg.DATASET.DATASET = "mpii"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "valid"
    cfg.DATASET.COLOR_RGB = True
    cfg.TEST.FLIP_TEST = flip
    cfg.TEST.POST_PROCESS = True
    cfg.TEST.BATCH_SIZE_PER_GPU = 3
    cfg.LOSS.USE_TARGET_WEIGHT = True
    cfg.PRINT_FREQ = 1000
    return cfg


@pytest.fixture(scope="module")
def trained(mpii_root):
    """Brief-train the tiny pose_resnet on the valid set to peaked
    heatmaps (the COCO harness's strict-mode recipe)."""
    import jax

    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                         normalize_images)
    from udp_pose_tpu.data.base import epoch_loader
    from udp_pose_tpu.data.mpii import MPIIDataset
    from udp_pose_tpu.models import build_model

    cfg = _mpii_cfg(mpii_root, flip=False)
    tcfg = cfg.clone()
    tcfg.DATASET.TRAIN_SET = "valid"       # overfit the eval images
    # flip aug ON: the flip-test case averages a mirrored forward, so the
    # mirrored views must ALSO peak decisively or fp32 torch-vs-XLA noise
    # can tie-flip an argmax on the folded heatmap
    tcfg.DATASET.FLIP = True
    tcfg.DATASET.SCALE_FACTOR = 0.0
    tcfg.DATASET.ROT_FACTOR = 0
    tcfg.DATASET.PROB_HALF_BODY = 0.0
    fmodel = build_model(tcfg)
    train_ds = MPIIDataset(tcfg, str(mpii_root), "valid", True)
    state = create_train_state(tcfg, fmodel, jax.random.PRNGKey(7), 10)
    step = make_train_step(make_loss_fn(tcfg))
    metrics = {}
    for ep in range(40):
        train_ds.seed(ep)
        for b in epoch_loader(train_ds, 6, shuffle=True, seed=ep,
                              drop_last=False):
            db = {"image": normalize_images(b["image"]),
                  "target": b["target"],
                  "target_weight": b["target_weight"]}
            state, metrics = step(state, db)
    assert float(metrics["loss"]) < 0.02, float(metrics["loss"])
    return fmodel, {"params": state.params, "batch_stats": state.batch_stats}


def _run_reference_mpii(cfg, root, out_dir, tmodel):
    install_reference_env()
    ref_mpii = importlib.import_module("dataset.mpii")
    ref_function = importlib.import_module("lib.core.function")
    ref_loss = importlib.import_module("lib.core.loss")

    ds = ref_mpii.MPIIDataset(cfg, str(root), "valid", False,
                              RefEvalTransform())
    loader = torch.utils.data.DataLoader(
        ds, batch_size=cfg.TEST.BATCH_SIZE_PER_GPU, shuffle=False,
        num_workers=0)
    criterion = ref_loss.JointsMSELoss(
        use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
    captured = _capture_evaluate(ds)
    os.makedirs(out_dir, exist_ok=True)
    ref_function.validate(cfg, loader, ds, tmodel, criterion, out_dir, "",
                          None)
    return captured


def _run_ours_mpii(cfg, root, out_dir, fmodel, variables):
    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data.mpii import MPIIDataset

    ds = MPIIDataset(cfg, str(root), "valid", False)
    captured = _capture_evaluate(ds)
    os.makedirs(out_dir, exist_ok=True)
    validate(cfg, ds, fmodel, variables, output_dir=out_dir)
    return captured


@pytest.mark.parametrize("flip", [False, True])
def test_mpii_composed_equivalence(mpii_root, trained, tmp_path, flip):
    fmodel, variables = trained
    cfg = _mpii_cfg(mpii_root, flip=flip)
    tmodel = _torch_twin_from_trained(cfg, variables)

    ref = _run_reference_mpii(cfg, mpii_root,
                              str(tmp_path / f"ref{int(flip)}"), tmodel)
    ours = _run_ours_mpii(cfg, mpii_root,
                          str(tmp_path / f"ours{int(flip)}"),
                          fmodel, variables)

    # composed pred arrays (source-image coords after transform_preds)
    assert ref["preds"].shape == ours["preds"].shape == (N_IMAGES, 16, 3)
    coord_err = np.abs(ours["preds"][:, :, :2] - ref["preds"][:, :, :2])
    assert np.mean(coord_err < 0.05) > 0.98, np.mean(coord_err < 0.05)
    assert coord_err.max() < 5.0, coord_err.max()
    np.testing.assert_allclose(ours["preds"][:, :, 2],
                               ref["preds"][:, :, 2], atol=1e-3)

    # the PCKh table — the reference's .mat protocol (mpii.py:96-181)
    # vs ours — must agree value for value
    ref_nv, ours_nv = dict(ref["nv"][0]), dict(ours["nv"][0])
    assert set(ref_nv) == set(ours_nv)
    for k in ref_nv:
        np.testing.assert_allclose(ours_nv[k], ref_nv[k], atol=1e-6,
                                   err_msg=k)
    # both pipelines wrote the official pred.mat artifact
    assert os.path.exists(tmp_path / f"ref{int(flip)}" / "pred.mat")
    assert os.path.exists(tmp_path / f"ours{int(flip)}" / "pred.mat")
