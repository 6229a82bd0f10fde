"""RSN data pipeline: attribute constants + dataset with RSN semantics.

Parity: RSN/dataset/attribute.py:8-100 (constants), RSN/dataset/
JointsDataset.py:124-224 (__getitem__: basic/random box extension, aspect
fit, shrink-scale aug, inverse-warp joint transform with out-of-bounds
invalidation, multi-kernel 255-scale label pyramid), and RSN/dataset/COCO/
coco.py (gt/det loading).  Built on the shared COCO/MPII json parsing of
data/coco.py — the RSN variant differs only in augmentation + targets.
"""

from __future__ import annotations

import copy

import cv2
import numpy as np

from ..ops.affine import udp_rotate_joints_np, udp_warp_matrix_np
from ..ops.targets import rsn_targets_np
from .coco import COCODataset

# RSN/dataset/attribute.py constants (COCO)
RSN_COCO = dict(
    basic_ext=0.05, rand_ext=True, x_ext=0.6, y_ext=0.8,
    scale_factor_low=-0.25, scale_factor_high=0.25, scale_shrink_ratio=0.8,
    rotation_factor=45, prob_rotation=0.5, prob_flip=0.5,
    num_keypoints_half_body=3, prob_half_body=0.3,
    x_ext_half_body=0.6, y_ext_half_body=0.8,
    gaussian_kernels=(15, 11, 9, 7, 5),
    test_x_ext=0.09, test_y_ext=0.135,
    test_shift_ratios=(0.25,), test_gaussian_kernel=5,
)
RSN_MPII = dict(
    basic_ext=0.0, rand_ext=False, x_ext=0.25, y_ext=0.25,
    scale_factor_low=-0.25, scale_factor_high=0.25, scale_shrink_ratio=1.0,
    rotation_factor=60, prob_rotation=0.5, prob_flip=0.5,
    num_keypoints_half_body=8, prob_half_body=0.5,
    x_ext_half_body=0.6, y_ext_half_body=0.6,
    gaussian_kernels=(15, 11, 9, 7, 5),
    test_x_ext=0.25, test_y_ext=0.25,
    test_shift_ratios=(0.25,), test_gaussian_kernel=9,
)


class RSNCOCODataset(COCODataset):
    """COCO with RSN augmentation + multi-kernel 255-scale targets.

    Sample dict: image (H,W,3 uint8), labels (5, J, h, w), valid (J, 1),
    plus center/scale/score/image_path meta (RSN JointsDataset.py:222-224).
    """

    kp_load_min_num = 1  # RSN/dataset/attribute.py KEYPOINT.LOAD_MIN_NUM

    def __init__(self, cfg, root, image_set, is_train):
        super().__init__(cfg, root, image_set, is_train)
        self.attr = dict(RSN_COCO)
        self.w_h_ratio = self.aspect_ratio

    # -- db: RSN semantics, NOT deep_hrnet's --------------------------------

    def _xywh2cs(self, x, y, w, h):
        """RSN _bbox_to_center_and_scale (RSN/dataset/COCO/coco.py:128-138):
        raw box → center/scale — no aspect-ratio fit, no ×1.25 inflation
        (the aspect fit + test extension happen inside __getitem__)."""
        center = np.array([x + w / 2.0, y + h / 2.0], np.float32)
        scale = np.array([w / self.pixel_std, h / self.pixel_std], np.float32)
        return center, scale

    def _load_gt_db(self):
        """RSN gt loading (RSN/dataset/COCO/coco.py:53-90): global ann-file
        order, crowd filter, visible-count/num_keypoints filters, RAW vis
        flags kept (they gate the loss at >1/>0 thresholds,
        RSN/lib/utils/loss.py:30,37) — no bbox sanitising."""
        db = []
        for obj in self._ann_list:
            image_id = obj["image_id"]
            if image_id not in self._images or obj.get("iscrowd"):
                continue
            joints = np.asarray(obj["keypoints"], np.float64).reshape(-1, 3)
            if (joints[:, 2] > 0).sum() < self.kp_load_min_num or \
                    obj.get("num_keypoints", 0) == 0:
                continue
            center, scale = self._xywh2cs(*np.asarray(obj["bbox"],
                                                      np.float64)[:4])
            vis = np.zeros((self.num_joints, 3))
            vis[:, 0] = joints[:, 2]
            vis[:, 1] = joints[:, 2]
            db.append({
                "image": self.image_path(image_id), "image_id": image_id,
                "center": center, "scale": scale,
                "joints_3d": joints, "joints_3d_vis": vis,
            })
        return db

    def _load_detection_db(self):
        """RSN det loading (RSN/dataset/COCO/coco.py:92-125): every person
        det whose image exists is kept — no score threshold."""
        import json
        with open(self.bbox_file) as f:
            dets = json.load(f)
        db = []
        for det in dets:
            if det.get("category_id") != 1 or \
                    det["image_id"] not in self._images:
                continue
            center, scale = self._xywh2cs(*np.asarray(det["bbox"],
                                                      np.float64)[:4])
            db.append({
                "image": self.image_path(det["image_id"]),
                "image_id": det["image_id"],
                "center": center, "scale": scale,
                "score": det["score"],
                "joints_3d": np.zeros((self.num_joints, 3)),
                "joints_3d_vis": np.zeros((self.num_joints, 3)),
            })
        return db

    # -- evaluation: RSN protocol -------------------------------------------

    def evaluate(self, cfg, preds, output_dir, all_boxes, img_path,
                 *args, **kwargs):
        """RSN results protocol (RSN/exps/RSN18.coco/test.py:98-116,186-195):
        score = det_score × mean of ALL keypoint maxvals (no visibility
        threshold), and NO OKS-NMS — every detection keeps one result."""
        import json
        import os
        from ..eval.cocoeval import COCOKeypointEval
        results = []
        for i, kpt in enumerate(preds):
            kpt = np.asarray(kpt)
            image_id = int(os.path.basename(str(img_path[i]))[-16:-4])
            results.append({
                "image_id": image_id,
                "category_id": self._person_cat_id,
                "keypoints": kpt.ravel().tolist(),
                "score": float(all_boxes[i][5]) * float(kpt[:, 2].mean()),
            })
        if output_dir:
            res_dir = os.path.join(output_dir, "results")
            os.makedirs(res_dir, exist_ok=True)
            with open(os.path.join(
                    res_dir,
                    f"keypoints_{self.image_set}_results_0.json"), "w") as f:
                json.dump(results, f, sort_keys=True, indent=4)
        if "test" in self.image_set:
            return {"Null": 0}, 0
        gt_anns = [a for anns in self._anns_by_image.values() for a in anns]
        name_values = COCOKeypointEval(gt_anns,
                                       self.image_ids).evaluate(results)
        return name_values, name_values["AP"]

    def half_body_transform_rsn(self, joints, joints_vis, rng):
        """RSN variant (JointsDataset.py:232-274): midpoint centre, random
        extension, no 1.5 inflation."""
        upper, lower = [], []
        for j in range(self.num_joints):
            if joints_vis[j, 0] > 0:
                (upper if j in self.upper_body_ids else lower).append(joints[j])
        selected = (upper if (rng.standard_normal() < 0.5 and len(upper) > 3)
                    else (lower if len(lower) > 3 else upper))
        if len(selected) < 3:
            return None, None
        selected = np.array(selected, np.float32)
        lt, rb = selected.min(0), selected.max(0)
        center = (lt + rb) / 2
        w = (rb[0] - lt[0]) * (1 + rng.random() * self.attr["x_ext_half_body"])
        h = (rb[1] - lt[1]) * (1 + rng.random() * self.attr["y_ext_half_body"])
        if w > self.w_h_ratio * h:
            h = w / self.w_h_ratio
        else:
            w = h * self.w_h_ratio
        return center, np.array([w / self.pixel_std, h / self.pixel_std],
                                np.float32)

    def __getitem__(self, idx):
        rec = copy.deepcopy(self.db[idx])
        rng = self._rng
        a = self.attr
        img = self._read_image(rec["image"])
        joints = rec["joints_3d"][:, :2].copy()
        joints_vis = rec["joints_3d_vis"][:, :1].copy()
        center = np.asarray(rec["center"], np.float64).copy()
        scale = np.asarray(rec["scale"], np.float64).copy()
        score = rec.get("score", 1)
        rotation = 0.0

        if self.is_train:
            scale[0] *= (1 + a["basic_ext"])
            scale[1] *= (1 + a["basic_ext"])
            r0 = rng.random() if a["rand_ext"] else 1.0
            scale[0] *= (1 + r0 * a["x_ext"])
            r1 = rng.random() if a["rand_ext"] else 1.0
            scale[1] *= (1 + r1 * a["y_ext"])
        else:
            scale[0] *= (1 + a["test_x_ext"])
            scale[1] *= (1 + a["test_y_ext"])

        if scale[0] > self.w_h_ratio * scale[1]:
            scale[1] = scale[0] / self.w_h_ratio
        else:
            scale[0] = scale[1] * self.w_h_ratio

        if self.is_train:
            if (np.sum(joints_vis[:, 0] > 0) > a["num_keypoints_half_body"]
                    and rng.random() < a["prob_half_body"]):
                c_hb, s_hb = self.half_body_transform_rsn(joints, joints_vis,
                                                          rng)
                if c_hb is not None:
                    center, scale = c_hb.astype(np.float64), \
                        s_hb.astype(np.float64)
            rand = rng.uniform(1 + a["scale_factor_low"],
                               1 + a["scale_factor_high"])
            scale = scale * (a["scale_shrink_ratio"] * rand)
            if rng.random() <= a["prob_rotation"]:
                rotation = rng.uniform(-a["rotation_factor"],
                                       a["rotation_factor"])
            if rng.random() <= a["prob_flip"]:
                # RSN flip_joints (RSN/lib/utils/transforms.py:70-79):
                # mirror x, swap pairs — no visibility zeroing
                img = img[:, ::-1, :]
                joints[:, 0] = img.shape[1] - joints[:, 0] - 1
                for p, q in self.flip_pairs:
                    joints[[p, q]] = joints[[q, p]]
                    joints_vis[[p, q]] = joints_vis[[q, p]]
                center[0] = img.shape[1] - center[0] - 1

        wh = (int(self.image_size[0]), int(self.image_size[1]))
        trans = udp_warp_matrix_np(rotation, center, scale, wh)
        crop = cv2.warpAffine(img, trans, wh,
                              flags=cv2.WARP_INVERSE_MAP | cv2.INTER_LINEAR)

        sample = {
            "image": np.ascontiguousarray(crop),
            "center": center.astype(np.float32),
            "scale": scale.astype(np.float32),
            "score": np.float32(score),
            "image_path": rec["image"],
        }
        if self.is_train:
            # joints → crop space via the inverse warp; out-of-bounds joints
            # invalidated (RSN JointsDataset.py:203-211)
            mapped = udp_rotate_joints_np(joints, rotation, center, scale, wh)
            valid = joints_vis[:, 0].copy()
            w, h = wh
            for j in range(self.num_joints):
                if valid[j] > 0:
                    if not (0 <= mapped[j, 0] <= w - 1
                            and 0 <= mapped[j, 1] <= h - 1):
                        valid[j] = 0
            labels = rsn_targets_np(mapped, valid, tuple(self.heatmap_size),
                                    tuple(self.image_size),
                                    a["gaussian_kernels"])
            sample["labels"] = labels
            sample["valid"] = valid.reshape(-1, 1).astype(np.float32)
        return sample


class RSNMPIIDataset(RSNCOCODataset):
    """RSN augmentation over the MPII db (attribute.py MPII constants)."""

    def __init__(self, cfg, root, image_set, is_train):
        from .mpii import MPIIDataset
        # reuse MPII's db/meta; graft RSN attrs on top
        mp = MPIIDataset(cfg, root, image_set, is_train)
        # shallow adopt
        self.__dict__.update(mp.__dict__)
        self.num_joints = MPIIDataset.num_joints
        self.flip_pairs = MPIIDataset.flip_pairs
        self.upper_body_ids = MPIIDataset.upper_body_ids
        self.lower_body_ids = MPIIDataset.lower_body_ids
        self.attr = dict(RSN_MPII)
        self.w_h_ratio = self.aspect_ratio
        self.evaluate = mp.evaluate
