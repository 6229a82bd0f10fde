"""In-process composition harness for the /root/reference torch pipelines.

Lets tests run the reference's *composed* systems (e.g. the full
`deep_hrnet/lib/core/function.py:validate` → `lib/dataset/coco.py:evaluate`
chain) on this CUDA-less, pycocotools-less image:

* puts ``deep_hrnet`` and ``deep_hrnet/lib`` on ``sys.path`` (the reference
  mixes ``from lib.core...`` and ``from dataset...`` import styles);
* stubs the import-time-only dependencies the image lacks — pycocotools
  (mini COCO api over the json), json_tricks (std json is a drop-in for the
  data shapes used), torchvision (only ``utils.make_grid`` inside the
  DEBUG-gated vis path), and the compiled ``nms.cpu_nms``/``nms.gpu_nms``
  extensions (imported at ``lib/nms/nms.py:13-14`` but unused by the
  OKS-NMS eval path);
* neuters ``.cuda()`` (the reference hard-codes it, `function.py:152-170`);
* restores numpy 1.x aliases (``np.float``) the reference still uses.

Also provides the synthetic mini-COCO builder (images + annotation json +
detector-box json on disk) both frameworks consume identically.

Nothing from the reference is copied — its modules are imported read-only
at test time.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import types
from collections import defaultdict

import numpy as np

REF_ROOT = "/root/reference"
DEEP_HRNET = os.path.join(REF_ROOT, "deep_hrnet")
DEEP_LIB = os.path.join(DEEP_HRNET, "lib")
RSN_ROOT = os.path.join(REF_ROOT, "RSN")


def reference_present():
    return os.path.isdir(DEEP_LIB)


# top-level package names defined by BOTH (or either) reference tree —
# deep_hrnet/lib/* and RSN/* collide on lib/dataset/utils/config/...
_CONTESTED = ("lib", "dataset", "utils", "nms", "config", "core", "models",
              "cvpack", "exps", "refmodels")


def _purge_reference_modules():
    """Drop cached modules for the contested reference package names.

    The deep_hrnet and RSN trees both define top-level ``lib``/``dataset``/
    ``utils``/``config`` packages with *different* contents, so tests that
    compose either stack must claim the namespace exclusively.  Never
    touches ``__path__`` (iterating a _NamespacePath whose parent is
    already purged raises)."""
    for name in list(sys.modules):
        if name.split(".")[0] not in _CONTESTED:
            continue
        mod = sys.modules[name]
        origin = getattr(mod, "__file__", None)
        if origin is None:
            origin = getattr(getattr(mod, "__spec__", None), "origin", None)
        # reference-origin modules and origin-less (namespace) packages go;
        # anything provably from outside /root/reference stays
        if origin and origin != "namespace" and \
                not str(origin).startswith(REF_ROOT):
            continue
        del sys.modules[name]


def claim_namespace(roots, others):
    """Make ``roots`` the only reference trees importable by bare name."""
    for p in others:
        while p in sys.path:
            sys.path.remove(p)
    _purge_reference_modules()
    for p in roots:
        if p not in sys.path:
            sys.path.insert(0, p)


def claim_rsn_namespace():
    claim_namespace([RSN_ROOT], [DEEP_HRNET, DEEP_LIB])


# ---------------------------------------------------------------------------
# pycocotools stand-ins (only what the reference dataset actually calls)
# ---------------------------------------------------------------------------

class StubCOCO:
    """Minimal pycocotools.coco.COCO over a keypoints annotation json.

    Covers the calls in deep_hrnet/lib/dataset/coco.py: getCatIds, loadCats,
    getImgIds, loadImgs, getAnnIds(imgIds=..., iscrowd=False), loadAnns,
    loadRes.  Ann order within an image is file order (pycocotools keeps
    insertion order per image too, via createIndex's append loop).
    """

    def __init__(self, ann_file):
        with open(ann_file) as f:
            self.dataset = json.load(f)
        self.imgs = {im["id"]: im for im in self.dataset.get("images", [])}
        self.cats = {c["id"]: c for c in self.dataset.get("categories", [])}
        self.anns = {}
        self._by_img = defaultdict(list)
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self._by_img[ann["image_id"]].append(ann)

    def getCatIds(self):
        return sorted(self.cats)

    def loadCats(self, ids):
        ids = ids if isinstance(ids, (list, tuple)) else [ids]
        return [self.cats[i] for i in ids]

    def getImgIds(self):
        return sorted(self.imgs)

    def loadImgs(self, ids):
        ids = ids if isinstance(ids, (list, tuple)) else [ids]
        return [self.imgs[i] for i in ids]

    def getAnnIds(self, imgIds=None, iscrowd=None):
        if imgIds is None:
            anns = [a for aa in self._by_img.values() for a in aa]
        else:
            img_ids = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
            anns = [a for i in img_ids for a in self._by_img.get(i, [])]
        if iscrowd is not None:
            anns = [a for a in anns if bool(a.get("iscrowd", 0)) == bool(iscrowd)]
        return [a["id"] for a in anns]

    def loadAnns(self, ids):
        ids = ids if isinstance(ids, (list, tuple)) else [ids]
        return [self.anns[i] for i in ids]

    def loadRes(self, res_file):
        with open(res_file) as f:
            return json.load(f)


class StubCOCOeval:
    """No-op COCOeval: AP comes from our native evaluator; the equivalence
    tests compare the *pre-eval* arrays and the written results json."""

    def __init__(self, *a, **k):
        self.params = types.SimpleNamespace(useSegm=None)
        self.stats = np.zeros(10)

    def evaluate(self):
        pass

    def accumulate(self):
        pass

    def summarize(self):
        pass


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


_installed = False


def install_reference_env():
    """Paths + stubs + numpy/cuda shims.  The namespace claim runs on
    every call (another test may have claimed the RSN tree in between);
    the stub installation is one-time."""
    claim_namespace([DEEP_HRNET, DEEP_LIB], [RSN_ROOT])
    _seed_nms_stubs()
    global _installed
    if _installed:
        return
    # numpy 1.x aliases (removed in numpy 2; the reference uses np.float)
    for name, val in (("float", float), ("int", int), ("bool", bool)):
        if name not in np.__dict__:
            setattr(np, name, val)

    import torch

    def _identity_cuda(self, *a, **k):
        return self

    torch.Tensor.cuda = _identity_cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if "pycocotools" not in sys.modules:
        pkg = _module("pycocotools")
        pkg.__path__ = []
        sys.modules["pycocotools"] = pkg
        sys.modules["pycocotools.coco"] = _module("pycocotools.coco",
                                                  COCO=StubCOCO)
        sys.modules["pycocotools.cocoeval"] = _module("pycocotools.cocoeval",
                                                      COCOeval=StubCOCOeval)
    if "json_tricks" not in sys.modules:
        sys.modules["json_tricks"] = _module(
            "json_tricks", dump=json.dump, dumps=json.dumps,
            load=json.load, loads=json.loads)
    if "torchvision" not in sys.modules:
        def _unused(*a, **k):
            raise RuntimeError("torchvision stub: only present for import")
        tvu = _module("torchvision.utils", make_grid=_unused)
        tvm = _module("torchvision.models", mobilenet_v3_small=_unused,
                      mobilenet_v3_large=_unused)
        tv = _module("torchvision", utils=tvu, models=tvm)
        tv.__path__ = []
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
        sys.modules["torchvision.models"] = tvm
    _installed = True


def _seed_nms_stubs():
    """The compiled nms extensions are imported at lib/nms/nms.py:13-14 but
    unused by the pure-python OKS path; seed fakes.  Runs every claim (the
    namespace purge removes them — 'nms' is a contested name)."""
    for ext in ("cpu_nms", "gpu_nms"):
        name = f"nms.{ext}"
        if name not in sys.modules:
            def _unbuilt(*a, **k):
                raise RuntimeError("compiled nms extension not built")
            sys.modules[name] = _module(name, **{ext: _unbuilt})


def ref_import(name):
    """Import a reference module (after install_reference_env)."""
    install_reference_env()
    return importlib.import_module(name)


# ---------------------------------------------------------------------------
# torchvision-free eval transform (what tools/test.py builds with
# torchvision.transforms: ToTensor + Normalize(imagenet))
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class RefEvalTransform:
    def __call__(self, img):
        import torch
        x = img.astype(np.float32).transpose(2, 0, 1) / 255.0
        x = (x - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
        return torch.from_numpy(x)


# ---------------------------------------------------------------------------
# synthetic mini-COCO on disk
# ---------------------------------------------------------------------------

def make_mini_coco(root, image_set="val2017", n_images=8, seed=0,
                   det_file=None, image_thre=0.0, all_visible=False):
    """Write images/, annotations/person_keypoints_<set>.json, and (if
    ``det_file``) a COCO-detection-format box json.  Returns the ann dict."""
    import cv2
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images", image_set)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations, detections = [], [], []
    ann_id = 1
    for i in range(n_images):
        img_id = 100000 + i
        fname = "%012d.jpg" % img_id
        if "2014" in image_set:
            fname = f"COCO_{image_set}_" + fname
        w = int(rng.integers(100, 200))
        h = int(rng.integers(100, 200))
        # smooth structured image so bilinear-interp parity is meaningful
        small = rng.integers(0, 255, (9, 9, 3)).astype(np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(img_dir, fname), img)
        images.append({"id": img_id, "width": w, "height": h,
                       "file_name": fname})

        for _ in range(int(rng.integers(1, 4))):
            bw = float(rng.uniform(30, w * 0.8))
            bh = float(rng.uniform(30, h * 0.8))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            kps, nvis = [], 0
            for _j in range(17):
                # all_visible: every joint supervised (used by the
                # brief-trained equivalence cases — an unsupervised
                # joint's heatmap stays near-flat and argmax-ties)
                v = 2 if all_visible else \
                    int(rng.choice([0, 1, 2], p=[0.25, 0.25, 0.5]))
                if v == 0:
                    kps += [0.0, 0.0, 0]
                else:
                    kps += [float(rng.uniform(x - 2, x + bw + 2)),
                            float(rng.uniform(y - 2, y + bh + 2)), v]
                    nvis += 1
            if nvis == 0:
                kps[0:3] = [x + bw / 2, y + bh / 2, 2]
                nvis = 1
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "keypoints": kps, "num_keypoints": nvis,
                "segmentation": []})
            ann_id += 1
            # detector box: jittered gt + random score
            jit = rng.uniform(-6, 6, 4)
            detections.append({
                "image_id": img_id, "category_id": 1,
                "bbox": [x + jit[0], y + jit[1],
                         max(10.0, bw + jit[2]), max(10.0, bh + jit[3])],
                "score": float(rng.uniform(0.2, 1.0))})

        # edge cases: a crowd region and a keypoint-less annotation — both
        # must be filtered identically by the two loaders
        if i == 0:
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [1.0, 1.0, 20.0, 20.0], "area": 400.0, "iscrowd": 1,
                "keypoints": [0.0] * 51, "num_keypoints": 0,
                "segmentation": []})
            ann_id += 1
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [2.0, 2.0, 30.0, 30.0], "area": 900.0, "iscrowd": 0,
                "keypoints": [0.0] * 51, "num_keypoints": 0,
                "segmentation": []})
            ann_id += 1
            # a non-person detection and a sub-threshold detection
            detections.append({"image_id": img_id, "category_id": 3,
                               "bbox": [5.0, 5.0, 40.0, 40.0], "score": 0.9})
            detections.append({"image_id": img_id, "category_id": 1,
                               "bbox": [8.0, 8.0, 40.0, 40.0],
                               "score": max(0.0, image_thre - 0.05)})

    data = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person",
                            "supercategory": "person"}]}
    with open(os.path.join(
            ann_dir, f"person_keypoints_{image_set}.json"), "w") as f:
        json.dump(data, f)
    if det_file:
        os.makedirs(os.path.dirname(os.path.abspath(det_file)), exist_ok=True)
        with open(det_file, "w") as f:
            json.dump(detections, f)
    return data


def make_mini_coco_rsn(root, n_images=8, seed=0):
    """Mini-COCO in BOTH layouts: ours (annotations/person_keypoints_
    val2014.json + TEST.COCO_BBOX_FILE) and the reference RSN's hard-coded
    one (gt_json/minival_2014.json, det_json/minival_2014_det.json,
    RSN/dataset/COCO/coco.py:26-36), over one images/val2014 tree."""
    det_file = os.path.join(root, "det_json", "minival_2014_det.json")
    data = make_mini_coco(root, image_set="val2014", n_images=n_images,
                          seed=seed, det_file=det_file)
    gt_dir = os.path.join(root, "gt_json")
    os.makedirs(gt_dir, exist_ok=True)
    with open(os.path.join(gt_dir, "minival_2014.json"), "w") as f:
        json.dump(data, f)
    return data, det_file
