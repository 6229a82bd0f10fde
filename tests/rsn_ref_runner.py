"""Subprocess runner: the reference RSN eval pipeline, composed end-to-end.

Executed by tests/test_system_equivalence_rsn.py in its own process (the
reference's RSN and deep_hrnet trees both define top-level ``lib``/
``dataset``/``config`` packages, so the two reference stacks cannot share
one interpreter).  Runs, with reference code only:

  dataset.COCO.coco.COCODataset.__getitem__ (RSN/dataset/JointsDataset.py
  :124-224 crop) → network.RSN forward → exps/RSN18.coco/test.py
  ``inference``/``compute_on_dataset`` (:74-116: flip test, ``get_results``
  decode :25-71, det×kpt rescoring) → results list.

Writes the random-init torch state_dict (for the parent to convert) and
the results json.  Nothing from the reference is copied — modules are
spec-loaded read-only.
"""

import argparse
import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np

RSN_ROOT = "/root/reference/RSN"


class EasyDict(dict):
    """attribute-style dict (stand-in for the easydict pip package)."""
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def install_stubs():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_harness import StubCOCO, StubCOCOeval

    sys.modules["easydict"] = _module("easydict", EasyDict=EasyDict)
    pkg = _module("pycocotools")
    pkg.__path__ = []
    sys.modules["pycocotools"] = pkg
    sys.modules["pycocotools.coco"] = _module("pycocotools.coco",
                                              COCO=StubCOCO)
    sys.modules["pycocotools.cocoeval"] = _module("pycocotools.cocoeval",
                                                  COCOeval=StubCOCOeval)

    class _Logger:
        def info(self, *a, **k):
            pass

    sys.modules["coloredlogs"] = _module("coloredlogs",
                                         install=lambda *a, **k: None)

    def _unused(*a, **k):
        raise RuntimeError("torchvision stub")

    tvt = _module("torchvision.transforms", Normalize=_unused,
                  Compose=_unused, ToTensor=_unused)
    tv = _module("torchvision", transforms=tvt)
    tv.__path__ = []
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt

    sys.path.insert(0, RSN_ROOT)


def load_ref_modules(height, width, flip, kernel=5, shifts=(0.25,)):
    """network.py + test.py with a stub `config` module."""
    cfg = EasyDict()
    cfg.DATASET = EasyDict()
    cfg.DATASET.KEYPOINT = EasyDict()
    cfg.DATASET.KEYPOINT.NUM = 17
    cfg.DATASET.KEYPOINT.FLIP_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8],
                                       [9, 10], [11, 12], [13, 14], [15, 16]]
    cfg.INPUT_SHAPE = (height, width)
    cfg.OUTPUT_SHAPE = (height // 4, width // 4)
    cfg.TEST = EasyDict()
    cfg.TEST.FLIP = bool(flip)
    cfg.TEST.GAUSSIAN_KERNEL = kernel
    cfg.TEST.SHIFT_RATIOS = list(shifts)
    sys.modules["config"] = _module("config", cfg=cfg)

    spec = importlib.util.spec_from_file_location(
        "network", os.path.join(RSN_ROOT, "exps/RSN18.coco/network.py"))
    network = importlib.util.module_from_spec(spec)
    sys.modules["network"] = network
    spec.loader.exec_module(network)

    spec = importlib.util.spec_from_file_location(
        "ref_rsn_test", os.path.join(RSN_ROOT, "exps/RSN18.coco/test.py"))
    ref_test = importlib.util.module_from_spec(spec)
    sys.modules["ref_rsn_test"] = ref_test
    spec.loader.exec_module(ref_test)
    return cfg, network, ref_test


# RSN INPUT.MEANS/STDS (exps/RSN18.coco/config.py:37-39, bgr order)
MEANS = np.array([0.406, 0.456, 0.485], np.float32)
STDS = np.array([0.225, 0.224, 0.229], np.float32)


def transform(img):
    import torch
    x = img.astype(np.float32).transpose(2, 0, 1) / 255.0
    x = (x - MEANS[:, None, None]) / STDS[:, None, None]
    return torch.from_numpy(x)


def randomize(model, seed):
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--results", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stage-num", type=int, default=2)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--flip", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dump", default="",
                    help="npz path: record crops/heatmaps/decoded per batch")
    ap.add_argument("--kernel", type=int, default=5)
    ap.add_argument("--shifts", default="0.25",
                    help="comma-separated shift ratios")
    ap.add_argument("--decode-npz", default="",
                    help="run ONLY get_results on the given npz "
                         "(outputs/centers/scales) and write preds/maxvals "
                         "to --results (npz)")
    args = ap.parse_args()

    install_stubs()
    import torch
    shifts = tuple(float(s) for s in args.shifts.split(","))
    cfg, network, ref_test = load_ref_modules(
        args.height, args.width, args.flip, args.kernel, shifts)

    if args.decode_npz:
        data = np.load(args.decode_npz)
        preds, maxvals = ref_test.get_results(
            data["outputs"].astype(np.float64),
            data["centers"].astype(np.float64).copy(),
            data["scales"].astype(np.float64).copy(),
            cfg.TEST.GAUSSIAN_KERNEL, cfg.TEST.SHIFT_RATIOS)
        np.savez(args.results, preds=preds, maxvals=maxvals)
        print(f"decoded {preds.shape[0]} samples")
        return

    attr_mod = importlib.import_module("dataset.attribute")
    attr = attr_mod.load_dataset("COCO")
    attr.INPUT_SHAPE = (args.height, args.width)
    attr.OUTPUT_SHAPE = (args.height // 4, args.width // 4)
    attr.WIDTH_HEIGHT_RATIO = args.width / args.height

    ref_coco = importlib.import_module("dataset.COCO.coco")

    class DS(ref_coco.COCODataset):
        """Reference COCODataset with its hard-coded data paths re-rooted
        (they point inside the read-only reference tree,
        RSN/dataset/COCO/coco.py:20-36); all logic is inherited."""

        def __init__(self, DATASET, stage, root, transform=None):
            ref_coco.JointsDataset.__init__(self, DATASET, stage, transform)
            self.cur_dir = root
            self.train_gt_path = os.path.join(root, "gt_json", "train.json")
            self.val_gt_path = os.path.join(root, "gt_json",
                                            "minival_2014.json")
            self.val_det_path = os.path.join(root, "det_json",
                                             "minival_2014_det.json")
            self.test_det_path = ""
            self._exception_ids = []
            self.data = self._get_data()
            self.data_num = len(self.data)

    ds = DS(attr, "val", args.root, transform)
    assert len(ds) > 0

    # reference BatchCollator semantics (lib/utils/dataloader.py:103-115):
    # images stacked, meta kept as python lists
    def loader():
        for start in range(0, len(ds), args.batch):
            items = [ds[i] for i in range(start,
                                          min(start + args.batch, len(ds)))]
            cols = list(zip(*items))
            yield (torch.stack(cols[0], dim=0), list(cols[1]),
                   list(cols[2]), list(cols[3]), list(cols[4]))

    model_cfg = EasyDict()
    model_cfg.MODEL = EasyDict()
    model_cfg.MODEL.STAGE_NUM = args.stage_num
    model_cfg.MODEL.UPSAMPLE_CHANNEL_NUM = 256
    model_cfg.DATASET = cfg.DATASET
    model_cfg.OUTPUT_SHAPE = cfg.OUTPUT_SHAPE
    model_cfg.LOSS = EasyDict()
    model_cfg.LOSS.OHKM = True
    model_cfg.LOSS.TOPK = 8
    model_cfg.LOSS.COARSE_TO_FINE = True

    model = network.RSN(model_cfg)
    if os.path.exists(args.weights):
        # trained-weights mode: the caller supplies a state_dict (e.g.
        # flax-trained weights through the reverse bridge, which carries
        # no num_batches_tracked counters — harmless in eval mode)
        print(f"runner: loading supplied weights {args.weights} "
              f"(--seed ignored)", file=sys.stderr)
        missing, unexpected = model.load_state_dict(
            torch.load(args.weights), strict=False)
        assert not unexpected, unexpected[:8]
        assert all("num_batches_tracked" in k for k in missing), missing[:8]
    else:
        model = randomize(model, args.seed)
        torch.save(model.state_dict(), args.weights)
    model.eval()

    class _Log:
        def info(self, *a, **k):
            pass

    dump = {"crops": [], "heatmaps": [], "preds": [], "maxvals": [],
            "centers": [], "scales": []}
    if args.dump:
        orig_get_results = ref_test.get_results

        def spy_get_results(outputs, centers, scales, *a, **k):
            dump["heatmaps"].append(outputs.copy())
            dump["centers"].append(np.array(centers, copy=True))
            dump["scales"].append(np.array(scales, copy=True))
            preds, maxvals = orig_get_results(outputs, centers, scales,
                                              *a, **k)
            dump["preds"].append(preds.copy())
            dump["maxvals"].append(maxvals.copy())
            return preds, maxvals

        ref_test.get_results = spy_get_results

    results = ref_test.inference(model, list(loader()), _Log(), device="cpu")
    if args.dump:
        np.savez(args.dump,
                 **{k: np.concatenate(v) for k, v in dump.items() if v})
    with open(args.results, "w") as f:
        json.dump(results, f, default=float)
    print(f"wrote {len(results)} results")


if __name__ == "__main__":
    main()
