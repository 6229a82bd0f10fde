"""Measured floor for the vs_baseline anchor (VERDICT r3 item 5).

Runs the ACTUAL reference pipeline — deep_hrnet pose_hrnet w32 256x192
torch forward, flip-test fold (lib/core/function.py:151-171 semantics:
numpy flip, second forward, flip_back_offset, average), and the real
``lib.core.inference.get_final_preds`` cv2/host decode — on this host's
CPU, end to end.  The reference publishes no top-down crops/sec
(BASELINE.md), so the A100 anchor (350 crops/s) used by bench.py has
been an *estimate*; this measurement plus the roofline bracket recorded
in BASELINE.md turns it into a bracketed claim:

  floor   = this script (reference code, host CPU, all cores)
  ceiling = A100 fp32 dense peak 19.5 TF/s over 2x7.16 GF/crop
            = 1362 crops/s at 100% conv efficiency

Reference modules are spec-loaded read-only; nothing is copied.

Usage: python tools/bench_reference_torch.py [--batch 32] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import torch

    # torchvision is absent in this image; the reference's models package
    # imports it transitively (backbones/mobilenetv3.py:2) even though
    # pose_hrnet never uses it — stub just enough to import.
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm

    from ref_harness import DEEP_HRNET, claim_namespace, RSN_ROOT
    claim_namespace([DEEP_HRNET, os.path.join(DEEP_HRNET, "lib")],
                    [RSN_ROOT])

    from udp_pose_tpu.config import default_config
    from __graft_entry__ import _hrnet_w32_cfg
    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="float32")
    cfg.defrost()
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TEST.POST_PROCESS = True

    import importlib
    ref_net = importlib.import_module("models.pose_hrnet")
    ref_inf = importlib.import_module("core.inference")
    ref_tr = importlib.import_module("utils.transforms")

    torch.set_num_threads(os.cpu_count() or 8)
    model = ref_net.get_pose_net(cfg, is_train=False)
    model.eval()

    B = args.batch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, 3, 256, 192)).astype(np.float32)
    center = np.tile(np.array([[128.0, 128.0]], np.float32), (B, 1))
    scale = np.tile(np.array([[0.96, 1.28]], np.float32), (B, 1))
    # COCO flip pairs (deep_hrnet/lib/dataset/coco.py)
    flip_pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                  [13, 14], [15, 16]]

    def one_batch():
        with torch.no_grad():
            out = model(torch.from_numpy(x)).numpy()
            flipped = model(
                torch.from_numpy(np.ascontiguousarray(x[..., ::-1]))
            ).numpy()
        # function.py:158-171: numpy flip_back + average
        flipped = ref_tr.flip_back_offset(flipped, flip_pairs)
        hm = (out + flipped) * 0.5
        preds, _maxvals, _in_space = ref_inf.get_final_preds(
            cfg, hm.copy(), center, scale)
        return preds

    one_batch()                                    # warm caches
    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        one_batch()
        best = min(best, time.perf_counter() - t0)
    cps = B / best
    print(json.dumps({
        "metric": "reference_torch_cpu_w32_fliptest_crops_per_sec",
        "value": round(cps, 2),
        "unit": "crops/s",
        "host_threads": torch.get_num_threads(),
        "batch": B,
        "notes": "actual reference model+decode on host CPU — the "
                 "measured FLOOR of the anchor bracket (BASELINE.md)",
    }))


if __name__ == "__main__":
    main()
