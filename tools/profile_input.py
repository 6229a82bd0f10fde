"""Host input-pipeline cost study: can the loader feed the TPU step?

The train-step studies (DESIGN.md) pin the *device* side at
1278 samples/s (HRNet-w32 B=128), 2443 (RSN18 B=128) and 228 (w48 B=64)
per chip; the reference feeds its GPUs with torch DataLoader worker
processes (deep_hrnet/tools/train.py:145-158).  This tool measures the
*host* side per-sample cost of each pipeline stage on synthetic
COCO-shaped data (640x480 jpegs, 2 persons/image) so the worker-core
requirement per chip is a measured number, not a hope:

  python tools/profile_input.py            # single-process stage costs
  python tools/profile_input.py --workers 4  # + grain multi-worker e2e

Stages:
  * full host pipeline (reference semantics): jpeg decode + per-person
    cv2 UDP warp + aug + target encode  == JointsDataset.__getitem__
  * decode-only: cv2.imread (the irreducible IO/codec cost)
  * device-aug residue: decode + pad_to_canvas (what a host worker does
    when augmentation/targets run on-device — data/device_pipeline.py)
  * collate: per-batch np.stack
  * RSN variant: multi-kernel gaussian pyramid labels (heavier encode)

Output ends with a feed table: worker cores needed per chip for each
measured train step, for both the reference-style and device-aug hosts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _smooth_image(rng, W, H):
    """Photo-like compressible content: low-frequency gradients + blocks.

    Noise jpegs defeat JPEG entropy coding and decode ~2x slower than
    natural photos; smooth frames bound the decode cost from below, so
    the pair brackets real COCO.
    """
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack([
        127 + 120 * np.sin(xx / W * rng.uniform(2, 8) + rng.uniform(0, 6)),
        127 + 120 * np.sin(yy / H * rng.uniform(2, 8) + rng.uniform(0, 6)),
        127 + 120 * np.sin((xx + yy) / (W + H) * rng.uniform(2, 8)),
    ], axis=-1)
    for _ in range(6):     # a few flat rectangles (objects)
        x0, y0 = rng.integers(0, W - 80), rng.integers(0, H - 80)
        w, h = rng.integers(40, 200), rng.integers(40, 160)
        base[y0:y0 + h, x0:x0 + w] = rng.integers(0, 255, 3)
    return np.clip(base, 0, 255).astype(np.uint8)


def make_synthetic_coco(root, n_images=48, people_per_image=2,
                        size=(640, 480), image_set="train2017", seed=7,
                        smooth=False):
    """COCO-shaped on-disk set: jpegs + person_keypoints json."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    img_dir = os.path.join(root, "images", image_set)
    os.makedirs(img_dir, exist_ok=True)
    W, H = size
    images, annotations, aid = [], [], 1
    for img_id in range(1, n_images + 1):
        img = (_smooth_image(rng, W, H) if smooth
               else rng.integers(0, 255, (H, W, 3), np.uint8))
        name = "%012d.jpg" % img_id
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": img_id, "width": W, "height": H,
                       "file_name": name})
        for _ in range(people_per_image):
            cx, cy = rng.uniform(150, W - 150), rng.uniform(150, H - 150)
            w, h = rng.uniform(60, 120), rng.uniform(120, 200)
            kps = []
            for _j in range(17):
                kps += [float(cx + rng.uniform(-w / 3, w / 3)),
                        float(cy + rng.uniform(-h / 3, h / 3)), 2]
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17,
                "bbox": [cx - w / 2, cy - h / 2, w, h],
                "area": float(w * h), "iscrowd": 0})
            aid += 1
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    with open(os.path.join(root, "annotations",
                           f"person_keypoints_{image_set}.json"), "w") as f:
        json.dump(gt, f)


def _cfg(root, rsn=False, image_size=(192, 256), heatmap_size=(48, 64)):
    from udp_pose_tpu.config import default_config
    cfg = default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TRAIN_SET = "train2017"
    cfg.DATASET.COLOR_RGB = True
    cfg.MODEL.IMAGE_SIZE = list(image_size)
    cfg.MODEL.HEATMAP_SIZE = list(heatmap_size)
    if rsn:
        cfg.MODEL.NAME = "rsn"
    else:
        cfg.MODEL.TARGET_TYPE = "offset"   # flagship head
    return cfg


def timed_per_sample(fn, n, warmup=8):
    for i in range(warmup):
        fn(i % n)
    best = float("inf")
    for _block in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            fn(i)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3     # ms/sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=0,
                    help="also run the grain multi-worker loader e2e")
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--smooth", action="store_true",
                    help="photo-like compressible jpegs (decode-cost "
                         "LOWER bound; default noise jpegs are the upper)")
    args = ap.parse_args()

    import shutil
    tmp = tempfile.mkdtemp(prefix="udp_input_profile_")
    try:
        _profile(args, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _profile(args, tmp):
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.data.base import collate
    from udp_pose_tpu.data.device_pipeline import pad_to_canvas

    make_synthetic_coco(tmp, n_images=args.images, smooth=args.smooth)

    cfg = _cfg(tmp)
    ds = build_dataset(cfg, is_train=True)
    n = len(ds)
    print(f"dataset: {n} records ({args.images} jpegs 640x480, "
          f"2 persons each)", flush=True)

    rows = []

    ms_full = timed_per_sample(lambda i: ds[i], n)
    rows.append(("full host pipeline (decode+warp+aug+targets, offset)",
                 ms_full))

    paths = [rec["image"] for rec in ds.db]
    ms_dec = timed_per_sample(
        lambda i: cv2.imread(paths[i], cv2.IMREAD_COLOR), n)
    rows.append(("jpeg decode only (cv2.imread)", ms_dec))

    # decode is per-IMAGE; the reference does not cache decodes across the
    # persons sharing an image (one imread per sample), and neither does
    # this residue measurement — it is the uncached per-sample cost.
    canvas = (512, 672)    # fits 640x480 in multiples of 32
    ms_res = timed_per_sample(
        lambda i: pad_to_canvas(
            cv2.imread(paths[i], cv2.IMREAD_COLOR), canvas), n)
    rows.append(("device-aug host residue (decode+pad_to_canvas)", ms_res))

    samples = [ds[i] for i in range(min(n, 32))]
    t0 = time.perf_counter()
    for _ in range(8):
        collate(samples)
    ms_col = (time.perf_counter() - t0) / 8 / len(samples) * 1e3
    rows.append(("collate (per sample, B=32)", ms_col))

    # w48 feeds a 288x384 crop with a 72x96 heatmap: 2.25x the warp
    # output and target area of the 256x192 pipeline, so its host cost
    # is measured with its own config, not proxied by ms_full.
    wcfg = _cfg(tmp, image_size=(288, 384), heatmap_size=(72, 96))
    wds = build_dataset(wcfg, is_train=True)
    ms_full_w48 = timed_per_sample(lambda i: wds[i], min(len(wds), n))
    rows.append(("full host pipeline, 384x288 crop (w48 shapes)",
                 ms_full_w48))

    rcfg = _cfg(tmp, rsn=True)
    rds = build_dataset(rcfg, is_train=True)
    ms_rsn = timed_per_sample(lambda i: rds[i], min(len(rds), n))
    rows.append(("RSN host pipeline (multi-kernel label pyramid)", ms_rsn))

    print("\nper-sample host cost (single core, best of 3 blocks):")
    for name, ms in rows:
        print(f"  {name:58s} {ms:7.2f} ms  = {1e3 / ms:7.1f} samples/s/core")

    # feed table vs the measured device-side consumption rates
    steps = [("HRNet-w32 256x192 B=128", 1278.0, ms_full),
             ("HRNet-w48 384x288 B=64", 228.0, ms_full_w48),
             ("RSN18 256x192 B=128", 2443.0, ms_rsn)]
    print("\nworker cores needed to feed one v5e chip "
          "(rate x ms / 1000, +no margin):")
    print(f"  {'train step':28s} {'step rate':>10s} "
          f"{'ref-style host':>15s} {'device-aug host':>16s}")
    for name, rate, ms in steps:
        ref_cores = rate * ms / 1e3
        dev_cores = rate * ms_res / 1e3
        print(f"  {name:28s} {rate:8.0f}/s {ref_cores:13.1f} "
              f"{dev_cores:15.1f}")

    if args.workers:
        from udp_pose_tpu.data.grain_loader import grain_loader
        bs = min(32, n)    # grain batches within an epoch; don't exceed it
        loader = grain_loader(ds, batch_size=bs, seed=0,
                              num_workers=args.workers, num_epochs=4)
        t0, cnt = time.perf_counter(), 0
        for batch in loader:
            cnt += batch["image"].shape[0]
        dt = time.perf_counter() - t0
        assert cnt > 0, "grain loader yielded no batches"
        print(f"\ngrain e2e, {args.workers} workers: "
              f"{cnt / dt:.1f} samples/s ({cnt} samples in {dt:.1f}s; "
              f"host has {os.cpu_count()} cores)")


if __name__ == "__main__":
    main()
