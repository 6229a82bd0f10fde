"""COCO results visualiser (parity role: visualization/plot_coco.py).

Draws per-image skeleton overlays from a results json (the file written by
dataset.evaluate) in the paper's two colour styles (:20-88 Chunhua /
Xiaochu palettes).

Usage: python tools/plot_coco.py --results results.json --image-dir dir/
       [--style chunhua] [--save-dir plots/] [--score-thre 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# COCO skeleton (1-based) + per-limb colours, per the reference's styles
SKELETON = [[16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12],
            [7, 13], [6, 7], [6, 8], [7, 9], [8, 10], [9, 11], [2, 3],
            [1, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 7]]

STYLES = {
    "chunhua": [(0, 215, 255), (0, 255, 204), (0, 134, 255), (0, 255, 50),
                (77, 255, 222), (77, 196, 255), (77, 135, 255),
                (191, 255, 77), (77, 255, 77), (77, 222, 255),
                (255, 156, 127), (0, 127, 255), (255, 127, 77),
                (0, 77, 255), (255, 77, 36), (0, 77, 255), (0, 77, 255),
                (0, 215, 255), (0, 215, 255)],
    "xiaochu": [(255, 0, 0)] * 5 + [(0, 255, 0)] * 7 + [(0, 0, 255)] * 7,
}


def plot(results_file, image_dir, save_dir, style="chunhua",
         score_thre=0.3, vis_thre=0.2):
    import cv2
    with open(results_file) as f:
        results = json.load(f)
    by_image = defaultdict(list)
    for r in results:
        if r["score"] >= score_thre:
            by_image[r["image_id"]].append(r)
    colors = STYLES[style]
    os.makedirs(save_dir, exist_ok=True)
    n = 0
    for image_id, dets in by_image.items():
        path = os.path.join(image_dir, "%012d.jpg" % image_id)
        img = cv2.imread(path)
        if img is None:
            continue
        for det in dets:
            kp = np.asarray(det["keypoints"]).reshape(-1, 3)
            for li, (a, b) in enumerate(SKELETON):
                pa, pb = kp[a - 1], kp[b - 1]
                if pa[2] > vis_thre and pb[2] > vis_thre:
                    cv2.line(img, (int(pa[0]), int(pa[1])),
                             (int(pb[0]), int(pb[1])),
                             colors[li % len(colors)], 2, cv2.LINE_AA)
            for p in kp:
                if p[2] > vis_thre:
                    cv2.circle(img, (int(p[0]), int(p[1])), 2,
                               (255, 255, 255), -1, cv2.LINE_AA)
        out = os.path.join(save_dir, "%012d.jpg" % image_id)
        cv2.imwrite(out, img)
        n += 1
    print(f"wrote {n} annotated images to {save_dir}")
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--save-dir", default="plots")
    p.add_argument("--style", default="chunhua", choices=sorted(STYLES))
    p.add_argument("--score-thre", type=float, default=0.3)
    args = p.parse_args()
    plot(args.results, args.image_dir, args.save_dir, args.style,
         args.score_thre)


if __name__ == "__main__":
    main()
