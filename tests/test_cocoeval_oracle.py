"""Randomised differential test for eval/cocoeval.py.

pycocotools cannot be installed in this image, so the oracle is a second,
independently written, deliberately naive implementation of the COCO
keypoint-AP algorithm (greedy per-image matching in score order, crowd
absorption, ignore regions, 101-point interpolated precision over 10 OKS
thresholds and 3 area rings, maxDets=20 — the published COCOeval
algorithm).  Sixty randomised scenarios stress crowds, empty images,
ignored gts, >maxDets detections, score ties, and area-ring boundaries.
Every stat must agree to 1e-9 with the vectorised evaluator the framework
reports AP with (udp_pose_tpu/eval/cocoeval.py; reference consumer:
deep_hrnet/lib/dataset/coco.py:431-445).
"""

import numpy as np
import pytest

from udp_pose_tpu.eval.cocoeval import (COCO_KPT_SIGMAS, COCOKeypointEval,
                                        STATS_NAMES)

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREAS = [(0.0, 1e10), (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e10)]
MAX_DETS = 20


# --------------------------------------------------------------------------
# naive oracle — plain python/loops, structured nothing like the evaluator
# --------------------------------------------------------------------------

def oks_one(gt, dt):
    g = np.asarray(gt["keypoints"], float)
    d = np.asarray(dt["keypoints"], float)
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    xd, yd = d[0::3], d[1::3]
    var = (COCO_KPT_SIGMAS * 2) ** 2
    if (vg > 0).sum() > 0:
        dx, dy = xd - xg, yd - yg
        e = (dx ** 2 + dy ** 2) / var / (gt["area"] + np.spacing(1)) / 2
        e = e[vg > 0]
    else:
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        dx = np.maximum(0, x0 - xd) + np.maximum(0, xd - x1)
        dy = np.maximum(0, y0 - yd) + np.maximum(0, yd - y1)
        e = (dx ** 2 + dy ** 2) / var / (gt["area"] + np.spacing(1)) / 2
    return float(np.exp(-e).mean())


def dt_area(dt):
    k = np.asarray(dt["keypoints"], float)
    return float((k[0::3].max() - k[0::3].min()) *
                 (k[1::3].max() - k[1::3].min()))


def naive_eval(gt_by_img, dt_by_img, img_ids):
    """Returns the 10 stats in COCOeval.summarize keypoint order."""
    precision = -np.ones((10, 101, 3))
    recall = -np.ones((10, 3))
    for ai, (a0, a1) in enumerate(AREAS):
        records = []        # (score, is_tp[t], is_ignored[t]) per detection
        total_gt = 0
        any_img = False
        for img in img_ids:
            gts = gt_by_img.get(img, [])
            dts = sorted(dt_by_img.get(img, []),
                         key=lambda d: -d["score"])[:MAX_DETS]
            if not gts and not dts:
                continue
            any_img = True
            gig = []
            for g in gts:
                base = bool(g.get("iscrowd", 0)) or \
                    g.get("num_keypoints", 0) == 0
                gig.append(base or not (a0 <= g["area"] <= a1))
            # evaluation order: non-ignored gts first, original order kept
            order = [i for i in range(len(gts)) if not gig[i]] + \
                    [i for i in range(len(gts)) if gig[i]]
            total_gt += sum(1 for i in range(len(gts)) if not gig[i])
            matched = {t: set() for t in range(10)}
            per_dt = []
            for d in dts:
                tp = [False] * 10
                ig = [False] * 10
                for t, thr in enumerate(IOU_THRS):
                    best, best_iou = None, min(thr, 1 - 1e-10)
                    for gi in order:
                        if gi in matched[t] and not gts[gi].get("iscrowd", 0):
                            continue
                        if best is not None and not gig[best] and gig[gi]:
                            break
                        iou = oks_one(gts[gi], d)
                        if iou < best_iou:
                            continue
                        best, best_iou = gi, iou
                    if best is not None:
                        matched[t].add(best)
                        tp[t] = True
                        ig[t] = gig[best]
                    else:
                        out = not (a0 <= dt_area(d) <= a1)
                        ig[t] = out
                per_dt.append((d["score"], tp, ig))
            records.extend(per_dt)
        if not any_img or total_gt == 0:
            continue
        records.sort(key=lambda r: -r[0])   # python sort is stable
        for t in range(10):
            tps = np.array([r[1][t] and not r[2][t] for r in records])
            fps = np.array([(not r[1][t]) and not r[2][t] for r in records])
            tp_c = np.cumsum(tps)
            fp_c = np.cumsum(fps)
            rc = tp_c / total_gt
            pr = tp_c / np.maximum(tp_c + fp_c, np.spacing(1))
            recall[t, ai] = rc[-1] if len(rc) else 0
            pr = list(pr)
            for i in range(len(pr) - 1, 0, -1):
                pr[i - 1] = max(pr[i - 1], pr[i])
            q = np.zeros(101)
            inds = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precision[t, :, ai] = q

    def ap(ts, a):
        p = precision[ts, :, a]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    def ar(ts, a):
        r = recall[ts, a]
        r = r[r > -1]
        return float(r.mean()) if r.size else -1.0

    s = slice(None)
    return [ap(s, 0), ap(slice(0, 1), 0), ap(slice(5, 6), 0),
            ap(s, 1), ap(s, 2),
            ar(s, 0), ar(slice(0, 1), 0), ar(slice(5, 6), 0),
            ar(s, 1), ar(s, 2)]


# --------------------------------------------------------------------------
# random scenario generator
# --------------------------------------------------------------------------

def random_scenario(rng, n_images):
    gt_anns, dets = [], []
    img_ids = list(range(1, n_images + 1))
    ann_id = 1
    for img in img_ids:
        kind = rng.random()
        n_gt = 0 if kind < 0.15 else int(rng.integers(1, 5))
        for _ in range(n_gt):
            side = float(rng.choice([20, 40, 80, 95, 97, 150]))
            x, y = rng.uniform(0, 300, 2)
            kps = []
            nk = 0
            for _j in range(17):
                v = int(rng.choice([0, 1, 2], p=[0.3, 0.3, 0.4]))
                if v == 0:
                    kps += [0.0, 0.0, 0]
                else:
                    kps += [float(x + rng.uniform(0, side)),
                            float(y + rng.uniform(0, side)), v]
                    nk += 1
            gt_anns.append({
                "id": ann_id, "image_id": img, "category_id": 1,
                "keypoints": kps, "num_keypoints": nk,
                "bbox": [x, y, side, side],
                "area": side * side * float(rng.uniform(0.8, 1.2)),
                "iscrowd": int(rng.random() < 0.12)})
            ann_id += 1
            # detections near this gt
            for _ in range(int(rng.integers(0, 4))):
                noise = rng.uniform(1, 25)
                dk = []
                for j in range(17):
                    dk += [kps[3 * j] + float(rng.normal(0, noise)),
                           kps[3 * j + 1] + float(rng.normal(0, noise)),
                           float(rng.uniform(0, 1))]
                score = float(rng.choice(
                    [rng.uniform(0, 1), 0.5, 0.5]))  # deliberate ties
                dets.append({"image_id": img, "category_id": 1,
                             "keypoints": dk, "score": score})
        # false positives
        for _ in range(int(rng.integers(0, 3))):
            dk = []
            bx, by = rng.uniform(0, 300, 2)
            for _j in range(17):
                dk += [float(bx + rng.uniform(0, 60)),
                       float(by + rng.uniform(0, 60)),
                       float(rng.uniform(0, 1))]
            dets.append({"image_id": img, "category_id": 1,
                         "keypoints": dk, "score": float(rng.uniform(0, 1))})
    # one image with >maxDets detections
    if dets and rng.random() < 0.5:
        img = img_ids[0]
        base = [d for d in dets if d["image_id"] == img]
        proto = base[0] if base else dets[0]
        for _ in range(25):
            d = dict(proto)
            d["image_id"] = img
            d["score"] = float(rng.uniform(0, 1))
            dets.append(d)
    return gt_anns, dets, img_ids


@pytest.mark.parametrize("seed", range(12))
def test_cocoeval_matches_naive_oracle(seed):
    rng = np.random.default_rng(seed)
    for case in range(5):
        gt_anns, dets, img_ids = random_scenario(rng, n_images=6)
        ev = COCOKeypointEval(gt_anns, img_ids)
        nv = ev.evaluate(dets)
        got = [nv[k] for k in STATS_NAMES]

        gt_by_img, dt_by_img = {}, {}
        for g in gt_anns:
            gt_by_img.setdefault(g["image_id"], []).append(g)
        for d in dets:
            dt_by_img.setdefault(d["image_id"], []).append(d)
        want = naive_eval(gt_by_img, dt_by_img, img_ids)
        np.testing.assert_allclose(got, want, atol=1e-9,
                                   err_msg=f"seed={seed} case={case}")
