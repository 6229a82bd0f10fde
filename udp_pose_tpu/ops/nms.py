"""NMS family: greedy box-IoU NMS, OKS-IoU, OKS-NMS, soft-OKS-NMS.

The reference ships Cython/CUDA box NMS (deep_hrnet/lib/nms/cpu_nms.pyx,
nms_kernel.cu) plus pure-python OKS variants (lib/nms/nms.py:75-177); COCO
eval only ever uses the OKS variants (lib/dataset/coco.py:342-351).  Here:

* host (numpy) twins with identical greedy semantics — used at eval time
  where candidate counts are tiny;
* a jit-compiled fixed-shape greedy box NMS (`nms_jax`) for the on-device
  detector path — O(N²) IoU matrix + `lax.fori_loop` suppression sweep, no
  data-dependent shapes, TPU friendly.

Box IoU uses the reference's ``+1`` pixel-area convention (nms.py:52).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# COCO keypoint sigmas (lib/nms/nms.py:77)
COCO_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
     1.07, 1.07, .87, .87, .89, .89], np.float32) / 10.0


# ---------------------------------------------------------------------------
# host variants (eval-time, tiny N)
# ---------------------------------------------------------------------------

def nms_np(dets, thresh, plus_one=True):
    """Greedy box NMS; dets (N, 5) [x1,y1,x2,y2,score] → kept indices.

    ``plus_one=True`` uses the reference's +1 pixel-area convention
    (lib/nms/nms.py:35-72, matching its Cython/CUDA kernels); ``False``
    gives plain IoU (torchvision.ops.nms semantics, used by the YOLO path).
    """
    if len(dets) == 0:
        return []
    e = 1.0 if plus_one else 0.0
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + e) * (y2 - y1 + e)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + e) * np.maximum(0.0, yy2 - yy1 + e)
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


def oks_iou(g, d, a_g, a_d, sigmas=None, in_vis_thre=None):
    """OKS between one pose ``g`` (3J,) and N poses ``d`` (N, 3J).

    Vectorised parity with reference oks_iou (lib/nms/nms.py:75-94),
    including its quirk that the visibility filter keeps a python-`and` of
    index lists (i.e. effectively the *second* list) — we replicate the
    actual computation: when ``in_vis_thre`` is set, keypoints are kept where
    ``vd > thre`` (the `list(a) and list(b)` expression evaluates to `b`).
    """
    if sigmas is None:
        sigmas = COCO_SIGMAS
    vars_ = (sigmas * 2) ** 2
    xg, yg = g[0::3], g[1::3]
    xd, yd = d[:, 0::3], d[:, 1::3]
    dx = xd - xg[None]
    dy = yd - yg[None]
    e = ((dx ** 2 + dy ** 2) / vars_[None]
         / ((a_g + a_d)[:, None] / 2 + np.spacing(1)) / 2)
    if in_vis_thre is not None:
        vd = d[:, 2::3]
        mask = vd > in_vis_thre
        cnt = mask.sum(axis=1)
        s = np.where(mask, np.exp(-e), 0.0).sum(axis=1)
        return np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return np.exp(-e).mean(axis=1)


def oks_nms(kpts, scores, areas, thresh, sigmas=None, in_vis_thre=None):
    """Greedy OKS-NMS (lib/nms/nms.py:97-124).

    kpts (N, 3J) flattened keypoints, scores (N,), areas (N,) → kept indices.
    """
    n = len(scores)
    if n == 0:
        return []
    order = np.asarray(scores).argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        if rest.size == 0:
            break
        ious = oks_iou(kpts[i], kpts[rest], areas[i], areas[rest],
                       sigmas, in_vis_thre)
        order = rest[ious <= thresh]
    return keep


def soft_oks_nms(kpts, scores, areas, thresh, sigmas=None, in_vis_thre=None,
                 max_dets=20):
    """Soft OKS-NMS with Gaussian rescoring (lib/nms/nms.py:138-177)."""
    n = len(scores)
    if n == 0:
        return []
    order = np.asarray(scores).argsort()[::-1]
    scores = np.asarray(scores, np.float64)[order]
    keep = []
    while order.size > 0 and len(keep) < max_dets:
        i = order[0]
        rest = order[1:]
        ious = oks_iou(kpts[i], kpts[rest], areas[i], areas[rest],
                       sigmas, in_vis_thre) if rest.size else np.zeros(0)
        scores = scores[1:] * np.exp(-(ious ** 2) / thresh)
        resort = scores.argsort()[::-1]
        order = rest[resort]
        scores = scores[resort]
        keep.append(int(i))
    return keep


# ---------------------------------------------------------------------------
# jit variant (on-device detector path, fixed shapes)
# ---------------------------------------------------------------------------

def _iou_matrix(boxes, plus_one=True):
    """(N,4) xyxy → (N,N) IoU (+1 pixel-area convention by default)."""
    off = 1.0 if plus_one else 0.0
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + off) * (y2 - y1 + off)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(0.0, xx2 - xx1 + off) *
             jnp.maximum(0.0, yy2 - yy1 + off))
    return inter / (areas[:, None] + areas[None, :] - inter)


@partial(jax.jit, static_argnames=("max_out", "plus_one"))
def nms_jax(boxes, scores, iou_thresh, max_out, plus_one=True):
    """Fixed-shape greedy NMS on device.

    boxes (N, 4) xyxy, scores (N,) — padding rows must carry score -inf.
    Returns (keep_idx (max_out,) int32 padded with -1, keep_mask (N,) bool).
    Greedy order matches :func:`nms_np`; ``plus_one=False`` gives the
    plain-IoU semantics of the YOLO path (boxes.py:153)."""
    n = boxes.shape[0]
    iou = _iou_matrix(boxes, plus_one=plus_one)

    def body(_, state):
        alive, suppressed, keep_idx, kcount = state
        cand = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(cand)
        valid = cand[i] > -jnp.inf
        overlap = iou[i] > iou_thresh
        new_alive = alive & ~overlap & (jnp.arange(n) != i)
        keep_idx = jnp.where(
            valid & (kcount < max_out),
            keep_idx.at[jnp.minimum(kcount, max_out - 1)].set(i),
            keep_idx)
        suppressed = jnp.where(valid, suppressed.at[i].set(False), suppressed)
        kcount = kcount + jnp.where(valid, 1, 0)
        return (jnp.where(valid, new_alive, alive), suppressed, keep_idx,
                kcount)

    alive = scores > -jnp.inf
    suppressed = jnp.ones((n,), bool)
    keep_idx = jnp.full((max_out,), -1, jnp.int32)
    state = (alive, suppressed, keep_idx, jnp.int32(0))
    _, suppressed, keep_idx, _ = jax.lax.fori_loop(
        0, min(max_out, n), body, state)
    return keep_idx, ~suppressed
