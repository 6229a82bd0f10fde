"""Tests for NMS family vs reference lib/nms/nms.py semantics."""

import numpy as np

from udp_pose_tpu.ops import nms


def _ref_oks_iou(g, d, a_g, a_d, sigmas=None, in_vis_thre=None):
    """Loop replication of reference oks_iou (nms.py:75-94)."""
    if sigmas is None:
        sigmas = nms.COCO_SIGMAS
    var = (sigmas * 2) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    ious = np.zeros((d.shape[0]))
    for n_d in range(d.shape[0]):
        xd, yd, vd = d[n_d, 0::3], d[n_d, 1::3], d[n_d, 2::3]
        e = ((xd - xg) ** 2 + (yd - yg) ** 2) / var / (
            (a_g + a_d[n_d]) / 2 + np.spacing(1)) / 2
        if in_vis_thre is not None:
            ind = list(vg > in_vis_thre) and list(vd > in_vis_thre)
            e = e[ind]
        ious[n_d] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] != 0 else 0.0
    return ious


def _random_poses(rng, n):
    kpts = rng.uniform(0, 200, (n, 17, 3)).astype(np.float64)
    kpts[:, :, 2] = rng.uniform(0, 1, (n, 17))
    areas = rng.uniform(1000, 20000, (n,))
    scores = rng.uniform(0, 1, (n,))
    return kpts.reshape(n, -1), scores, areas


def test_oks_iou_parity():
    rng = np.random.default_rng(30)
    kpts, _, areas = _random_poses(rng, 6)
    for thre in (None, 0.2):
        gold = _ref_oks_iou(kpts[0], kpts[1:], areas[0], areas[1:],
                            in_vis_thre=thre)
        out = nms.oks_iou(kpts[0], kpts[1:], areas[0], areas[1:],
                          in_vis_thre=thre)
        np.testing.assert_allclose(out, gold, rtol=1e-10)


def test_oks_nms_greedy():
    rng = np.random.default_rng(31)
    kpts, scores, areas = _random_poses(rng, 12)
    # make clusters of near-duplicates
    kpts[6:] = kpts[:6] + rng.normal(0, 1.0, kpts[:6].shape)
    keep = nms.oks_nms(kpts, scores, areas, 0.9)
    assert len(keep) >= 1
    assert keep[0] == int(np.argmax(scores))
    # kept poses are mutually below threshold
    for i, a in enumerate(keep):
        for b in keep[i + 1:]:
            iou = nms.oks_iou(kpts[a], kpts[b:b + 1], areas[a],
                              areas[b:b + 1])[0]
            assert iou <= 0.9 + 1e-9


def test_soft_oks_nms_caps_and_orders():
    rng = np.random.default_rng(32)
    kpts, scores, areas = _random_poses(rng, 30)
    keep = nms.soft_oks_nms(kpts, scores, areas, 0.5, max_dets=20)
    assert len(keep) <= 20
    assert keep[0] == int(np.argmax(scores))


def test_box_nms_np():
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],    # heavy overlap with first
        [50, 50, 60, 60, 0.7],
        [0, 0, 10, 10, 0.95],
    ], np.float32)
    keep = nms.nms_np(dets, 0.5)
    assert keep == [3, 2]


def test_nms_jax_matches_np():
    rng = np.random.default_rng(33)
    n = 40
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    gold = nms.nms_np(np.concatenate([boxes, scores[:, None]], 1), 0.5)
    keep_idx, keep_mask = nms.nms_jax(boxes, scores, 0.5, max_out=n)
    got = [int(i) for i in np.asarray(keep_idx) if i >= 0]
    assert got == gold
    assert sorted(np.nonzero(np.asarray(keep_mask))[0].tolist()) == sorted(gold)


def test_nms_jax_handles_padding():
    boxes = np.zeros((8, 4), np.float32)
    boxes[:2] = [[0, 0, 10, 10], [100, 100, 110, 110]]
    scores = np.full((8,), -np.inf, np.float32)
    scores[:2] = [0.5, 0.9]
    keep_idx, _ = nms.nms_jax(boxes, scores, 0.5, max_out=8)
    got = [int(i) for i in np.asarray(keep_idx) if i >= 0]
    assert got == [1, 0]
