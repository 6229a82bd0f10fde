"""Validate loop: batched flip-test inference + decode + dataset.evaluate.

Parity: deep_hrnet/lib/core/function.py:114-274 — but the per-batch work
(forward, flip, un-flip, average, decode) is one jit graph (core/infer.py);
the host only accumulates the small decoded arrays and runs the final
OKS-NMS + AP evaluation.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from ..data.base import epoch_loader
from .accuracy import pck_accuracy
from .infer import make_infer_fn_from_cfg

logger = logging.getLogger(__name__)


def validate(cfg, dataset, model, variables, output_dir="",
             batch_size=None, infer_fn=None):
    """Returns (name_values, perf_indicator)."""
    if infer_fn is None:
        infer_fn = make_infer_fn_from_cfg(
            model, cfg, flip_pairs=tuple(map(tuple, dataset.flip_pairs)))
    batch_size = batch_size or cfg.TEST.BATCH_SIZE_PER_GPU

    n = len(dataset)
    J = cfg.MODEL.NUM_JOINTS
    all_preds = np.zeros((n, J, 3), np.float32)
    all_boxes = np.zeros((n, 6))
    image_paths = []
    idx = 0
    accs, t0 = [], time.time()

    for batch in epoch_loader(dataset, batch_size, shuffle=False,
                              drop_last=False):
        bs = batch["image"].shape[0]
        pad = batch_size - bs
        images = batch["image"]
        center = batch["center"]
        scale = batch["scale"]
        if pad:  # keep jit cache to one shape
            images = np.concatenate([images, np.zeros_like(images[:1]).repeat(pad, 0)])
            center = np.concatenate([center, center[:1].repeat(pad, 0)])
            scale = np.concatenate([scale, scale[:1].repeat(pad, 0)])
        preds, maxvals, hm = infer_fn(variables, images, center, scale)
        preds = np.asarray(preds)[:bs]
        maxvals = np.asarray(maxvals)[:bs]
        hm_np = np.asarray(hm)[:bs]

        if cfg.MODEL.TARGET_TYPE == "offset":
            _, avg_acc, cnt, _ = pck_accuracy(hm_np[:, ::3],
                                              batch["target"][:, ::3])
        else:
            _, avg_acc, cnt, _ = pck_accuracy(hm_np, batch["target"])
        accs.append((avg_acc, cnt))

        all_preds[idx:idx + bs, :, 0:2] = preds
        all_preds[idx:idx + bs, :, 2:3] = maxvals
        all_boxes[idx:idx + bs, 0:2] = batch["center"]
        all_boxes[idx:idx + bs, 2:4] = batch["scale"]
        all_boxes[idx:idx + bs, 4] = np.prod(batch["scale"] * 200, axis=1)
        all_boxes[idx:idx + bs, 5] = batch["score"]
        image_paths.extend(batch["image_path"])
        idx += bs

    crops_per_sec = idx / max(time.time() - t0, 1e-9)
    mean_acc = (sum(a * c for a, c in accs) / max(sum(c for _, c in accs), 1))
    logger.info("validate: %d crops, %.1f crops/s, PCK@0.5 %.3f",
                idx, crops_per_sec, mean_acc)

    name_values, perf = dataset.evaluate(cfg, all_preds, output_dir,
                                         all_boxes, image_paths)
    return name_values, perf
