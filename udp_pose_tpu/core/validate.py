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
             batch_size=None, infer_fn=None, mesh=None,
             shard_index=0, num_shards=1, gather_fn=None):
    """Returns (name_values, perf_indicator).

    With ``mesh``, eval batches shard over the 'data' axis (the sharded
    equivalent of the reference's rank-Subset eval,
    RSN/lib/utils/dataloader.py:86-92 — but as one sharded computation
    instead of per-process subsets).

    With ``num_shards > 1`` (multi-host), this process decodes only its
    contiguous-stride shard of the dataset (epoch_loader shard slicing),
    then the tiny decoded arrays are all-gathered (``gather_fn``, default
    jax multihost_utils.process_allgather) and re-interleaved into global
    order before dataset.evaluate — replacing the reference's pickled
    all_gather (RSN/lib/utils/comm.py:47-87, test.py:119-131).  Every
    process returns the same evaluation result.
    """
    pairs = tuple(map(tuple, dataset.flip_pairs))
    if infer_fn is None:
        if cfg.MODEL.NAME == "rsn":
            from ..data.rsn import RSN_COCO, RSN_MPII
            from .rsn import make_rsn_infer_fn
            attr = RSN_MPII if cfg.DATASET.DATASET == "mpii" else RSN_COCO
            w, h = cfg.MODEL.IMAGE_SIZE
            infer_fn = make_rsn_infer_fn(
                model, flip_test=cfg.TEST.FLIP_TEST, flip_pairs=pairs,
                kernel=attr["test_gaussian_kernel"],
                shifts=tuple(attr["test_shift_ratios"]),
                input_size_hw=(h, w),
                flip_mode=cfg.TEST.get("FLIP_MODE", "fold"))
        else:
            infer_fn = make_infer_fn_from_cfg(model, cfg, flip_pairs=pairs)
    batch_size = batch_size or cfg.TEST.BATCH_SIZE_PER_GPU
    if mesh is not None:
        from ..parallel import batch_sharding, replicated
        import jax
        n_data = mesh.shape["data"]
        batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        variables = jax.device_put(variables, replicated(mesh))
        _sh = batch_sharding(mesh)
        base_infer = infer_fn

        def infer_fn(v, images, center, scale):   # noqa: F811
            import jax as _jax
            return base_infer(
                v, _jax.device_put(images, _sh),
                _jax.device_put(center, _sh), _jax.device_put(scale, _sh))

    n = len(dataset)
    J = cfg.MODEL.NUM_JOINTS
    all_preds = np.zeros((n, J, 3), np.float32)
    all_boxes = np.zeros((n, 6))
    image_paths = []
    local_preds, local_boxes = [], []
    idx = 0
    accs, t0 = [], time.time()

    for n_batch, batch in enumerate(epoch_loader(
            dataset, batch_size, shuffle=False, drop_last=False,
            shard_index=shard_index, num_shards=num_shards)):
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

        if "target" in batch:
            if cfg.MODEL.TARGET_TYPE == "offset":
                hm_j, tgt_j = hm_np[:, ::3], batch["target"][:, ::3]
            else:
                hm_j, tgt_j = hm_np, batch["target"]
            _, avg_acc, cnt, pred_hm = pck_accuracy(hm_j, tgt_j)
            accs.append((avg_acc, cnt))
            if cfg.DEBUG.DEBUG and n_batch % cfg.PRINT_FREQ == 0 and \
                    output_dir:
                # reference wires this at function.py:219 (val prefix);
                # pred joints at heatmap-argmax ×stride in crop space
                from ..utils.vis import save_debug_images
                save_debug_images(
                    cfg, batch["image"], batch.get("joints"),
                    batch.get("joints_vis"), tgt_j, hm_j,
                    f"{output_dir}/val_{n_batch}", pred_joints=pred_hm * 4)

        row_preds = np.zeros((bs, J, 3), np.float32)
        row_preds[:, :, 0:2] = preds
        row_preds[:, :, 2:3] = maxvals
        row_boxes = np.zeros((bs, 6))
        row_boxes[:, 0:2] = batch["center"]
        row_boxes[:, 2:4] = batch["scale"]
        row_boxes[:, 4] = np.prod(batch["scale"] * 200, axis=1)
        row_boxes[:, 5] = batch["score"]
        if num_shards > 1:
            local_preds.append(row_preds)
            local_boxes.append(row_boxes)
        else:
            all_preds[idx:idx + bs] = row_preds
            all_boxes[idx:idx + bs] = row_boxes
            image_paths.extend(batch["image_path"])
        idx += bs

    crops_per_sec = idx / max(time.time() - t0, 1e-9)
    mean_acc = (sum(a * c for a, c in accs) / max(sum(c for _, c in accs), 1))
    logger.info("validate: %d crops, %.1f crops/s, PCK@0.5 %.3f",
                idx, crops_per_sec, mean_acc)

    if num_shards > 1:
        local_preds = np.concatenate(local_preds)
        local_boxes = np.concatenate(local_boxes)
        if gather_fn is None:
            from jax.experimental import multihost_utils

            def gather_fn(x):      # noqa: F811
                return multihost_utils.process_allgather(x)
        preds_g = np.asarray(gather_fn(local_preds)).reshape(
            num_shards, -1, J, 3)
        boxes_g = np.asarray(gather_fn(local_boxes)).reshape(
            num_shards, -1, 6)
        # re-interleave: shard s carried padded-global rows s::num_shards
        total = ((n + num_shards - 1) // num_shards) * num_shards
        padded = np.concatenate([np.arange(n), np.arange(total - n)])
        for s in range(num_shards):
            gi = padded[s::num_shards]
            all_preds[gi] = preds_g[s][: len(gi)]
            all_boxes[gi] = boxes_g[s][: len(gi)]
        image_paths = [dataset.db[i]["image"] for i in range(n)]
        # The reconstruction above assumes every host built an IDENTICAL
        # db (same entries, same order).  Verify it: gather a digest of
        # each host's path list and require equality — a host-dependent
        # db (e.g. filtered by local file availability) would otherwise
        # silently mis-assign results to images.
        import hashlib
        digest = hashlib.sha1(
            "\n".join(image_paths).encode()).digest()[:8]
        # two uint32 words, not one uint64: jax's default x32 mode would
        # silently truncate a uint64 through process_allgather
        my_hash = np.frombuffer(digest, np.uint32).copy()
        hashes = np.asarray(gather_fn(my_hash)).reshape(num_shards, -1)
        if not (hashes == hashes[0]).all():
            raise RuntimeError(
                "multi-host eval: dataset db differs across hosts "
                f"(path-list digests {hashes[:, 0].tolist()}); every host "
                "must build the identical db for result reassembly")

    name_values, perf = dataset.evaluate(cfg, all_preds, output_dir,
                                         all_boxes, image_paths)
    return name_values, perf
