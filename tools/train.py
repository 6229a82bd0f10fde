"""Training CLI (parity: deep_hrnet/tools/train.py).

Usage:  python tools/train.py --cfg <experiment.yaml> [KEY VALUE ...]

Differences from the reference are TPU-native: DataParallel → mesh-sharded
jit train step; torch DataLoader → epoch_loader with device_put.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train keypoint network (TPU)")
    p.add_argument("--cfg", required=True, type=str)
    p.add_argument("--modelDir", type=str, default="")
    p.add_argument("--logDir", type=str, default="")
    p.add_argument("--dataDir", type=str, default="")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    from udp_pose_tpu.config import default_config, update_config
    cfg = default_config()
    update_config(cfg, args)

    from udp_pose_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()
    from udp_pose_tpu.parallel.multihost import (maybe_initialize_from_env,
                                                 process_shard_info)
    maybe_initialize_from_env()
    import jax
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                         normalize_images)
    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.data.base import epoch_loader
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.parallel import make_mesh, shard_batch, replicated
    from udp_pose_tpu.utils.checkpoint import (load_checkpoint,
                                               save_checkpoint, save_weights)
    from udp_pose_tpu.utils.logging import (AverageMeter, create_logger,
                                            print_name_value)

    logger, final_output_dir, tb_dir = create_logger(cfg, args.cfg, "train")
    logger.info(f"devices: {jax.devices()}")

    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir=tb_dir)
    except Exception:
        logger.info("tensorboardX unavailable; skipping TB logging")

    model = build_model(cfg)
    train_ds = build_dataset(cfg, is_train=True)
    val_ds = build_dataset(cfg, is_train=False)

    mesh = make_mesh(cfg.TPU.MESH.DATA, cfg.TPU.MESH.MODEL)
    n_dev = mesh.shape["data"]
    shard_index, num_shards = process_shard_info()
    is_main = shard_index == 0
    # global batch over ALL devices; each host loads its 1/num_shards slice
    batch_size = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_dev
    local_batch = batch_size // num_shards
    if num_shards > 1:
        logger.info(f"multi-host: process {shard_index}/{num_shards}, "
                    f"global batch {batch_size}, local {local_batch}")
    steps_per_epoch = max(len(train_ds) // batch_size, 1)

    is_rsn = cfg.MODEL.NAME == "rsn"
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch)
    if is_rsn:
        from udp_pose_tpu.core.rsn import (make_rsn_optimizer,
                                           make_rsn_train_step)
        from udp_pose_tpu.core.train import TrainState
        tx = make_rsn_optimizer(
            cfg.TRAIN.LR, cfg.TRAIN.WD,
            max_iters=max(steps_per_epoch * cfg.TRAIN.END_EPOCH, 2),
            warmup_iters=min(1000, steps_per_epoch))
        state = TrainState.create(model.apply, state.params,
                                  state.batch_stats, tx)
        step_fn = make_rsn_train_step(
            cfg.MODEL.EXTRA.get("STAGE_NUM", 1), ohkm=cfg.LOSS.USE_OHKM,
            topk=cfg.LOSS.TOPK)
    else:
        step_fn = make_train_step(make_loss_fn(cfg))
    state = jax.device_put(state, replicated(mesh))

    begin_epoch, best_perf = cfg.TRAIN.BEGIN_EPOCH, 0.0
    if cfg.AUTO_RESUME:
        state, begin_epoch, best_perf = load_checkpoint(final_output_dir,
                                                        state)
        if begin_epoch:
            logger.info(f"=> resumed at epoch {begin_epoch}")

    def make_epoch_iter(epoch):
        """WORKERS>0 → grain multiprocess loader; else in-process loader.
        Each host iterates only its shard (epoch-seeded, deterministic —
        replaces DistributedSampler)."""
        if cfg.WORKERS > 0:
            try:
                from udp_pose_tpu.data.grain_loader import grain_loader
                return grain_loader(train_ds, local_batch, seed=epoch,
                                    shuffle=cfg.TRAIN.SHUFFLE,
                                    num_workers=cfg.WORKERS,
                                    shard_index=shard_index,
                                    num_shards=num_shards)
            except ImportError as e:
                logger.warning(f"grain loader unavailable ({e}); "
                               "falling back to in-process loader")
        train_ds.seed(epoch)
        return epoch_loader(train_ds, local_batch,
                            shuffle=cfg.TRAIN.SHUFFLE, seed=epoch,
                            shard_index=shard_index, num_shards=num_shards)

    global_step = 0
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        losses = AverageMeter()
        t_end = time.time()
        for i, batch in enumerate(make_epoch_iter(epoch)):
            if is_rsn:
                device_batch = shard_batch(mesh, {
                    "image": batch["image"],
                    "labels": batch["labels"],
                    "valid": batch["valid"],
                })
            else:
                device_batch = shard_batch(mesh, {
                    "image": batch["image"],      # uint8: 1/4 the transfer
                    "target": batch["target"],
                    "target_weight": batch["target_weight"],
                })
                device_batch["image"] = normalize_images(
                    device_batch["image"])
            state, metrics = step_fn(state, device_batch)
            if i % cfg.PRINT_FREQ == 0:
                loss = float(metrics.get("loss", metrics.get("total_loss")))
                losses.update(loss, batch["image"].shape[0])
                speed = batch["image"].shape[0] / max(time.time() - t_end, 1e-9)
                logger.info(
                    f"Epoch [{epoch}][{i}/{steps_per_epoch}] "
                    f"Speed {speed:.1f}/s Loss {loss * 1e5:.1f}e-5")
                if writer:
                    writer.add_scalar("train_loss", loss, global_step)
            t_end = time.time()
            global_step += 1

        name_values, perf = validate(
            cfg, val_ds, model,
            {"params": state.params, "batch_stats": state.batch_stats},
            final_output_dir if is_main else "",
            shard_index=shard_index, num_shards=num_shards)
        print_name_value(logger, name_values, cfg.MODEL.NAME)
        if writer:
            writer.add_scalar("valid_perf", perf, epoch)

        best = perf > best_perf
        best_perf = max(best_perf, perf)
        if is_main:     # rank-0 checkpointing (reference engine.py:162-169)
            save_checkpoint(final_output_dir, state, epoch, perf,
                            is_best=best)

    if is_main:
        save_weights(os.path.join(final_output_dir, "final_state.msgpack"),
                     state)
        logger.info(f"=> saved final state to {final_output_dir}")


if __name__ == "__main__":
    main()
