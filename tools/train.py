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

    from udp_pose_tpu.utils.platform import (
        maybe_enable_compilation_cache, maybe_force_platform)
    maybe_force_platform()
    maybe_enable_compilation_cache(cfg.TPU.COMPILATION_CACHE)
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

    # Cloud-TPU eviction (maintenance/spot) delivers SIGTERM: checkpoint
    # at the next step boundary and exit cleanly; AUTO_RESUME continues
    # exactly (utils/preemption.py — beyond the reference's epoch/period
    # granularity recovery, tools/train.py:169-179 / engine.py:82-84)
    from udp_pose_tpu.utils.preemption import PreemptionGuard
    guard = PreemptionGuard()

    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir=tb_dir)
    except Exception:
        logger.info("tensorboardX unavailable; skipping TB logging")

    if cfg.DATASET.DEVICE_AUG and cfg.MODEL.NAME == "rsn":
        raise ValueError("DATASET.DEVICE_AUG covers the deep_hrnet "
                         "pipeline (gaussian/offset targets); the RSN "
                         "multi-kernel label pyramid still builds on "
                         "the host — unset DEVICE_AUG for rsn")
    model = build_model(cfg)
    if cfg.TPU.QAT == "int8" and cfg.TPU.PP:
        # the PP path builds its own stem/stage modules
        # (parallel/pipeline.py) which bypass the FakeQuantModel
        # interceptor — training would silently run full-precision
        # while claiming QAT
        raise ValueError("TPU.QAT is not supported together with TPU.PP "
                         "(the pipeline stages bypass the fake-quant "
                         "wrapper); train QAT with dp/tp sharding instead")
    if cfg.TPU.QAT == "int8":
        # quantization-aware training: every supported conv runs
        # fake-quantized (STE) so the weights adapt to the int8 serving
        # grid (models/quantize.py); train step / validate / checkpoints
        # are unchanged — the wrapper is a drop-in apply
        from udp_pose_tpu.models.quantize import FakeQuantModel
        model = FakeQuantModel(model)
        logger.info("=> QAT int8: training through the fake-quant grid")
    elif cfg.TPU.QAT:
        raise ValueError(f"unknown TPU.QAT mode {cfg.TPU.QAT!r}")
    train_ds = build_dataset(cfg, is_train=True)
    val_ds = build_dataset(cfg, is_train=False)

    device_augment, train_iter_ds = None, train_ds
    if cfg.DATASET.DEVICE_AUG:
        # on-device augmentation (data/device_pipeline.py): host workers
        # only decode onto a fixed canvas; warp/aug/AID/target encoding
        # run inside the jit graph keyed by (epoch, step) — replaces the
        # per-sample cv2 pipeline of JointsDataset.py:172-256
        from udp_pose_tpu.data.device_pipeline import (RawSampleView,
                                                       make_device_augment)
        canvas_w, canvas_h = cfg.DATASET.DEVICE_AUG_CANVAS
        canvas_hw = (int(canvas_h), int(canvas_w))
        device_augment = make_device_augment(
            cfg, train_ds.num_joints, train_ds.flip_pairs,
            train_ds.upper_body_ids, canvas_hw)
        train_iter_ds = RawSampleView(train_ds, canvas_hw)
        logger.info(f"=> on-device augmentation (canvas {canvas_hw}, "
                    "host residue = decode+pad)")

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
    if cfg.MODEL.INIT_WEIGHTS and cfg.MODEL.PRETRAINED:
        # reference tools/train.py:91-116 → model.init_weights(PRETRAINED):
        # graft the (possibly backbone-only) checkpoint onto the fresh init
        if not os.path.isfile(cfg.MODEL.PRETRAINED):
            raise ValueError(f"{cfg.MODEL.PRETRAINED} does not exist "
                             "(pose_hrnet.py:503-505 semantics)")
        from udp_pose_tpu.utils.torch_convert import (_deep_merge,
                                                      count_leaves,
                                                      load_pretrained)
        fresh = {"params": state.params, "batch_stats": state.batch_stats}
        if cfg.MODEL.PRETRAINED.endswith(".msgpack"):
            from udp_pose_tpu.utils.checkpoint import load_weights_tolerant
            w, h = cfg.MODEL.IMAGE_SIZE
            partial, _skipped = load_weights_tolerant(
                cfg.MODEL.PRETRAINED, model, (1, h, w, 3))
            merged = _deep_merge(fresh, partial)
            n = count_leaves(partial)
        else:
            merged, n = load_pretrained(fresh, cfg.MODEL.PRETRAINED, cfg)
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        logger.info(f"=> loaded pretrained {cfg.MODEL.PRETRAINED} "
                    f"({n} leaves)")
    iter_mode = is_rsn and cfg.TRAIN.MAX_ITER > 0
    if is_rsn:
        from udp_pose_tpu.core.rsn import (make_rsn_optimizer,
                                           make_rsn_train_step)
        from udp_pose_tpu.core.train import TrainState
        if iter_mode:
            # reference recipe: iteration counts/checkpoint period scale by
            # 8-GPU-baseline / actual width, LR scales UP linearly
            # (RSN train.py:36-38, solver.py:11)
            scale = cfg.TRAIN.ITER_BASELINE_DEVICES / n_dev
            max_iters = max(int(cfg.TRAIN.MAX_ITER * scale), 2)
            ckpt_period = max(int(cfg.TRAIN.CHECKPOINT_PERIOD * scale), 1)
            base_lr = cfg.TRAIN.LR * n_dev
            warmup_iters = cfg.TRAIN.WARMUP_ITERS
            logger.info(f"iteration mode: {max_iters} iters "
                        f"(x{scale:.2f} of {cfg.TRAIN.MAX_ITER}), "
                        f"lr {base_lr}, ckpt every {ckpt_period}")
        else:
            max_iters = max(steps_per_epoch * cfg.TRAIN.END_EPOCH, 2)
            ckpt_period = 0
            base_lr = cfg.TRAIN.LR
            warmup_iters = min(1000, steps_per_epoch)
        tx = make_rsn_optimizer(base_lr, cfg.TRAIN.WD, max_iters=max_iters,
                                warmup_iters=warmup_iters)
        use_pp = cfg.TPU.PP and mesh.shape["model"] > 1
        if use_pp:
            # pipeline parallelism: stage s of the multi-stage RSN on
            # pipeline rank s of the 'model' axis (GPipe microbatch scan,
            # parallel/pipeline.py); stage params/opt-state shard 1/S
            if cfg.TPU.TP:
                raise ValueError("TPU.PP and TPU.TP are mutually "
                                 "exclusive (both map the 'model' axis)")
            from udp_pose_tpu.parallel import (create_pipelined_rsn_state,
                                               make_pipelined_rsn_train_step)
            rsn_like = {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)}
            state = create_pipelined_rsn_state(
                cfg, jax.random.PRNGKey(0), tx, init_variables=rsn_like)
            step_fn = make_pipelined_rsn_train_step(
                cfg, mesh, n_micro=cfg.TPU.PP_MICROBATCHES,
                ohkm=cfg.LOSS.USE_OHKM, topk=cfg.LOSS.TOPK)
            logger.info(f"=> pipeline-parallel over "
                        f"{mesh.shape['model']} stages "
                        f"({cfg.TPU.PP_MICROBATCHES} microbatches)")
        else:
            state = TrainState.create(model.apply, state.params,
                                      state.batch_stats, tx)
            step_fn = make_rsn_train_step(
                cfg.MODEL.EXTRA.get("STAGE_NUM", 1), ohkm=cfg.LOSS.USE_OHKM,
                topk=cfg.LOSS.TOPK)
    else:
        use_pp = False
        step_fn = make_train_step(make_loss_fn(cfg), with_output=True)
    if use_pp:
        from udp_pose_tpu.parallel import pipeline_state_sharding
        state_sharding = pipeline_state_sharding(state, mesh)
    elif cfg.TPU.TP and mesh.shape["model"] > 1:
        # tensor parallelism: channel dims shard over 'model' (params,
        # BN stats AND adam moments — ~1/n per-chip memory on the wide
        # layers); GSPMD propagates activation shardings + collectives
        from udp_pose_tpu.parallel import tensor_parallel_sharding
        state_sharding = tensor_parallel_sharding(
            state, mesh, cfg.TPU.TP_MIN_FEATURES)
        logger.info(f"=> tensor-parallel over {mesh.shape['model']} "
                    "devices ('model' axis)")
    else:
        state_sharding = replicated(mesh)
    state = jax.device_put(state, state_sharding)

    def eval_variables(st):
        """Variables for validate/export: the pipelined layout merges back
        into the standard RSN tree (padded last-stage leaves dropped)."""
        if use_pp:
            from udp_pose_tpu.parallel import merge_rsn_variables
            return merge_rsn_variables(
                {"params": jax.device_get(st.params["stem"]),
                 "batch_stats": jax.device_get(st.batch_stats["stem"])},
                {"params": jax.device_get(st.params["stages"]),
                 "batch_stats": jax.device_get(st.batch_stats["stages"])},
                rsn_like)
        return {"params": st.params, "batch_stats": st.batch_stats}

    def save_final(path, st):
        import types
        v = eval_variables(st)
        save_weights(path, types.SimpleNamespace(
            params=v["params"], batch_stats=v["batch_stats"]))

    # rolling-checkpoint backend: msgpack (reference-artifact parity) or
    # orbax (async commit + per-shard parallel IO — utils/orbax_ckpt.py)
    ckpt_backend = None
    if cfg.TPU.CKPT_BACKEND == "orbax":
        from udp_pose_tpu.utils.orbax_ckpt import OrbaxBackend, load_any
        ckpt_backend = OrbaxBackend(final_output_dir,
                                    max_to_keep=cfg.TPU.CKPT_MAX_TO_KEEP)
        logger.info("=> orbax checkpoint backend (async, sharded)")
    elif cfg.TPU.CKPT_BACKEND != "msgpack":
        raise ValueError(f"unknown TPU.CKPT_BACKEND "
                         f"{cfg.TPU.CKPT_BACKEND!r}")

    begin_epoch, best_perf, resume_skip = cfg.TRAIN.BEGIN_EPOCH, 0.0, 0
    if cfg.AUTO_RESUME and ckpt_backend is not None and not iter_mode:
        state, begin_epoch, best_perf, resume_skip = load_any(
            ckpt_backend, final_output_dir, state, iter_mode=False)
        if begin_epoch or resume_skip:
            logger.info(f"=> resumed (orbax) at epoch {begin_epoch}" + (
                f" step {resume_skip}" if resume_skip else ""))
    elif cfg.AUTO_RESUME:
        state, begin_epoch, best_perf, resume_skip = load_checkpoint(
            final_output_dir, state)
        if begin_epoch or resume_skip:
            # restored leaves are host arrays — re-place to the mesh layout
            state = jax.device_put(state, state_sharding)
            logger.info(f"=> resumed at epoch {begin_epoch}" + (
                f" step {resume_skip} (mid-epoch preemption save)"
                if resume_skip else ""))

    _group_ids_cache = []

    def _epoch_group_ids():
        if not cfg.DATASET.ASPECT_RATIO_GROUPING:
            return None
        if not _group_ids_cache:       # db aspect ratios are static —
            from udp_pose_tpu.data.base import aspect_ratio_group_ids
            _group_ids_cache.append(aspect_ratio_group_ids(train_ds))
        return _group_ids_cache[0]

    def make_epoch_iter(epoch, skip_batches=0):
        """WORKERS>0 → grain multiprocess loader; else in-process loader.
        Each host iterates only its shard (epoch-seeded, deterministic —
        replaces DistributedSampler).  ``skip_batches`` (mid-epoch
        resume) drops the leading plan entries without building them;
        the grain path falls back to the in-process loader for that one
        epoch (the two are determinism-tested identical)."""
        if cfg.WORKERS > 0 and cfg.DATASET.ASPECT_RATIO_GROUPING:
            logger.warning("ASPECT_RATIO_GROUPING needs the in-process "
                           "loader; ignoring WORKERS>0 for grouping")
        elif cfg.WORKERS > 0 and not skip_batches:
            try:
                from udp_pose_tpu.data.grain_loader import grain_loader
                return grain_loader(train_iter_ds, local_batch, seed=epoch,
                                    shuffle=cfg.TRAIN.SHUFFLE,
                                    num_workers=cfg.WORKERS,
                                    shard_index=shard_index,
                                    num_shards=num_shards)
            except ImportError as e:
                logger.warning(f"grain loader unavailable ({e}); "
                               "falling back to in-process loader")
        train_iter_ds.seed(epoch)
        return epoch_loader(train_iter_ds, local_batch,
                            shuffle=cfg.TRAIN.SHUFFLE, seed=epoch,
                            shard_index=shard_index, num_shards=num_shards,
                            group_ids=_epoch_group_ids(),
                            skip_batches=skip_batches)

    def epoch_plan_size(epoch):
        """Batches this shard contributes to epoch ``epoch`` — index math
        only, no sample is built (resume fast-forward)."""
        from udp_pose_tpu.data.base import epoch_batch_indices
        train_ds.seed(epoch)
        return len(epoch_batch_indices(
            train_ds, local_batch, shuffle=cfg.TRAIN.SHUFFLE, seed=epoch,
            shard_index=shard_index, num_shards=num_shards,
            group_ids=_epoch_group_ids()))

    if iter_mode:
        # ---- iteration-based RSN training (reference train.py:69-115) ----
        from udp_pose_tpu.utils.checkpoint import (load_iter_checkpoint,
                                                   save_iter_checkpoint)
        if ckpt_backend is not None:
            def save_iter_checkpoint(out, st, it):  # noqa: F811
                ckpt_backend.save(st, {"iteration": int(it)})
        start_iter = 0
        if cfg.AUTO_RESUME:
            if ckpt_backend is not None:
                state, start_iter = load_any(ckpt_backend, final_output_dir,
                                             state, iter_mode=True)
            else:
                state, start_iter = load_iter_checkpoint(final_output_dir,
                                                         state)
            if start_iter:
                logger.info(f"=> resumed at iteration {start_iter}")

        def infinite_batches(skip=0):
            """IterationBasedBatchSampler equivalent: endless epoch-seeded
            resampling (cvpack iteration_based_batch_sampler.py:5-31).
            ``skip`` fast-forwards the stream past the batches a
            preempted run already consumed — whole epochs advance by
            plan-size arithmetic, the partial epoch by skip_batches —
            so the resumed trajectory sees exactly the batches an
            uninterrupted run would have seen at iterations >= skip."""
            p = 0
            while True:
                size = epoch_plan_size(p)
                if not size:
                    raise RuntimeError(
                        f"epoch {p} produced no batches (dataset size "
                        f"{len(train_ds)} < local batch {local_batch}?)")
                if skip >= size:
                    # whole skipped epochs are exact AND free: the
                    # dataset rng reseeds at every epoch start, so no
                    # aug draw is lost by not building these batches
                    skip -= size
                    p += 1
                    continue
                for j, b in enumerate(make_epoch_iter(p)):
                    if j < skip:
                        # partial epoch: BUILD and discard the consumed
                        # prefix — the sequential aug rng must replay
                        # those draws for the continuation to be exactly
                        # the uninterrupted run's (tested bit-exact for
                        # the epoch-mode twin, test_preemption.py)
                        continue
                    yield b
                skip = 0
                p += 1

        batches = infinite_batches(skip=start_iter)
        loss_sum, loss_cnt = None, 0
        t_end = time.time()
        for iteration in range(start_iter, max_iters):
            batch = next(batches)
            device_batch = shard_batch(mesh, {
                "image": batch["image"],
                "labels": batch["labels"],
                "valid": batch["valid"],
            })
            state, metrics = step_fn(state, device_batch)
            step_loss = metrics["total_loss"]
            loss_sum = step_loss if loss_sum is None else loss_sum + step_loss
            loss_cnt += 1
            if iteration % cfg.PRINT_FREQ == 0:
                loss = float(step_loss)
                speed = batch["image"].shape[0] / max(time.time() - t_end,
                                                      1e-9)
                eta_s = (max_iters - iteration) * \
                    max(time.time() - t_end, 1e-9)
                logger.info(
                    f"Iter [{iteration}/{max_iters}] Speed {speed:.1f}/s "
                    f"Loss {loss:.4f} (avg {float(loss_sum) / loss_cnt:.4f}) "
                    f"ETA {eta_s / 3600:.2f}h")
                if writer:
                    writer.add_scalar("train_loss", loss, iteration)
            if ckpt_period and (iteration + 1) % ckpt_period == 0 and \
                    (is_main or ckpt_backend is not None):
                # orbax saves are COLLECTIVE (each process writes its
                # addressable shards) — never gate them on is_main
                save_iter_checkpoint(final_output_dir, state, iteration)
            t_end = time.time()
            if guard.should_stop(num_shards,
                                 sync=(iteration % cfg.PRINT_FREQ == 0)):
                if is_main or ckpt_backend is not None:
                    save_iter_checkpoint(final_output_dir, state, iteration)
                if ckpt_backend is not None:
                    ckpt_backend.wait()
                logger.info(f"=> preempted: saved iteration checkpoint "
                            f"{iteration}; exiting")
                return
        if is_main or ckpt_backend is not None:
            save_iter_checkpoint(final_output_dir, state, max_iters - 1)
        name_values, perf = validate(
            cfg, val_ds, model, eval_variables(state),
            final_output_dir if is_main else "",
            shard_index=shard_index, num_shards=num_shards)
        print_name_value(logger, name_values, cfg.MODEL.NAME)
        if is_main:
            save_final(os.path.join(final_output_dir,
                                    "final_state.msgpack"), state)
        if ckpt_backend is not None:
            ckpt_backend.wait()
        return

    global_step = 0
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        # running loss accumulates ON DEVICE every step (exact average like
        # the reference's per-step losses.update, function.py:80 — without
        # a per-step device→host sync); fetched only at PRINT_FREQ
        loss_sum, loss_cnt = None, 0
        acc_meter = AverageMeter()
        t_end = time.time()
        skip = resume_skip if epoch == begin_epoch else 0
        for i, batch in enumerate(make_epoch_iter(epoch)):
            if i < skip:  # mid-epoch resume: replay the epoch-seeded batch
                continue  # order AND the aug-rng draws (bit-exactness —
                          # the sequential generator must consume the
                          # prefix; skip_batches would desync it)
            if is_rsn:
                device_batch = shard_batch(mesh, {
                    "image": batch["image"],
                    "labels": batch["labels"],
                    "valid": batch["valid"],
                })
            elif device_augment is not None:
                raw = shard_batch(mesh, {
                    k: batch[k] for k in ("canvas", "joints", "joints_vis",
                                          "center", "scale", "width")})
                # keyed by (epoch, step): deterministic, resume-stable
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(1234), epoch), i)
                images, dev_target, dev_weight = device_augment(key, raw)
                device_batch = {
                    "image": normalize_images(images),
                    "target": dev_target,
                    "target_weight": dev_weight,
                }
            else:
                device_batch = shard_batch(mesh, {
                    "image": batch["image"],      # uint8: 1/4 the transfer
                    "target": batch["target"],
                    "target_weight": batch["target_weight"],
                })
                device_batch["image"] = normalize_images(
                    device_batch["image"])
            state, metrics = step_fn(state, device_batch)
            step_loss = metrics.get("loss", metrics.get("total_loss"))
            loss_sum = step_loss if loss_sum is None else loss_sum + step_loss
            loss_cnt += 1
            if i % cfg.PRINT_FREQ == 0:
                loss = float(step_loss)
                loss_avg = float(loss_sum) / loss_cnt
                if not is_rsn:
                    # train-time PCK@0.5 on heatmap argmax
                    # (reference evaluate.py:41-71; offset → ::3 channels).
                    # Fetch only this process's rows — the output is a
                    # global array under multi-host, and non-addressable
                    # shards cannot be np.asarray'd.
                    from udp_pose_tpu.core.accuracy import pck_accuracy
                    from udp_pose_tpu.parallel import fetch_local_batch_rows
                    # only batch-dim sharding can be reassembled here; a
                    # non-batch-partial shard (e.g. spatial 'model'-axis
                    # sharding) returns None → skip PCK rather than
                    # corrupt it (tested in test_multichip_hardening)
                    hm = fetch_local_batch_rows(metrics["output"],
                                                num_shards)
                    if hm is not None:
                        tgt = (np.asarray(jax.device_get(dev_target))
                               if device_augment is not None
                               else batch["target"])
                        if cfg.MODEL.TARGET_TYPE == "offset":
                            hm, tgt = hm[:, ::3], tgt[:, ::3]
                        _, avg_acc, cnt, pred = pck_accuracy(hm, tgt)
                        acc_meter.update(avg_acc, cnt)
                speed = batch[
                    "canvas" if device_augment is not None else "image"
                ].shape[0] / max(time.time() - t_end, 1e-9)
                logger.info(
                    f"Epoch [{epoch}][{i}/{steps_per_epoch}] "
                    f"Speed {speed:.1f}/s Loss {loss * 1e5:.1f}e-5 "
                    f"(avg {loss_avg * 1e5:.1f}e-5) "
                    f"Acc {acc_meter.val:.3f} ({acc_meter.avg:.3f})")
                if writer:
                    writer.add_scalar("train_loss", loss, global_step)
                    writer.add_scalar("train_acc", acc_meter.val, global_step)
                if cfg.DEBUG.DEBUG and not is_rsn and is_main \
                        and device_augment is None and hm is not None:
                    from udp_pose_tpu.utils.vis import save_debug_images
                    prefix = os.path.join(final_output_dir,
                                          f"train_{epoch}_{i}")
                    save_debug_images(cfg, batch["image"], batch["joints"],
                                      batch["joints_vis"], tgt,
                                      hm, prefix, pred_joints=pred * 4)
            t_end = time.time()
            global_step += 1
            # multi-host: only act on the OR-reduced flag, and only at a
            # step every host reaches (the allgather is a collective)
            if guard.should_stop(num_shards,
                                 sync=(i % cfg.PRINT_FREQ == 0)):
                if ckpt_backend is not None:
                    # collective: every process participates in the save
                    ckpt_backend.save(state, {"epoch": epoch - 1,
                                              "perf": best_perf,
                                              "step_in_epoch": i + 1})
                    ckpt_backend.wait()
                elif is_main:
                    save_checkpoint(final_output_dir, state, epoch - 1,
                                    best_perf, step_in_epoch=i + 1)
                logger.info(f"=> preempted: saved mid-epoch checkpoint "
                            f"(epoch {epoch} step {i + 1}); exiting")
                return

        name_values, perf = validate(
            cfg, val_ds, model, eval_variables(state),
            final_output_dir if is_main else "",
            shard_index=shard_index, num_shards=num_shards)
        print_name_value(logger, name_values, cfg.MODEL.NAME)
        if writer:
            writer.add_scalar("valid_perf", perf, epoch)

        best = perf > best_perf
        best_perf = max(best_perf, perf)
        if ckpt_backend is not None:
            # async + COLLECTIVE: every process calls save (each writes
            # its addressable shards); model_best stays a msgpack weights
            # artifact, merged out of any parallel layout by save_final
            ckpt_backend.save(state, {"epoch": epoch, "perf": perf})
            if best and is_main:
                save_final(os.path.join(final_output_dir,
                                        "model_best.msgpack"), state)
        elif is_main:   # rank-0 checkpointing (reference engine.py:162-169)
            # under PP the rolling checkpoint keeps the pipelined layout
            # (resume restores into it), but model_best is a deployment
            # artifact and must be the standard merged tree
            save_checkpoint(final_output_dir, state, epoch, perf,
                            is_best=best and not use_pp)
            if best and use_pp:
                save_final(os.path.join(final_output_dir,
                                        "model_best.msgpack"), state)

    if is_main:
        save_final(os.path.join(final_output_dir, "final_state.msgpack"),
                   state)
        logger.info(f"=> saved final state to {final_output_dir}")
    if ckpt_backend is not None:
        ckpt_backend.wait()


if __name__ == "__main__":
    main()
