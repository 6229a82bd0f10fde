"""Evaluation CLI (parity: deep_hrnet/tools/test.py).

Usage:  python tools/test.py --cfg <experiment.yaml> [KEY VALUE ...]
Loads TEST.MODEL_FILE (msgpack weights) or final_state.msgpack from the run
dir, runs the flip-test validate loop, prints the AP table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Test keypoint network (TPU)")
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
    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.checkpoint import load_weights
    from udp_pose_tpu.utils.logging import create_logger, print_name_value

    logger, final_output_dir, _ = create_logger(cfg, args.cfg, "valid")
    model = build_model(cfg)
    val_ds = build_dataset(cfg, is_train=False)

    if cfg.TEST.MODEL_FILE:
        weight_file = cfg.TEST.MODEL_FILE
    else:
        weight_file = os.path.join(final_output_dir, "final_state.msgpack")
    logger.info(f"=> loading model from {weight_file}")
    if os.path.exists(weight_file):
        if str(weight_file).endswith((".pth", ".pt", ".tar")):
            # the reference's TEST.MODEL_FILE is a torch checkpoint
            from udp_pose_tpu.utils.torch_convert import \
                torch_to_flax_from_cfg
            variables, unused = torch_to_flax_from_cfg(weight_file, cfg)
            if unused:
                logger.warning(f"=> {len(unused)} unused torch keys, "
                               f"e.g. {unused[:3]}")
        else:
            variables = load_weights(weight_file)
    else:
        logger.warning("=> no weights found; evaluating a fresh init "
                       "(smoke mode)")
        import jax.numpy as jnp
        w, h = cfg.MODEL.IMAGE_SIZE
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, h, w, 3)), train=False))(jax.random.PRNGKey(0))

    if cfg.TPU.QAT == "int8" and cfg.TPU.QUANTIZE != "int8":
        # evaluate a QAT checkpoint the way it trained: fake-quant convs
        # with dynamic activation scales (TPU.QUANTIZE int8 wins when both
        # are set — that's the true int8 deployment eval)
        from udp_pose_tpu.models.quantize import FakeQuantModel
        model = FakeQuantModel(model)
        logger.info("=> QAT int8: evaluating through the fake-quant grid")

    if cfg.TPU.QUANTIZE == "int8":
        # PTQ serving mode: amax-calibrate on the first val batches, then
        # run every conv w8a8 on the MXU int8 path (models/quantize.py,
        # shared with tools/reproduce_zoo.py --quantize)
        from udp_pose_tpu.models.quantize import quantize_for_eval
        model, variables = quantize_for_eval(cfg, model, variables, val_ds)
        logger.info(f"=> int8 PTQ: calibrated "
                    f"{len(model.act_scales)} conv sites")

    mesh = None
    if len(jax.local_devices()) > 1:
        from udp_pose_tpu.parallel import make_mesh
        # multi-host: each process evals its own data shard, so the mesh
        # spans only ITS devices (a per-process local computation) — all
        # local chips stay busy without cross-process collectives
        local = (jax.local_devices() if jax.process_count() > 1 else None)
        mesh = make_mesh(cfg.TPU.MESH.DATA if local is None else -1,
                         cfg.TPU.MESH.MODEL, devices=local)
        logger.info(f"=> sharding eval over mesh {dict(mesh.shape)}")
    shard_index, num_shards = process_shard_info()
    if num_shards > 1:
        logger.info(f"=> multi-host eval: process {shard_index}/{num_shards}")
    name_values, perf = validate(cfg, val_ds, model, variables,
                                 final_output_dir if shard_index == 0 else "",
                                 mesh=mesh, shard_index=shard_index,
                                 num_shards=num_shards)
    print_name_value(logger, name_values, cfg.MODEL.NAME)
    logger.info(f"=> perf: {perf:.4f}")


if __name__ == "__main__":
    main()
