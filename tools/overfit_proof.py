"""End-to-end learning proof: overfit a tiny set, require AP → 1.0.

Exercises the complete stack on real hardware — dataset → UDP crop →
target encoding → jitted training → DARK decode → source-space transform →
rescoring → OKS-NMS → native COCO AP.  A plateau at loss ≈ 0.002 (the
zero-prediction baseline for σ=2 Gaussians on 64×48 maps) means the model
is predicting zeros; convergence to ~1e-5 with AP 1.0 proves the loop.

Measured on v5e-1: 5000 steps in ~78 s (resnet18 192×256, batch 8 fp32),
AP/AP.5/AR = 1.0.

Usage: python tools/overfit_proof.py [--root /tmp/syncoco] [--steps 5000]
(See tests/test_coco_eval.py fixtures for generating a synthetic set.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/syncoco")
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--image-set", default="val2017")
    args = p.parse_args()

    from udp_pose_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()
    import jax
    import jax.numpy as jnp
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (create_train_state, make_train_step,
                                         normalize_images)
    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.data.base import collate
    from udp_pose_tpu.models import build_model

    cfg = default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = args.root
    cfg.DATASET.TRAIN_SET = args.image_set
    cfg.DATASET.TEST_SET = args.image_set
    cfg.DATASET.FLIP = False
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.ROT_FACTOR = 0.0
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.POST_PROCESS = True
    cfg.TEST.BATCH_SIZE_PER_GPU = 8
    cfg.TPU.DTYPE = "float32"

    model = build_model(cfg)
    train_ds = build_dataset(cfg, is_train=True)
    train_ds.seed(0)
    bf = collate([train_ds[i] for i in range(len(train_ds))])
    batch = {
        "image": jnp.asarray(normalize_images(jax.device_put(bf["image"]))),
        "target": jax.device_put(bf["target"]),
        "target_weight": jax.device_put(bf["target_weight"]),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10 ** 6)
    step = make_train_step(make_loss_fn(cfg))
    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, batch)
    print(f"{args.steps} steps in {time.time() - t0:.0f}s, "
          f"final loss {float(m['loss']):.6f}")

    val_ds = build_dataset(cfg, is_train=False)
    nv, ap = validate(cfg, val_ds, model,
                      {"params": state.params,
                       "batch_stats": state.batch_stats}, "/tmp/overfit_out")
    print({k: round(float(v), 3) for k, v in nv.items()})
    assert ap > 0.95, f"E2E learning proof FAILED: AP {ap}"
    print(f"E2E LEARNING PROOF PASSED: AP={ap:.3f}")


if __name__ == "__main__":
    main()
