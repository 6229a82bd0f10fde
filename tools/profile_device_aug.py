"""Device-aug A/B: host-loader training vs DATASET.DEVICE_AUG training.

Measures, on the attached chip (VERDICT r4 item 2's bench half):

  * the on-device augment graph alone (canvas -> crops+targets) in
    samples/s — the device-side cost the host loader no longer pays,
  * the fused augment+train step samples/s vs the host-batch train step
    (bench.bench_train) — the end-to-end A/B,
  * the host residue (decode+pad_to_canvas, measured per-sample by
    tools/profile_input.py) converted to worker-cores-per-chip at the
    measured step rate.

Host-batch semantics target: JointsDataset.py:172-256 (the reference
does ALL of this per-sample on host CPU with cv2).

Usage: python tools/profile_device_aug.py [--batch 128] [--canvas 512 672]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--canvas", type=int, nargs=2, default=(512, 672),
                    metavar=("H", "W"))
    ap.add_argument("--host-residue-ms", type=float, default=4.22,
                    help="decode+pad ms/sample from tools/profile_input.py "
                         "on this host (default: the measured round-3 "
                         "noise-jpeg upper bound, DESIGN.md table)")
    ap.add_argument("--host-full-ms", type=float, default=6.44,
                    help="full host-pipeline ms/sample (same table)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.core.infer import COCO_FLIP_PAIRS
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (make_optimizer, make_train_step,
                                         normalize_images)
    from udp_pose_tpu.data.device_pipeline import make_device_augment
    from udp_pose_tpu.models import build_model

    B = args.batch
    ch, cw = args.canvas
    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    cfg.defrost()
    cfg.MODEL.TARGET_TYPE = "offset"
    cfg.DATASET.CUTOUT = [0.5, 0.1, 3]        # AID on: the aug-heavy case
    upper = tuple(range(11))
    augment = make_device_augment(cfg, 17, COCO_FLIP_PAIRS, upper, (ch, cw))

    rng = np.random.default_rng(0)
    raw = {
        "canvas": jax.device_put(rng.integers(
            0, 256, (B, ch, cw, 3)).astype(np.uint8)),
        "joints": jax.device_put(rng.uniform(
            50, 400, (B, 17, 2)).astype(np.float32)),
        "joints_vis": jax.device_put(np.ones((B, 17), np.float32)),
        "center": jax.device_put(rng.uniform(
            150, 350, (B, 2)).astype(np.float32)),
        "scale": jax.device_put(rng.uniform(
            0.8, 1.4, (B, 2)).astype(np.float32)),
        "width": jax.device_put(np.full((B,), float(cw), np.float32)),
    }
    checksum = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    # --- augment graph alone ------------------------------------------
    key = jax.random.PRNGKey(0)

    def run_aug(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = augment(jax.random.fold_in(key, i), raw)
        float(checksum(out[0]))
        return time.perf_counter() - t0

    run_aug(2)
    t6, t18 = run_aug(6), run_aug(18)
    aug_sps = B / ((t18 - t6) / 12)
    print(f"device augment alone: {aug_sps:.0f} samples/s "
          f"({(t18 - t6) / 12 * 1e3:.2f} ms/batch of {B})")

    # --- fused augment + train step -----------------------------------
    model = build_model(cfg)
    state = bench._host_train_state(jax, jnp, model, (1, 256, 192, 3),
                                    make_optimizer(cfg, 1000))
    raw_step = make_train_step(make_loss_fn(cfg))

    @jax.jit
    def aug_train_step(state, raw, key):
        crops, target, weight = augment(key, raw)
        batch = {"image": normalize_images(crops), "target": target,
                 "target_weight": weight}
        return raw_step(state, batch)

    def run_at(n, state):
        for i in range(n):
            state, m = aug_train_step(state, raw,
                                      jax.random.fold_in(key, i))
        float(checksum(state.params["final_layer"]["kernel"]))
        return state

    t0 = time.perf_counter(); state = run_at(2, state)
    t0 = time.perf_counter(); state = run_at(6, state)
    t6 = time.perf_counter() - t0
    t0 = time.perf_counter(); state = run_at(18, state)
    t18 = time.perf_counter() - t0
    at_sps = B / ((t18 - t6) / 12)
    print(f"augment+train step: {at_sps:.0f} samples/s "
          f"({(t18 - t6) / 12 * 1e3:.2f} ms/step)")

    # --- host-batch train step (the A side) ---------------------------
    host_sps, _ = bench.bench_train(jax, jnp, batch=B)
    print(f"host-batch train step: {host_sps:.0f} samples/s")

    # --- feed table ----------------------------------------------------
    res = args.host_residue_ms
    full = args.host_full_ms
    for name, sps, per_sample_host in (
            ("host loader", host_sps, full),
            ("device aug", at_sps, res)):
        cores = sps * per_sample_host / 1e3
        print(f"feed {name:12s}: {sps:6.0f} samples/s x "
              f"{per_sample_host:.1f} ms host/sample -> "
              f"{cores:.1f} worker cores per chip")
    print(f"device-aug delta: {100 * (at_sps - host_sps) / host_sps:+.1f}% "
          "step throughput; host residue "
          f"{args.host_residue_ms:.1f} vs {full:.1f} ms/sample "
          f"({full / res:.1f}x fewer worker cores)")


if __name__ == "__main__":
    main()
