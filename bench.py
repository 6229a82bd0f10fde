"""Throughput benchmark: HRNet-w32 256×192 + UDP offset + flip-test.

North-star metric (BASELINE.json): crops/sec/chip for the flagship config,
including normalisation, the folded flip-test forward, heatmap un-flip, and
full UDP offset decode to source-space keypoints — i.e. the complete
per-crop inference pipeline of the reference validate loop
(deep_hrnet/lib/core/function.py:139-217), as one jit graph.

``vs_baseline`` normalises by an estimated PyTorch-A100 throughput for the
same pipeline (fp32, flip test folded as 2 forwards, batch 32):
A100_EST = 350 crops/s.  The reference publishes no top-down crops/sec
(BASELINE.md), so this estimate is the comparison anchor; >5.0 means the
>5× A100 target is met.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

A100_EST_CROPS_PER_SEC = 350.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.core.infer import make_infer_fn
    from udp_pose_tpu.models import build_model

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 256, 192, 3)), train=False)
    )(rng)
    infer = make_infer_fn(model, target_type="offset", flip_test=True,
                          post_process=True, kpd=cfg.LOSS.KPD)

    best = 0.0
    best_batch = 0
    rng_np = np.random.default_rng(0)
    for batch in (128,):   # the measured knee (DESIGN.md perf study);
        # smaller/larger points documented there — each extra batch
        # size costs ~3 min of remote compilation on the axon relay
        images = rng_np.integers(0, 256, (batch, 256, 192, 3)).astype(np.uint8)
        center = np.tile(np.array([[128.0, 128.0]], np.float32), (batch, 1))
        scale = np.tile(np.array([[0.96, 1.28]], np.float32), (batch, 1))
        images_d = jax.device_put(images)
        center_d = jax.device_put(center)
        scale_d = jax.device_put(scale)
        checksum = jax.jit(lambda p: jnp.sum(p))

        def timed(iters):
            # NOTE: on the axon-relay platform block_until_ready() does not
            # actually await remote execution; a scalar device→host readback
            # does, so we sync through a checksum transfer.
            t0 = time.perf_counter()
            for _ in range(iters):
                preds, maxvals, _ = infer(variables, images_d, center_d,
                                          scale_d)
            float(checksum(preds))
            return time.perf_counter() - t0

        timed(3)  # warmup / compile
        t_small, t_large = timed(10), timed(30)
        per_iter = (t_large - t_small) / 20.0  # cancels fixed tunnel latency
        cps = batch / per_iter
        log(f"batch {batch}: {cps:.1f} crops/s ({per_iter * 1e3:.2f} ms/it)")
        if cps > best:
            best, best_batch = cps, batch

    result = {
        "metric": "crops_per_sec_per_chip_hrnet_w32_256x192_fliptest",
        "value": round(best, 1),
        "unit": "crops/s",
        "vs_baseline": round(best / A100_EST_CROPS_PER_SEC, 3),
        "batch": best_batch,
        "notes": "full pipeline: normalize + fwd(2B folded flip) + unflip + "
                 "UDP offset decode; bf16 compute; vs_baseline anchors to "
                 "est. 350 crops/s PyTorch-A100 fp32 (target >5x => 5.0); "
                 "train = HRNet-w32 offset fwd+bwd+adam @ B=128 (knee; "
                 "DESIGN.md); engine = fused detect+pose on 720p",
    }
    # Headline is safe from here: a driver timeout (SIGTERM) or a failed
    # secondary bench still records it.
    _arm_emergency_dump(result)

    # ---- training-step throughput (fwd+bwd+adam, offset loss) -----------
    try:
        train_sps, train_tfs = bench_train(jax, jnp)
        result["train_samples_per_sec"] = round(train_sps, 1)
        result["train_tflops_per_sec"] = round(train_tfs, 1)
    except Exception as e:          # secondary metric must not kill the run
        log(f"train bench failed: {e!r}")

    # ---- end-to-end engine: detect-then-pose serving latency -------------
    try:
        result["engine_detect_pose_fps"] = round(bench_engine(jax), 1)
    except Exception as e:
        log(f"engine bench failed: {e!r}")

    print(json.dumps(result), flush=True)
    _DUMPED["done"] = True


_DUMPED = {"done": False}


def _arm_emergency_dump(result):
    """On SIGTERM/SIGINT (driver timeout), print the metrics collected so
    far as the one JSON line instead of dying silently mid-compile."""
    import signal

    def dump(signum, frame):
        if not _DUMPED["done"]:
            result.setdefault("partial", True)
            print(json.dumps(result), flush=True)
            _DUMPED["done"] = True
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, dump)
    signal.signal(signal.SIGINT, dump)


def bench_train(jax, jnp, batch=128):
    """HRNet-w32 offset train-step samples/s (+ achieved TFLOP/s at
    3x fwd-FLOPs per step; fwd = 7.16 GF/crop, BASELINE.md).
    B=128 is the measured knee: 804.9 (B=64) → 1297.7 (B=128) → 1227.9
    (B=256) samples/s."""
    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (create_train_state, make_optimizer,
                                         make_train_step, normalize_images)
    from udp_pose_tpu.models import build_model

    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 1000)
    step_fn = make_train_step(make_loss_fn(cfg))
    rng_np = np.random.default_rng(1)
    batch_np = {
        "image": rng_np.integers(0, 256, (batch, 256, 192, 3)).astype(np.uint8),
        "target": rng_np.normal(size=(batch, 51, 64, 48)).astype(np.float32),
        "target_weight": rng_np.uniform(size=(batch, 17)).astype(np.float32),
    }
    device_batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    checksum = jax.jit(lambda s: jnp.sum(
        s.params["final_layer"]["kernel"].astype(jnp.float32)))

    def run(iters, state):
        for _ in range(iters):
            db = dict(device_batch)
            db["image"] = normalize_images(db["image"])
            state, _ = step_fn(state, db)
        float(checksum(state))
        return state

    state = run(2, state)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        state = run(6, state)
        dt = (time.perf_counter() - t0) / 6
        best = dt if best is None else min(best, dt)
    sps = batch / best
    tflops = sps * 7.16e9 * 3 / 1e12
    log(f"train step B={batch}: {sps:.1f} samples/s ({best * 1e3:.2f} ms, "
        f"~{tflops:.1f} TF/s)")
    return sps, tflops


def bench_engine(jax, frames=24):
    """Fused detect+pose serving path (engine/fused.py): 720p frame →
    device letterbox → YOLOv5n → device top-k+NMS → 16 pose crops
    (flip-test) → decode, ONE dispatch + ONE readback per frame — the
    latency a video/webcam user sees (reference inference_engine.py
    round-trips the host 4+ times per frame instead)."""
    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.engine.fused import FusedDetectPose

    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    eng = FusedDetectPose(cfg, None, yolo_variant="n", max_persons=16)
    rng_np = np.random.default_rng(2)
    frame = rng_np.integers(0, 256, (720, 1280, 3)).astype(np.uint8)

    eng.infer_frame(frame)   # compile
    eng.infer_frame(frame)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(frames // 2):
            eng.infer_frame(frame)
        dt = (time.perf_counter() - t0) / (frames // 2)
        best = dt if best is None else min(best, dt)
    log(f"fused engine detect+pose (16-person budget, flip): "
        f"{1.0 / best:.1f} fps ({best * 1e3:.1f} ms/frame)")
    return 1.0 / best


if __name__ == "__main__":
    main()
