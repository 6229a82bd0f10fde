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
    for batch in (32, 64, 128):
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
                 "est. 350 crops/s PyTorch-A100 fp32 (target >5x => 5.0)",
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
