"""Data-parallel scaling trend on the virtual CPU mesh (VERDICT r2 #7).

Child process of bench.py (the parent owns the TPU backend; the CPU
platform must be forced before any jax device query).  All N virtual
devices share the same physical cores, so *speedup* cannot be measured
here — what CAN be pinned is GSPMD sharding overhead: the same TOTAL
batch through the 1-device program vs the N-way-sharded program.
Prints one JSON line:

  {"n_devices": N, "sps_1": ..., "sps_n": ..., "sharding_efficiency": ...}

sharding_efficiency = sps_n / sps_1 — 1.0 means partitioning the step
8 ways (param broadcasts, grad psums, halo logic) costs nothing over
the unpartitioned program on identical hardware.  Caveat: XLA-CPU runs
each virtual device on its own thread pool, so part of the measured
drop is host thread scheduling rather than GSPMD-inserted work — the
number is an upper bound on the partitioning overhead a real ICI mesh
would see (measured ~0.75 here, min-of-blocks).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main(n_devices=8, total_batch=16, iters=8):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from __graft_entry__ import _reduced_flagship_cfg
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import create_train_state, make_train_step
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.parallel import make_mesh, replicated, shard_batch

    # the dryrun_multichip proxy program (shared helper): full topology,
    # 1 module/stage, 64×64 — XLA-CPU compiles in ~1 min instead of >20
    cfg = _reduced_flagship_cfg()
    model = build_model(cfg)
    step = make_train_step(make_loss_fn(cfg))
    rng = np.random.default_rng(0)

    def run(n_dev):
        mesh = make_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        B = total_batch
        batch = {
            "image": rng.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32),
            "target": rng.uniform(0, 1, (B, 51, 16, 16)).astype(np.float32),
            "target_weight": np.ones((B, 17), np.float32),
        }
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
        state = jax.device_put(state, replicated(mesh))
        db = shard_batch(mesh, batch)
        state, m = step(state, db)          # compile
        jax.block_until_ready(m["loss"])
        best = None                         # min-of-blocks: host-load noise
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, db)
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        return B / best

    sps_1 = run(1)
    sps_n = run(n_devices)
    eff = sps_n / sps_1
    print(json.dumps({"n_devices": n_devices, "sps_1": round(sps_1, 1),
                      "sps_n": round(sps_n, 1),
                      "sharding_efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
