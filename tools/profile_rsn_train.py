"""RSN train-step perf study (round 3).

The RSN stack is where the reference burns its training GPU-hours
(8xV100, RSN/README.md:69, iteration-based DDP).  This measures OUR
RSN train step (fwd+bwd+adam, 5-kernel label pyramid, OHKM loss) on the
real chip with the same checksum-synced block-timing methodology as
tools/profile_train.py, across:

  * batch scan (the knee),
  * TPU.REMAT (the reference's RUN_EFFICIENT gradient-checkpointing
    equivalent, RSN/exps/*/network.py:41-44) on vs off,
  * stage_num 1 (RSN18) vs 4 (4XRSN18, the reference's best-model shape).

Usage: python tools/profile_rsn_train.py v0_b32 v0_b64 v0_b128 \
           v_remat_b64 v_4stage_b32 ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(variants):
    import jax
    import jax.numpy as jnp

    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.core.rsn import (make_rsn_optimizer,
                                       make_rsn_train_step)
    from udp_pose_tpu.core.train import TrainState
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.summary import model_flops

    def build(stage_num=1, remat=False, B=64):
        cfg = load_config(os.path.join(
            REPO, "configs", "coco",
            "rsn18_256x192.yaml" if stage_num == 1
            else "4xrsn18_256x192.yaml"))
        cfg.defrost()
        cfg.TPU.REMAT = bool(remat)
        model = build_model(cfg)
        variables = jax.jit(
            lambda r: model.init(r, jnp.zeros((1, 256, 192, 3)),
                                 train=False))(jax.random.PRNGKey(0))
        tx = make_rsn_optimizer(cfg.TRAIN.LR, cfg.TRAIN.WD, 96000)
        state = TrainState.create(
            lambda v, x, **kw: model.apply(v, x, **kw),
            variables["params"], variables["batch_stats"], tx)
        # fwd FLOPs of the eval forward (per crop) for the TF/s figure;
        # train step ~ 3x fwd
        try:
            gf = model_flops(model, variables, (1, 256, 192, 3)) / 1e9
        except Exception:
            gf = float("nan")
        rng = np.random.default_rng(1)
        batch = {
            "image": jax.device_put(rng.integers(
                0, 256, (B, 256, 192, 3)).astype(np.uint8)),
            "labels": jax.device_put(rng.uniform(
                0, 255, (B, 5, 17, 64, 48)).astype(np.float32)),
            "valid": jax.device_put(
                np.ones((B, 17, 1), np.float32)),
        }
        step = make_rsn_train_step(stage_num, ohkm=cfg.LOSS.USE_OHKM,
                                   topk=cfg.LOSS.TOPK)
        return state, step, batch, gf

    def timeit(name, state, step, batch, B, gf, iters=8, blocks=2):
        leaf = jax.tree_util.tree_leaves(state.params)[0]  # noqa: F841
        checksum = jax.jit(lambda s: sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(s.params)[:3]))

        def run(n, state):
            for _ in range(n):
                state, _ = step(state, dict(batch))
            float(checksum(state))
            return state

        state = run(2, state)
        best = None
        for _ in range(blocks):
            t0 = time.perf_counter()
            state = run(iters, state)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        sps = B / best
        tfs = sps * gf * 1e9 * 3 / 1e12
        print(f"{name:24s} {best * 1e3:8.2f} ms  {sps:8.1f} samples/s "
              f"(fwd {gf:.2f} GF/crop, ~{tfs:.1f} TF/s)", flush=True)
        return best

    for v in variants:
        B = int(v.rsplit("_b", 1)[1]) if "_b" in v else 64
        if v.startswith("v0"):
            state, step, batch, gf = build(B=B)
            timeit(f"rsn18 B={B}", state, step, batch, B, gf)
        elif v.startswith("v_remat"):
            state, step, batch, gf = build(remat=True, B=B)
            timeit(f"rsn18 remat B={B}", state, step, batch, B, gf)
        elif v.startswith("v_4stage_remat"):
            state, step, batch, gf = build(stage_num=4, remat=True, B=B)
            timeit(f"4xrsn18 remat B={B}", state, step, batch, B, gf)
        elif v.startswith("v_4stage"):
            state, step, batch, gf = build(stage_num=4, B=B)
            timeit(f"4xrsn18 B={B}", state, step, batch, B, gf)
        else:
            print(f"unknown variant {v}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:] or ["v0_b64"])
