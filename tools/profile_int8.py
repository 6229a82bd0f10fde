"""int8 PTQ A/B probe on the real chip (round-3 int8 study harness).

Reproduces the DESIGN.md int8 measurements as one command — checksum-
synced differenced block timing (the axon relay's block_until_ready does
not await remote execution, so sync is a scalar readback and fixed
tunnel latency cancels in the difference):

  python tools/profile_int8.py pose                 # headline w32 256x192
  python tools/profile_int8.py pose --cfg configs/coco/rsn18_256x192.yaml
  python tools/profile_int8.py pose --flip --batch 128
  python tools/profile_int8.py det n l              # YOLOv5 variants

``pose`` measures the full inference pipeline (normalize + forward +
decode) three ways: bf16, int8 with the in-graph per-forward weight
requant, and int8 with prepared kernels (prepare_variables — the
serving default).  ``det`` measures the raw YOLOv5 canvas forward fp32
vs int8 at 640x640 B=1 (the fused engine's detector subgraph shape).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe_pose(cfg_path, batch, flip):
    import jax
    import jax.numpy as jnp

    import bench

    if cfg_path:
        from udp_pose_tpu.config import load_config
        cfg = load_config(cfg_path)
        cfg.defrost()
        cfg.TPU.DTYPE = "bfloat16"
    else:
        cfg = bench._headline_cfg()
    for tag, kw in (("bf16", dict(quantize=False)),
                    ("int8 in-graph requant", dict(quantize=True,
                                                   prepare=False)),
                    ("int8 prepared kernels", dict(quantize=True,
                                                   prepare=True))):
        cps = bench.bench_family(jax, jnp, cfg, batch, flip=flip, **kw)
        print(f"{cfg.MODEL.NAME} B={batch} flip={flip} {tag}: "
              f"{cps:.1f} crops/s", flush=True)


def probe_det(variants, size=640, iters=(4, 12)):
    import jax
    import jax.numpy as jnp

    from udp_pose_tpu.models.quantize import QuantizedModel, calibrate
    from udp_pose_tpu.models.yolov5 import YOLOv5

    for variant in variants:
        model = YOLOv5(variant=variant)
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = jax.jit(lambda r, m=model: m.init(r, dummy,
                                                      train=False))(
            jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = jax.device_put(rng.uniform(0, 1, (1, size, size, 3))
                           .astype(np.float32))
        scales = calibrate(model, variables, [x])
        print(f"yolov5{variant}: calibrated {len(scales)} sites",
              flush=True)
        checksum = jax.jit(lambda p: jnp.sum(p))

        qm = QuantizedModel(model, scales)
        for tag, m, v in (("fp32", model, variables),
                          ("int8", qm, qm.prepare_variables(variables))):
            fn = jax.jit(lambda vv, xx, m=m: m.apply(vv, xx, train=False))

            def timed(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    pred = fn(v, x)
                float(checksum(pred))
                return time.perf_counter() - t0

            timed(2)                                 # compile + warm
            ts, tl = timed(iters[0]), timed(iters[1])
            per = (tl - ts) / (iters[1] - iters[0])
            print(f"yolov5{variant} {size} B=1 {tag}: "
                  f"{per * 1e3:.2f} ms/frame", flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    pp = sub.add_parser("pose")
    pp.add_argument("--cfg", default="",
                    help="config yaml (default: headline w32 256x192)")
    pp.add_argument("--batch", type=int, default=128)
    pp.add_argument("--flip", action="store_true",
                    help="eval protocol (flip-test fold); default is the "
                         "no-flip serving protocol")
    pd = sub.add_parser("det")
    pd.add_argument("variants", nargs="*", default=["n"],
                    help="YOLOv5 variants, e.g. n s m l")
    args = p.parse_args()
    from udp_pose_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()          # UDP_POSE_PLATFORM=cpu for smoke runs
    if args.mode == "pose":
        probe_pose(args.cfg, args.batch, args.flip)
    else:
        probe_det(args.variants or ["n"])


if __name__ == "__main__":
    main()
