"""Model export CLI (parity role: deep_hrnet/tools/export.py).

The reference exports torch→ONNX with an output-parity assertion
(export.py:56 ``np.testing.assert_allclose``).  The TPU-native equivalent
exports the jitted forward to **StableHLO** (the portable XLA interchange
format; consumable by ONNX converters, IREE, TF, serving runtimes) and
asserts jit-vs-eager output parity in the same spirit.

With ``--format pth`` it instead emits a reference-format torch
state_dict (utils/torch_convert.flax_to_torch_from_cfg) — loadable with
``strict=True`` by the reference models, so the reference's own
torch→ONNX/MNN/OpenVINO tooling (tools/export.py:21-56,
scripts/export_mnn.sh) covers the non-TPU deployment surface.

Usage: python tools/export.py --cfg exp.yaml [--weights w.msgpack]
       [--batch 1] [--out model.stablehlo] [--format stablehlo|pth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Export model to StableHLO")
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default="")
    p.add_argument("--format", default="stablehlo",
                   choices=("stablehlo", "pth"))
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    from udp_pose_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.checkpoint import load_weights

    cfg = load_config(args.cfg, args.opts)
    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    shape = (args.batch, h, w, 3)

    if args.weights:
        variables = load_weights(args.weights)
    else:
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, h, w, 3), jnp.float32), train=False)
        )(jax.random.PRNGKey(0))

    if args.format == "pth":
        import torch
        from udp_pose_tpu.utils.torch_convert import flax_to_torch_from_cfg
        sd = flax_to_torch_from_cfg(variables, cfg)
        out_path = args.out or os.path.splitext(args.cfg)[0] + ".pth"
        torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
                   out_path)
        print(f"exported reference-format state_dict "
              f"({len(sd)} tensors) -> {out_path}")
        return

    def fwd(images):
        return model.apply(variables, images, train=False)

    # jit-vs-eager parity (the reference's ONNX-vs-torch allclose pattern)
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    y_eager = np.asarray(fwd(jnp.asarray(x)))
    y_jit = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    np.testing.assert_allclose(y_jit, y_eager, rtol=1e-3, atol=1e-5)
    print(f"jit-vs-eager parity OK: output {y_jit.shape}")

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(shape, jnp.float32))
    hlo_text = exported.mlir_module()
    out_path = args.out or os.path.splitext(args.cfg)[0] + ".stablehlo"
    with open(out_path, "w") as f:
        f.write(hlo_text)
    print(f"exported StableHLO ({len(hlo_text)} bytes) -> {out_path}")

    # serialized portable artifact as well
    ser = exported.serialize()
    with open(out_path + ".bin", "wb") as f:
        f.write(ser)
    print(f"serialized exported fn -> {out_path}.bin ({len(ser)} bytes)")


if __name__ == "__main__":
    main()
