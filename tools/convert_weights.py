"""Convert reference ``.pth`` checkpoints to framework msgpack weights.

Usage:
  python tools/convert_weights.py --cfg configs/coco/hrnet_w32_256x192_udp_offset.yaml \
      --pth pose_hrnet_w32_256x192.pth --out w32_udp.msgpack
  python tools/convert_weights.py --cfg ... --pth yolov5n.pt --arch yolov5n ...

The architecture is taken from the config (or --arch for detectors); the
converted tree is shape-checked against a fresh init before writing.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--arch", default="",
                   help="override: yolov5n/yolov5s for detector checkpoints")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    from udp_pose_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()
    from flax import serialization
    from udp_pose_tpu.utils import torch_convert as tc

    sd = tc.load_torch_state_dict(args.pth)

    if args.arch.startswith("yolov5"):
        from udp_pose_tpu.models.yolov5 import YOLOv5
        variant = args.arch.replace("yolov5", "")
        variables, unused = tc.convert_yolov5(sd, variant)
        model = YOLOv5(variant=variant)
        shape = (1, 640, 640, 3)
    else:
        from udp_pose_tpu.config import load_config
        from udp_pose_tpu.models import build_model
        cfg = load_config(args.cfg, args.opts)
        try:
            variables, unused = tc.torch_to_flax_from_cfg(sd, cfg)
        except KeyError as e:
            raise SystemExit(str(e))
        model = build_model(cfg)
        w, h = cfg.MODEL.IMAGE_SIZE
        shape = (1, h, w, 3)

    if unused:
        print(f"warning: {len(unused)} unused torch keys, e.g. {unused[:5]}")
    variables = tc.check_against_model(variables, model, shape)
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(variables))
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
