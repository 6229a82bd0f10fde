"""Model export CLI (parity role: deep_hrnet/tools/export.py).

Formats (all with an output-parity assertion, the reference's
export.py:56 ``np.testing.assert_allclose`` pattern):

* ``stablehlo`` — the portable XLA interchange format (consumable by
  ONNX converters, IREE, TF, serving runtimes); asserts jit-vs-eager.
* ``onnx`` — a real ``.onnx`` artifact (opset 11, the reference's
  default), serialized by the in-repo protobuf writer
  (udp_pose_tpu/export) — no onnx package needed — and verified by
  executing the artifact with the in-repo spec evaluator vs the flax
  forward.  Supported: pose_resnet, pose_hrnet, rsn.
* ``tflite`` / ``savedmodel`` — mobile/serving artifacts via jax2tf,
  verified by running the TFLite interpreter / TF function in-process.
  ``--quantize dynamic|int8`` emits an int8-quantized TFLite artifact
  (weight-only, or + representative-dataset activation calibration) —
  the exporter-native analogue of the reference's post-hoc
  ONNX→MNN/OpenVINO int8 conversion (scripts/export_mnn.sh).
* ``pth`` — reference-format torch state_dict
  (utils/torch_convert.flax_to_torch_from_cfg), loadable with
  ``strict=True`` by the reference models, so the reference's own
  torch→ONNX/MNN/OpenVINO tooling (tools/export.py:21-56,
  scripts/export_mnn.sh) also works off-image.

Usage: python tools/export.py --cfg exp.yaml [--weights w.msgpack]
       [--batch 1] [--out model.onnx]
       [--format stablehlo|onnx|tflite|savedmodel|pth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Export model to StableHLO")
    p.add_argument("--cfg", default="")
    p.add_argument("--yolo", default="",
                   help="export the native YOLOv5 detector instead of a "
                        "pose model, e.g. 'yolov5n' (--format onnx only)")
    p.add_argument("--det-size", type=int, default=640)
    p.add_argument("--weights", default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default="")
    p.add_argument("--format", default="stablehlo",
                   choices=("stablehlo", "onnx", "tflite", "savedmodel",
                            "pth"))
    p.add_argument("--quantize", default="",
                   choices=("", "dynamic", "int8"),
                   help="TFLite PTQ: 'dynamic' = int8 weights only, "
                        "'int8' adds representative-dataset activation "
                        "calibration (--format tflite)")
    p.add_argument("--skip-check", action="store_true",
                   help="skip the output-parity verification run")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def _export_yolo(args):
    """Native YOLOv5 detector → parity-checked .onnx."""
    import jax
    import jax.numpy as jnp
    from udp_pose_tpu.export.onnx_eval import check_model
    from udp_pose_tpu.export.onnx_yolo import build_yolov5
    from udp_pose_tpu.models.yolov5 import YOLOv5
    from udp_pose_tpu.utils.checkpoint import load_weights
    from udp_pose_tpu.utils.torch_convert import flax_to_torch_yolov5

    if args.format == "stablehlo":    # the argparse default → onnx here
        args.format = "onnx"
    if args.format != "onnx":
        raise SystemExit("--yolo supports --format onnx")
    variant = args.yolo.replace("yolov5", "")
    model = YOLOv5(variant=variant)
    s = args.det_size
    if args.weights:
        variables = load_weights(args.weights)
    else:
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, s, s, 3), jnp.float32), train=False)
        )(jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda a: np.asarray(a, np.float32), variables)
    sd = flax_to_torch_yolov5(variables)
    blob = build_yolov5(sd, variant, image_hw=(s, s), batch=args.batch)
    out_path = args.out or f"yolov5{variant}.onnx"
    with open(out_path, "wb") as f:
        f.write(blob)
    if not args.skip_check:
        rng = np.random.default_rng(1)
        x = rng.random((args.batch, s, s, 3)).astype(np.float32)
        y = np.asarray(model.apply(variables, x, train=False))
        err = check_model(blob, x.transpose(0, 3, 1, 2), y,
                          rtol=1e-3, atol=2e-3)
        print(f"onnx-vs-flax parity OK (max abs err {err:.2e})")
    print(f"exported {out_path} ({len(blob)} bytes)")


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

    if args.quantize and args.format != "tflite":
        raise SystemExit("--quantize applies to --format tflite "
                         "(device int8 serving is TPU.QUANTIZE/--quantize "
                         "on the infer/test/serve CLIs)")
    if args.yolo:
        _export_yolo(args)
        return
    if not args.cfg:
        raise SystemExit("--cfg is required (or use --yolo)")
    cfg = load_config(args.cfg, args.opts)
    if args.format in ("onnx", "tflite", "savedmodel"):
        # deploy artifacts are fp32 (the reference exports fp32 ONNX);
        # bf16 is a TPU compute-dtype choice, not a weight format here
        cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    shape = (args.batch, h, w, 3)

    if args.weights:
        variables = load_weights(args.weights)
    else:
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, h, w, 3), jnp.float32), train=False)
        )(jax.random.PRNGKey(0))
    if args.format in ("onnx", "tflite", "savedmodel", "pth"):
        variables = jax.tree.map(
            lambda a: np.asarray(a, np.float32)
            if np.asarray(a).dtype != np.float32 else np.asarray(a),
            variables)

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

    if args.format == "onnx":
        from udp_pose_tpu.export import check_model, export_onnx_from_cfg
        blob = export_onnx_from_cfg(variables, cfg, batch=args.batch)
        out_path = args.out or os.path.splitext(args.cfg)[0] + ".onnx"
        with open(out_path, "wb") as f:
            f.write(blob)
        print(f"exported ONNX opset 11 ({len(blob)} bytes) -> {out_path}")
        if not args.skip_check:
            rng = np.random.default_rng(0)
            x = rng.normal(size=(args.batch, 3, h, w)).astype(np.float32)
            apply = jax.jit(lambda v, im: model.apply(v, im, train=False))
            y = np.asarray(apply(variables, x.transpose(0, 2, 3, 1))
                           ).transpose(0, 3, 1, 2)
            # atol scales with output magnitude: random-init (unnormalised)
            # weights can blow activations to ~1e3, amplifying fp32 noise
            atol = max(1e-3, 1e-5 * float(np.abs(y).max()))
            err = check_model(blob, x, y, rtol=1e-2, atol=atol)
            print(f"onnx-vs-flax parity OK (max abs err {err:.2e})")
        return

    if args.format in ("tflite", "savedmodel"):
        export_tf(args, cfg, model, variables, shape)
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


def export_tf(args, cfg, model, variables, shape):
    """jax2tf → TF SavedModel or TFLite flatbuffer, with an in-process
    interpreter-vs-flax parity check (the reference's onnxruntime-vs-torch
    assert, export.py:45-56, with LiteRT as the runtime)."""
    import jax
    import jax.numpy as jnp
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    from jax.experimental import jax2tf
    import tensorflow as tf

    def fwd(images):
        return model.apply(variables, images, train=False)

    tf_fwd = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        input_signature=[tf.TensorSpec(shape, tf.float32, name="images")],
        autograph=False)

    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    y_flax = np.asarray(jax.jit(fwd)(jnp.asarray(x)))

    if args.format == "savedmodel":
        out_path = args.out or os.path.splitext(args.cfg)[0] + "_savedmodel"
        module = tf.Module()
        module.f = tf_fwd
        tf.saved_model.save(module, out_path,
                            signatures={"serving_default": tf_fwd})
        print(f"exported SavedModel -> {out_path}")
        if not args.skip_check:
            reloaded = tf.saved_model.load(out_path)
            y_tf = reloaded.signatures["serving_default"](
                images=tf.constant(x))
            y_tf = np.asarray(list(y_tf.values())[0])
            np.testing.assert_allclose(y_tf, y_flax, rtol=1e-3, atol=1e-4)
            print(f"savedmodel-vs-flax parity OK "
                  f"(max abs err {np.abs(y_tf - y_flax).max():.2e})")
        return

    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fwd.get_concrete_function()])
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    # TFLite PTQ (the reference's int8 deployment story is post-hoc
    # ONNX→MNN/OpenVINO conversion, scripts/export_mnn.sh; here the int8
    # artifact comes straight out of the exporter): ``dynamic`` = int8
    # weights / fp activations (always converts, ~4x smaller artifact);
    # ``int8`` adds representative-dataset activation calibration, with
    # float fallback for ops TFLite's quantizer can't handle.
    quantize = getattr(args, "quantize", "")
    if quantize:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        if quantize == "int8":
            def rep():
                r = np.random.default_rng(1)
                for _ in range(16):
                    yield [r.normal(size=shape).astype(np.float32)]
            converter.representative_dataset = rep
    tflite_bytes = converter.convert()
    out_path = args.out or os.path.splitext(args.cfg)[0] + ".tflite"
    with open(out_path, "wb") as f:
        f.write(tflite_bytes)
    print(f"exported TFLite{f' ({quantize})' if quantize else ''} "
          f"({len(tflite_bytes)} bytes) -> {out_path}")
    if not args.skip_check:
        # Quantized graphs can hard-abort (SIGABRT, no Python exception)
        # inside this TF build's interpreter AllocateTensors — measured
        # here for calibrated-int8 HRNet/ResNet graphs while the same
        # artifacts' ops (CONV_2D/TRANSPOSE_CONV/PADV2 int8) each run
        # fine in isolation.  The check therefore runs in a SUBPROCESS so
        # a runtime abort is a reportable result, not a dead exporter.
        err = _tflite_check_subprocess(out_path, x, y_flax)
        if err is None:
            msg = (f"this TF build's TFLite interpreter cannot execute the "
                   f"{quantize or 'fp32'} artifact (native abort in "
                   f"AllocateTensors); artifact kept at {out_path} — "
                   f"validate on a LiteRT runtime, or use "
                   f"--quantize dynamic which verifies here")
            if quantize == "int8":
                print(f"WARNING: {msg}")
            else:
                raise SystemExit(f"tflite check failed: {msg}")
        elif quantize:
            # int8 grids bound the drift; assert an envelope, report exact
            assert err < 0.25, f"quantized tflite drift too large: {err}"
            print(f"tflite({quantize})-vs-flax drift OK "
                  f"(max abs err {err:.3f})")
        else:
            assert err < 1e-3 + 1e-2 * np.abs(y_flax).max(), \
                f"tflite-vs-flax parity failed: max abs err {err}"
            print(f"tflite-vs-flax parity OK (max abs err {err:.2e})")


def _tflite_check_subprocess(model_path, x, y_ref):
    """Run the artifact in a child interpreter; returns max-abs-err, or
    None if the child died on a native abort (kernel limitation of the
    local runtime, not an artifact-format failure)."""
    import subprocess
    import sys
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, x=x)
        code = f"""
import numpy as np, tensorflow as tf
x = np.load({f.name!r})["x"]
try:
    interp = tf.lite.Interpreter(model_path={model_path!r})
    interp.allocate_tensors()
except RuntimeError:
    interp = tf.lite.Interpreter(
        model_path={model_path!r},
        experimental_op_resolver_type=tf.lite.experimental
        .OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES)
    interp.allocate_tensors()
inp = interp.get_input_details()[0]
out = interp.get_output_details()[0]
interp.set_tensor(inp["index"], x)
interp.invoke()
np.save({f.name!r} + ".out.npy", interp.get_tensor(out["index"]))
"""
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=600)
        if proc.returncode != 0:
            if proc.returncode < 0:        # killed by a signal: native abort
                return None
            raise RuntimeError(f"tflite check subprocess failed:\n"
                               f"{proc.stderr[-1500:]}")
        y = np.load(f.name + ".out.npy")
        os.unlink(f.name + ".out.npy")
        return float(np.abs(y - y_ref).max())


if __name__ == "__main__":
    main()
