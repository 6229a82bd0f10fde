"""TFLite / SavedModel export path: jax2tf round-trip parity.

The reference's mobile deployment surface is ONNX→MNN
(deep_hrnet/scripts/export_mnn.sh); the TPU-stack analogue is
jax2tf→TFLite.  This exercises tools/export.export_tf end-to-end with
the TFLite interpreter as the runtime oracle (export.py:45-56 pattern).

TF import + conversion are slow (~1 min); one small model covers the
converter path, the CLI is driven on the full zoo out-of-band.
"""

import os
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_tflite_roundtrip(tmp_path):
    import jax
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.models import build_model
    import export as export_cli

    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [32, 32], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    model = build_model(cfg)
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    out = tmp_path / "m.tflite"
    args = types.SimpleNamespace(format="tflite", out=str(out),
                                 cfg="x.yaml", skip_check=False)
    # export_tf runs the interpreter-vs-flax assert internally
    export_cli.export_tf(args, cfg, model, variables, (1, 64, 64, 3))
    assert out.stat().st_size > 10000

    # artifact is a valid flatbuffer loadable by a fresh interpreter
    interp = tf.lite.Interpreter(model_path=str(out))
    interp.allocate_tensors()
    det = interp.get_output_details()[0]
    # /32 backbone + two ×2 deconvs → /8 heatmaps (NHWC)
    assert tuple(det["shape"]) == (1, 8, 8, 17)


def test_tflite_int8_quantized(tmp_path):
    """--quantize dynamic/int8: the artifact shrinks ~4x (int8 weights)
    and the interpreter output stays inside the PTQ drift envelope
    (export_tf asserts it internally)."""
    import jax
    import jax.numpy as jnp
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.models import build_model
    import export as export_cli

    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [32, 32], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1,
    })
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    sizes = {}
    for mode in ("", "dynamic", "int8"):
        out = tmp_path / f"m_{mode or 'fp'}.tflite"
        args = types.SimpleNamespace(format="tflite", out=str(out),
                                     cfg="x.yaml", skip_check=False,
                                     quantize=mode)
        export_cli.export_tf(args, cfg, model, variables, (1, 64, 64, 3))
        sizes[mode] = out.stat().st_size
    # int8 weights: ~4x smaller than the fp32 flatbuffer
    assert sizes["dynamic"] < 0.5 * sizes[""], sizes
    assert sizes["int8"] < 0.5 * sizes[""], sizes
