"""Native YOLOv5: shapes, decode geometry, detector wrapper E2E."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udp_pose_tpu.models.yolov5 import ANCHORS, STRIDES, VARIANTS, YOLOv5


def test_yolov5n_output_shape():
    model = YOLOv5(variant="n")
    x = jnp.zeros((1, 320, 320, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    n_expected = sum((320 // s) ** 2 * 3 for s in STRIDES)
    assert out.shape == (1, n_expected, 85)
    out = np.asarray(out)
    # decode geometry bounds: xy within [-stride/2, size+stride/2],
    # wh in (0, 4*max_anchor], scores in (0,1)
    assert out[..., 0].min() > -20 and out[..., 0].max() < 340
    assert out[..., 2:4].min() > 0
    assert out[..., 2:4].max() <= 4 * 373 + 1
    assert 0 < out[..., 4].min() and out[..., 4].max() < 1


def test_yolov5_param_counts_scale_with_variant():
    def n_params(variant):
        m = YOLOv5(variant=variant)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
        return sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(v["params"]))
    n_n = n_params("n")
    n_s = n_params("s")
    # ultralytics: yolov5n 1.9M, yolov5s 7.2M params
    assert abs(n_n - 1.9e6) / 1.9e6 < 0.08, n_n
    assert abs(n_s - 7.2e6) / 7.2e6 < 0.08, n_s


def test_flax_yolo_detector_wrapper():
    from udp_pose_tpu.engine.detector import build_flax_yolo_detector
    det = build_flax_yolo_detector(variant="n", input_size=320,
                                   conf_thres=0.9999)
    rng = np.random.default_rng(180)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    out = det.infer(img)   # random weights + high threshold → None or few
    assert out is None or (out.ndim == 2 and out.shape[1] == 4)


def test_yolov5_pt_key_mapping_complete():
    """Round-trip the converter against a synthetic ultralytics-layout
    state dict (shapes derived from the flax init) — validates that the
    key translation covers the whole tree with correct layouts."""
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_yolov5,
                                                  _YOLO_LAYERS)
    rng = np.random.default_rng(200)
    model = YOLOv5(variant="n")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)

    # build the torch-layout dict by inverting the conversion rules
    sd = {}

    def put_conv(tkey, fparams, bias=False):
        k = np.asarray(fparams["kernel"])            # (kh,kw,I,O)
        sd[tkey + ".weight"] = np.ascontiguousarray(
            k.transpose(3, 2, 0, 1))
        if bias or "bias" in fparams:
            sd[tkey + ".bias"] = np.asarray(fparams["bias"])

    def put_bn(tkey, fparams, fstats):
        sd[tkey + ".weight"] = np.asarray(fparams["scale"])
        sd[tkey + ".bias"] = np.asarray(fparams["bias"])
        sd[tkey + ".running_mean"] = np.asarray(fstats["mean"])
        sd[tkey + ".running_var"] = np.asarray(fstats["var"])

    def put_unit(tp, fp_params, fp_stats):
        put_conv(f"model.{tp}.conv", fp_params["conv"])
        put_bn(f"model.{tp}.bn", fp_params["bn"], fp_stats["bn"])

    params, stats = v["params"], v["batch_stats"]
    for idx, name, kind in _YOLO_LAYERS:
        if kind == "conv":
            put_unit(idx, params[name], stats[name])
        elif kind == "c3":
            for cvn in ("cv1", "cv2", "cv3"):
                put_unit(f"{idx}.{cvn}", params[name][cvn], stats[name][cvn])
            j = 0
            while f"m{j}" in params[name]:
                for cvn in ("cv1", "cv2"):
                    put_unit(f"{idx}.m.{j}.{cvn}",
                             params[name][f"m{j}"][cvn],
                             stats[name][f"m{j}"][cvn])
                j += 1
        elif kind == "sppf":
            put_unit(f"{idx}.cv1", params[name]["cv1"], stats[name]["cv1"])
            put_unit(f"{idx}.cv2", params[name]["cv2"], stats[name]["cv2"])
    for li in range(3):
        put_conv(f"model.24.m.{li}", params[f"detect{li}"], bias=True)

    variables, unused = convert_yolov5(sd, "n")
    assert not unused, unused[:8]
    variables = check_against_model(variables, model, (1, 64, 64, 3))
    # round-trip: converted output == original output
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 64, 64, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, x, train=False)),
        np.asarray(model.apply(v, x, train=False)), rtol=1e-5, atol=1e-5)
