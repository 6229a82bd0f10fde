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
