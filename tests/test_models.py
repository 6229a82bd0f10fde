"""Model zoo: shape, param-count, and config-surface tests.

Param counts are checked against the reference's published numbers
(BASELINE.md: pose_resnet_50+UDP 34.2M, pose_hrnet_w32+UDP 28.7M) — a strong
structural-parity signal without weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udp_pose_tpu.config import default_config
from udp_pose_tpu.models import build_model

HRNET_W32_EXTRA = {
    "FINAL_CONV_KERNEL": 1,
    "PRETRAINED_LAYERS": ["*"],
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [32, 64],
               "FUSE_METHOD": "SUM"},
    "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [32, 64, 128],
               "FUSE_METHOD": "SUM"},
    "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4, 4, 4],
               "NUM_CHANNELS": [32, 64, 128, 256], "FUSE_METHOD": "SUM"},
}


def _resnet_cfg(target_type="gaussian", layers=50):
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = target_type
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.MODEL.EXTRA.NUM_LAYERS = layers
    cfg.MODEL.EXTRA.NUM_DECONV_LAYERS = 3
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [256, 256, 256]
    cfg.MODEL.EXTRA.NUM_DECONV_KERNELS = [4, 4, 4]
    cfg.MODEL.EXTRA.DECONV_WITH_BIAS = False
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    cfg.TPU.DTYPE = "float32"
    return cfg


def _hrnet_cfg(target_type="gaussian", psa=False):
    cfg = default_config()
    cfg.MODEL.NAME = "pose_hrnet_psa" if psa else "pose_hrnet"
    cfg.MODEL.TARGET_TYPE = target_type
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_W32_EXTRA)
    cfg.TPU.DTYPE = "float32"
    return cfg


def _n_params(variables):
    return sum(np.prod(p.shape) for p in
               jax.tree_util.tree_leaves(variables["params"]))


def test_pose_resnet50_shapes_and_params():
    cfg = _resnet_cfg()
    model = build_model(cfg)
    x = jnp.zeros((1, 256, 192, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 48, 17)
    n = _n_params(variables)
    # reference: 34.0M (gaussian head) per BASELINE.md ResNet-50 row
    assert abs(n - 34.0e6) / 34.0e6 < 0.01, n


def test_pose_resnet50_offset_head():
    cfg = _resnet_cfg(target_type="offset")
    model = build_model(cfg)
    x = jnp.zeros((1, 256, 192, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 48, 51)
    n = _n_params(variables)
    assert abs(n - 34.2e6) / 34.2e6 < 0.01, n


def test_pose_hrnet_w32_shapes_and_params():
    cfg = _hrnet_cfg(target_type="offset")
    model = build_model(cfg)
    x = jnp.zeros((1, 256, 192, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 48, 51)
    n = _n_params(variables)
    # reference: 28.7M params for pose_hrnet_w32 + UDP offset (BASELINE.md)
    assert abs(n - 28.7e6) / 28.7e6 < 0.01, n


# (pose_hrnet_psa construction+forward is covered more strongly by
# tests/test_torch_convert.py::test_pose_hrnet_parity[True-gaussian],
# which also checks output parity with converted reference weights.)


def test_train_mode_updates_batch_stats():
    cfg = _resnet_cfg(layers=18)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b)
               for a, b in zip(leaves_before, leaves_after))


def test_unknown_model_raises():
    cfg = _resnet_cfg()
    cfg.MODEL.NAME = "nope"
    with pytest.raises(KeyError):
        build_model(cfg)


def test_hrnet_remat_stem_is_math_identical():
    """PoseHRNet.remat_stem (perf knob, DESIGN.md train study): same
    param tree, same outputs — only the bwd recompute schedule changes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.models import build_model

    cfg = default_config()
    cfg.MODEL.NAME = "pose_hrnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.EXTRA.merge_from_dict({
        "FINAL_CONV_KERNEL": 1,
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [16, 32],
                   "FUSE_METHOD": "SUM"},
        "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [16, 32, 64],
                   "FUSE_METHOD": "SUM"},
        "STAGE4": {"NUM_MODULES": 1, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [1, 1, 1, 1],
                   "NUM_CHANNELS": [16, 32, 64, 128],
                   "FUSE_METHOD": "SUM"},
    })
    plain = build_model(cfg)
    remat = plain.clone(remat_stem=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32))
    v_plain = plain.init(jax.random.PRNGKey(0), x, train=False)
    v_remat = remat.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_plain) == \
        jax.tree_util.tree_structure(v_remat)
    y1 = plain.apply(v_plain, x, train=False)
    y2 = remat.apply(v_plain, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    # grads identical too (remat only changes the recompute schedule)
    def loss(model, v):
        return jnp.sum(model.apply(v, x, train=False) ** 2)

    g1 = jax.grad(lambda v: loss(plain, v))(v_plain)
    g2 = jax.grad(lambda v: loss(remat, v))(v_plain)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), g1, g2)


@pytest.mark.parametrize("target_type", ["gaussian", "offset"])
def test_flip_mode_two_pass_matches_fold(target_type):
    """The two_pass flip-test schedule (round-4 perf fix: two B-sized
    forwards tile better than one 2B forward) must be numerically
    equivalent to the round-1 fold-in-batch schedule — identical
    sample-wise math, so decoded keypoints match to float tolerance."""
    from udp_pose_tpu.core.infer import make_infer_fn

    cfg = _resnet_cfg(target_type=target_type, layers=18)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 256, 192, 3)), train=False))(rng)

    g = np.random.default_rng(5)
    images = g.integers(0, 256, (4, 256, 192, 3)).astype(np.uint8)
    center = np.tile(np.array([[100.0, 120.0]], np.float32), (4, 1))
    scale = np.tile(np.array([[0.9, 1.2]], np.float32), (4, 1))

    outs = {}
    for mode in ("two_pass", "fold"):
        infer = make_infer_fn(model, target_type=target_type,
                              flip_test=True, post_process=True,
                              flip_mode=mode)
        preds, maxvals, hm = infer(variables, images, center, scale)
        outs[mode] = (np.asarray(preds), np.asarray(maxvals),
                      np.asarray(hm))
    np.testing.assert_allclose(outs["two_pass"][2], outs["fold"][2],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["two_pass"][0], outs["fold"][0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(outs["two_pass"][1], outs["fold"][1],
                               rtol=1e-5, atol=1e-5)
