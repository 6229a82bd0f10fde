"""Full mobile pose-wrapper conversion: torch ↔ flax, both directions.

Instantiates the ACTUAL reference pose wrappers (imported read-only from
/root/reference at test time), random-initialises, converts the full
state_dict with convert_pose_mobile, and requires

* output parity of the flax forward vs the torch forward, and
* an exact reverse round-trip (flax_to_torch → value-identical sd that a
  fresh reference wrapper accepts with strict load)

for every mobile registry family.  mobilenet_v3 uses the test-local
torchvision-layout oracle (torchvision itself is not installed here).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

REF_MODELS = "/root/reference/deep_hrnet/lib/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason="reference checkout not present")

from test_convert_mobile_zoo import _randomize, _ref_module, \
    _tv_mobilenet_v3_small
from test_torch_convert import _base_cfg


def _pose_cfg(name, target_type="gaussian", extra=None, config=""):
    cfg = _base_cfg(name, target_type)
    cfg.MODEL.CONFIG = config
    base = {"NUM_DECONV_LAYERS": 3, "NUM_DECONV_FILTERS": [256, 256, 256],
            "NUM_DECONV_KERNELS": [4, 4, 4], "DECONV_WITH_BIAS": False,
            "FINAL_CONV_KERNEL": 1, "START_CHANNELS": 256,
            "ARCHITECTURE": [512, 256, 128]}
    base.update(extra or {})
    cfg.MODEL.EXTRA.merge_from_dict(base)
    return cfg


def _roundtrip_and_parity(tmodel, cfg, atol=2e-3):
    import jax.numpy as jnp
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_pose_mobile,
                                                  flax_to_torch_from_cfg)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables, unused = convert_pose_mobile(sd, cfg)
    assert not unused, unused[:8]

    fmodel = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = check_against_model(variables, fmodel, (1, h, w, 3))

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape, (yt.shape, yf.shape)
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=atol)

    # exact reverse round-trip + strict-load acceptance (the backbone's
    # dead classifier-head keys never run in the pose forward and are
    # legitimately absent from the reverse sd)
    def _dead(k):
        return ("num_batches_tracked" in k
                or any(s in k for s in ("classifier", "fc.", "LastSE",
                                        "globalpool", "avgpool")))

    back = flax_to_torch_from_cfg(variables, cfg)
    missing = {k for k in set(sd) - set(back) if not _dead(k)}
    extra = {k for k in set(back) - set(sd) if not _dead(k)}
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in sd:
        if not _dead(k):
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
    result = tmodel.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in back.items()
         if "num_batches_tracked" not in k}, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:8]
    assert all(_dead(k) for k in result.missing_keys), \
        [k for k in result.missing_keys if not _dead(k)][:8]


@pytest.mark.parametrize("ps", [False, True])
def test_pose_shufflenetv2_plus(ps):
    name = ("pose_shufflenetv2_plus_pixel_shuffle" if ps
            else "pose_shufflenetv2_plus")
    ref = _ref_module("pose_shufflenetv2_plus_pixel_shuffle" if ps
                      else "pose_shufflenetv2_plus")
    cfg = _pose_cfg(name, "offset" if ps else "gaussian",
                    {"MODEL_SIZE": "Small"})
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    _roundtrip_and_parity(tmodel, cfg)


def test_pose_shufflenetv2_10x():
    ref = _ref_module("pose_shufflenetv2_10x")
    cfg = _pose_cfg("pose_shufflenetv2_10x", extra={"MODEL_SIZE": "1.0x"})
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    _roundtrip_and_parity(tmodel, cfg)


def test_pose_mobilevit_pixel_shuffle():
    ref = _ref_module("pose_mobilevit_pixel_shuffle")
    cfg = _pose_cfg(
        "pose_mobilevit_pixel_shuffle", "offset", {"MODEL_SIZE": "xxs"},
        config=f"{REF_MODELS}/backbones/configs/mobilevit_xxs.yaml")
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    _roundtrip_and_parity(tmodel, cfg)


def test_pose_mobilevitv2_pixel_shuffle():
    ref = _ref_module("pose_mobilevitv2_pixel_shuffle")
    cfg = _pose_cfg(
        "pose_mobilevitv2_pixel_shuffle", extra={"MODEL_SIZE": 0.5},
        config=f"{REF_MODELS}/backbones/configs/mobilevitv2-0.5.yaml")
    tmodel = _randomize(ref.get_pose_net(cfg, is_train=False))
    _roundtrip_and_parity(tmodel, cfg)


class _TVPoseMobileNetV3(tnn.Module):
    """Reference pose_mobilenetv3_small layout oracle: torchvision-layout
    backbone (Sequential-of-features → 'backbone.0.' keys,
    backbones/mobilenetv3.py:5-16) + deconv head + final 1×1
    (pose_mobilenetv3_small.py)."""

    def __init__(self, cfg):
        super().__init__()
        extra = cfg.MODEL.EXTRA
        self.backbone = _tv_mobilenet_v3_small()
        layers = []
        inplanes = 576
        for f, k in zip(extra.NUM_DECONV_FILTERS, extra.NUM_DECONV_KERNELS):
            pad, out_pad = {4: (1, 0), 3: (1, 1), 2: (0, 0)}[k]
            layers += [tnn.ConvTranspose2d(inplanes, f, k, 2, pad, out_pad,
                                           bias=extra.DECONV_WITH_BIAS),
                       tnn.BatchNorm2d(f), tnn.ReLU(inplace=True)]
            inplanes = f
        self.deconv_layers = tnn.Sequential(*layers)
        factor = 3 if cfg.MODEL.TARGET_TYPE == "offset" else 1
        self.final_layer = tnn.Conv2d(
            inplanes, cfg.MODEL.NUM_JOINTS * factor,
            extra.FINAL_CONV_KERNEL, 1,
            1 if extra.FINAL_CONV_KERNEL == 3 else 0)

    def forward(self, x):
        return self.final_layer(self.deconv_layers(self.backbone(x)))


def test_pose_mobilenetv3_small():
    cfg = _pose_cfg("pose_mobilenetv3_small",
                    extra={"NUM_DECONV_LAYERS": 2,
                           "NUM_DECONV_FILTERS": [128, 128],
                           "NUM_DECONV_KERNELS": [4, 4]})
    tmodel = _randomize(_TVPoseMobileNetV3(cfg))
    _roundtrip_and_parity(tmodel, cfg)


def test_shufflenetv2_test_parity():
    """shufflenetv2_test — the reference's unregistered experimental
    all-in-one net (backbones/shufflenetv2_test.py:117-206: megvii
    ShuffleNetV2 1.0x + conv_compress/DUC decoder + 17*3 offset head
    baked into the backbone class).  Output parity of the registered
    ``shufflenetv2_test`` model vs the ACTUAL reference module, via
    convert_shufflenetv2_test's key remap."""
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.torch_convert import (check_against_model,
                                                  convert_shufflenetv2_test)

    mod = _ref_module("backbones.shufflenetv2_test")
    tmodel = _randomize(mod.ShuffleNetV2(model_size="1.0x"), seed=11)
    tmodel.eval()

    variables, unused = convert_shufflenetv2_test(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    assert not unused, unused[:8]

    cfg = _pose_cfg("shufflenetv2_test", target_type="offset")
    cfg.MODEL.IMAGE_SIZE = [192, 256]       # the file's own smoke shape
    cfg.MODEL.HEATMAP_SIZE = [48, 64]       # (:248 rand(5,3,192,256))
    fmodel = build_model(cfg)
    variables = check_against_model(variables, fmodel, (1, 256, 192, 3))

    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    yf = np.asarray(fmodel.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False)).transpose(0, 3, 1, 2)
    assert yt.shape == yf.shape == (2, 51, 64, 48), (yt.shape, yf.shape)
    np.testing.assert_allclose(yf, yt, rtol=1e-3, atol=2e-3)


def test_shufflenetv2_test_rejects_gaussian_cfg():
    """The registry entry must fail loudly when the caller's cfg says
    gaussian — the caller's TARGET_TYPE drives the decode path, and the
    net's head is hardcoded 17*3 offset (code-review round-4 fix)."""
    from udp_pose_tpu.models import build_model
    cfg = _pose_cfg("shufflenetv2_test")      # default gaussian
    with pytest.raises(ValueError, match="offset"):
        build_model(cfg)


def test_shufflenetv2_test_rejects_non17_joints():
    """...and when NUM_JOINTS != 17 (e.g. an MPII cfg): the head is
    hardcoded 17*3 (backbones/shufflenetv2_test.py:195-201), so any
    other joint count would silently build a non-reference head under
    the parity registry name (advisor round-4 finding)."""
    from udp_pose_tpu.models import build_model
    cfg = _pose_cfg("shufflenetv2_test", target_type="offset")
    cfg.MODEL.NUM_JOINTS = 16
    with pytest.raises(ValueError, match="17"):
        build_model(cfg)
