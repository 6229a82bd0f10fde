"""Pose wrappers for the mobile backbones (deconv or pixel-shuffle heads).

Parity: lib/models/pose_shufflenetv2_plus[_pixel_shuffle].py,
pose_shufflenetv2_10x[_pixel_shuffle].py, pose_mobilenetv3_small
[_pixel_shuffle].py — backbone → head → final 1×1 (×3 for offset).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import DeconvHead, PixelShuffleDecoder
from .mobile import MobileNetV3Small, ShuffleNetV2, ShuffleNetV2Plus
from .registry import register_model


class MobilePoseNet(nn.Module):
    backbone: Callable[..., nn.Module]
    backbone_kwargs: tuple = ()
    head: str = "deconv"                    # deconv | pixel_shuffle
    num_joints: int = 17
    target_type: str = "gaussian"
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    num_deconv_kernels: Sequence[int] = (4, 4, 4)
    deconv_with_bias: bool = False
    start_channels: int = 256
    architecture: Sequence[int] = (512, 256, 128)
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.backbone(**dict(self.backbone_kwargs), dtype=self.dtype,
                          name="backbone")(x, train)
        if self.head == "deconv":
            x = DeconvHead(tuple(self.num_deconv_filters),
                           tuple(self.num_deconv_kernels),
                           self.deconv_with_bias, dtype=self.dtype,
                           name="deconv")(x, train)
        else:
            x = PixelShuffleDecoder(self.start_channels,
                                    tuple(self.architecture),
                                    dtype=self.dtype, name="decoder")(x, train)
        out_ch = (self.num_joints * 3 if self.target_type == "offset"
                  else self.num_joints)
        pad = 1 if self.final_conv_kernel == 3 else 0
        x = nn.Conv(out_ch, (self.final_conv_kernel,) * 2,
                    padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                    name="final_layer")(x)
        return x.astype(jnp.float32)


def _common(cfg, backbone, backbone_kwargs, head):
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    kw = dict(
        backbone=backbone,
        backbone_kwargs=tuple(backbone_kwargs.items()),
        head=head,
        num_joints=cfg.MODEL.NUM_JOINTS,
        target_type=cfg.MODEL.TARGET_TYPE,
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        dtype=dtype,
    )
    if head == "deconv":
        kw.update(
            num_deconv_filters=tuple(extra.NUM_DECONV_FILTERS),
            num_deconv_kernels=tuple(extra.NUM_DECONV_KERNELS),
            deconv_with_bias=extra.DECONV_WITH_BIAS,
        )
    else:
        kw.update(
            start_channels=extra.get("START_CHANNELS", 256),
            architecture=tuple(extra.get("ARCHITECTURE", (512, 256, 128))),
        )
    return MobilePoseNet(**kw)


@register_model("pose_shufflenetv2_plus")
def _snv2p(cfg):
    return _common(cfg, ShuffleNetV2Plus,
                   {"model_size": cfg.MODEL.EXTRA.get("MODEL_SIZE", "Small")},
                   "deconv")


@register_model("pose_shufflenetv2_plus_pixel_shuffle")
def _snv2p_ps(cfg):
    return _common(cfg, ShuffleNetV2Plus,
                   {"model_size": cfg.MODEL.EXTRA.get("MODEL_SIZE", "Small")},
                   "pixel_shuffle")


@register_model("pose_shufflenetv2_10x")
def _snv2(cfg):
    return _common(
        cfg, ShuffleNetV2,
        {"model_size": cfg.MODEL.EXTRA.get("MODEL_SIZE", "1.0x")}, "deconv")


@register_model("pose_shufflenetv2_10x_pixel_shuffle")
def _snv2_ps(cfg):
    return _common(
        cfg, ShuffleNetV2,
        {"model_size": cfg.MODEL.EXTRA.get("MODEL_SIZE", "1.0x")},
        "pixel_shuffle")


@register_model("shufflenetv2_test")
def _snv2_test(cfg):
    """The experimental all-in-one net of backbones/shufflenetv2_test.py
    (:117-206): megvii ShuffleNetV2 1.0x with the pixel-shuffle decoder
    (conv_compress 1024->256, DUC 512/256/128) and a 17*3-channel offset
    head baked into the backbone class.  The reference never registers it
    in its MODELS dict; here it is a first-class registry name with the
    file's hardcoded hyperparameters."""
    # The net's head is hardcoded 17*3 offset (:195-201), and validate /
    # make_infer_fn_from_cfg read TARGET_TYPE from the CALLER's cfg — so
    # a cfg that disagrees must fail loudly here, not decode garbage.
    if cfg.MODEL.TARGET_TYPE != "offset":
        raise ValueError(
            "shufflenetv2_test is a hardcoded offset-head net "
            "(reference backbones/shufflenetv2_test.py:195-201); set "
            "MODEL.TARGET_TYPE: offset in the config")
    if cfg.MODEL.NUM_JOINTS != 17:
        raise ValueError(
            "shufflenetv2_test's head is hardcoded 17*3 channels "
            "(reference backbones/shufflenetv2_test.py:195-201); a cfg "
            f"with NUM_JOINTS={cfg.MODEL.NUM_JOINTS} would silently "
            "build a non-reference head under the parity registry name")
    cfg = cfg.clone()
    cfg.defrost()
    cfg.MODEL.EXTRA.MODEL_SIZE = "1.0x"
    cfg.MODEL.EXTRA.START_CHANNELS = 256
    cfg.MODEL.EXTRA.ARCHITECTURE = [512, 256, 128]
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    return _common(
        cfg, ShuffleNetV2, {"model_size": "1.0x"}, "pixel_shuffle")


@register_model("pose_mobilenetv3_small")
def _mnv3(cfg):
    return _common(cfg, MobileNetV3Small, {}, "deconv")


@register_model("pose_mobilenetv3_small_pixel_shuffle")
def _mnv3_ps(cfg):
    return _common(cfg, MobileNetV3Small, {}, "pixel_shuffle")


_MVIT_SIZES = {"s": "small", "xs": "x_small", "xxs": "xx_small"}


def _mvit_mode(cfg):
    """Size from EXTRA.MODEL_SIZE ('s'|'xs'|'xxs', the reference yaml
    surface — pose_mobilevit_pixel_shuffle.py:27-34) or the MODEL.CONFIG
    yaml filename."""
    size = cfg.MODEL.EXTRA.get("MODEL_SIZE", None)
    if size is not None:
        return _MVIT_SIZES.get(str(size), str(size))
    if cfg.MODEL.CONFIG:
        name = str(cfg.MODEL.CONFIG)
        return ("xx_small" if "xxs" in name else
                "x_small" if "xs" in name else "small")
    return "small"


@register_model("pose_mobilevit_pixel_shuffle")
def _mvit_ps(cfg):
    from .mobilevit import MobileViT
    return _common(cfg, MobileViT, {"mode": _mvit_mode(cfg)},
                   "pixel_shuffle")


def _mvitv2_width(cfg):
    """Width from EXTRA.MODEL_SIZE (the reference yamls carry 0.5/0.75/1.0
    there — experiments/coco/mobilevitv2/*.yaml MODEL_SIZE), falling back
    to WIDTH_MULTIPLIER or the MODEL.CONFIG yaml filename."""
    width = cfg.MODEL.EXTRA.get("MODEL_SIZE", None)
    try:
        width = None if width is None else float(width)
    except (TypeError, ValueError):
        width = None
    if width is None:
        width = cfg.MODEL.EXTRA.get("WIDTH_MULTIPLIER", None)
    if width is None and cfg.MODEL.CONFIG:
        name = str(cfg.MODEL.CONFIG)
        for cand in ("0.75", "0.5", "1.0"):
            if cand in name:
                return float(cand)
    return float(width if width is not None else 1.0)


@register_model("pose_mobilevitv2_pixel_shuffle")
def _mvitv2_ps(cfg):
    from .mobilevit import MobileViTv2
    return _common(cfg, MobileViTv2, {"width": _mvitv2_width(cfg)},
                   "pixel_shuffle")
