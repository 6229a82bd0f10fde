"""Model registry (parity: deep_hrnet/lib/models/__init__.py:28-41).

Same 12 public names; each entry is ``cfg -> flax.linen.Module``.  Mobile
backbones register lazily as they are implemented; unknown names raise with
the available list.
"""

from __future__ import annotations

from typing import Callable, Dict

MODELS: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODELS[name] = fn
        return fn
    return deco


def build_model(cfg):
    """Instantiate the configured architecture from an experiment config."""
    name = cfg.MODEL.NAME
    if name not in MODELS:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name](cfg)


# -- registrations ----------------------------------------------------------

from .resnet import pose_resnet_from_cfg          # noqa: E402
from .hrnet import pose_hrnet_from_cfg            # noqa: E402


@register_model("pose_resnet")
def _pose_resnet(cfg):
    return pose_resnet_from_cfg(cfg, psa=False)


@register_model("pose_resnet_psa")
def _pose_resnet_psa(cfg):
    return pose_resnet_from_cfg(cfg, psa=True)


@register_model("pose_hrnet")
def _pose_hrnet(cfg):
    return pose_hrnet_from_cfg(cfg, psa=False)


@register_model("pose_hrnet_psa")
def _pose_hrnet_psa(cfg):
    return pose_hrnet_from_cfg(cfg, psa=True)


from .rsn import rsn_from_cfg                     # noqa: E402


@register_model("rsn")
def _rsn(cfg):
    return rsn_from_cfg(cfg)


from . import pose_mobile                         # noqa: E402,F401  (registers)
