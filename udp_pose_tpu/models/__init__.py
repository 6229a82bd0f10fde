"""Flax model zoo (NHWC, bf16-capable, TPU-native).

Registry parity with the reference ``MODELS`` dict
(deep_hrnet/lib/models/__init__.py:28-41): every entry builds from the same
experiment-yaml config surface via ``build_model(cfg)``.
"""

from .registry import MODELS, build_model, register_model

__all__ = ["MODELS", "build_model", "register_model"]
