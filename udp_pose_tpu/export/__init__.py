"""Portable-artifact export: ONNX (self-contained protobuf writer),
TFLite / TF SavedModel (via jax2tf), plus the verification oracle.

Parity role: deep_hrnet/tools/export.py + scripts/export_mnn.sh — the
reference's ONNX/MNN/OpenVINO deployment surface, produced TPU-side
without requiring onnx/onnxruntime in the image.
"""

from .onnx_eval import check_model, run_model
from .onnx_families import export_onnx_from_cfg
from .onnx_pb import load_model

__all__ = ["export_onnx_from_cfg", "run_model", "check_model",
           "load_model"]
