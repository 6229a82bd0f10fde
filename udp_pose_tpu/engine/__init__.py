"""Deployment engines: detect-then-pose pipeline (reference L6)."""

from .fused import FusedDetectPose
from .pose_engine import SKELETONS, UdpPosePipeline

__all__ = ["UdpPosePipeline", "FusedDetectPose", "SKELETONS"]
