"""Evaluation: native COCO OKS keypoint AP (pycocotools-free) and MPII PCKh."""

from .cocoeval import COCOKeypointEval, COCO_KPT_SIGMAS

__all__ = ["COCOKeypointEval", "COCO_KPT_SIGMAS"]
