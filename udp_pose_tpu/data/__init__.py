"""Data layer: COCO/MPII keypoint datasets and the augmentation pipeline."""

from .coco import COCODataset
from .mpii import MPIIDataset

DATASETS = {"coco": COCODataset, "mpii": MPIIDataset}


def build_dataset(cfg, image_set=None, is_train=False):
    name = cfg.DATASET.DATASET
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; available {sorted(DATASETS)}")
    if image_set is None:
        image_set = cfg.DATASET.TRAIN_SET if is_train else cfg.DATASET.TEST_SET
    if cfg.MODEL.NAME == "rsn":
        from .rsn import RSNCOCODataset, RSNMPIIDataset
        cls = RSNMPIIDataset if name == "mpii" else RSNCOCODataset
        return cls(cfg, cfg.DATASET.ROOT, image_set, is_train)
    return DATASETS[name](cfg, cfg.DATASET.ROOT, image_set, is_train)
