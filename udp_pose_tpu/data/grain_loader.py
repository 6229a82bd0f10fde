"""grain-based multi-worker input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=…)``
(tools/train.py:145-158) with a grain DataLoader: worker *processes* run
the JointsDataset sample pipeline (decode + cv2 crop + target encoding),
sharded per JAX process, epoch-seeded — composing with
data/prefetch.device_prefetch for the host→HBM leg.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class _Source:
    """grain RandomAccessDataSource over a JointsDataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]


def grain_loader(dataset, batch_size: int, *, seed: int = 0,
                 shuffle: bool = True, num_workers: int = 4,
                 num_epochs: Optional[int] = 1, drop_remainder: bool = True,
                 shard_index: int = 0, num_shards: int = 1):
    """Build a grain DataLoader yielding collated numpy batches.

    Per-record randomness: each worker re-seeds the dataset RNG from the
    record seed so augmentation is reproducible under any worker count.
    """
    import grain.python as gp

    base = dataset

    class _SeededSource(_Source):
        def __getitem__(self, idx):
            # derive a per-(seed, index) generator → deterministic aug
            self._dataset.seed(int(np.random.SeedSequence(
                [seed, int(idx)]).generate_state(1)[0]))
            return self._dataset[int(idx)]

    sampler = gp.IndexSampler(
        num_records=len(base),
        shard_options=gp.ShardOptions(shard_index=shard_index,
                                      shard_count=num_shards,
                                      drop_remainder=drop_remainder),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = gp.DataLoader(
        data_source=_SeededSource(base),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size,
                             drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )
    return loader
