"""Aspect-ratio grouped batching: differential test vs the ACTUAL reference
GroupedBatchSampler (RSN/cvpack/dataset/torch_samplers/
grouped_batch_sampler.py) on random samplers/groupings."""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from udp_pose_tpu.data.base import aspect_ratio_group_ids, \
    grouped_batch_indices

REF_FILE = ("/root/reference/RSN/cvpack/dataset/torch_samplers/"
            "grouped_batch_sampler.py")
pytestmark = pytest.mark.skipif(not os.path.exists(REF_FILE),
                                reason="reference checkout not present")


def _ref_sampler():
    spec = importlib.util.spec_from_file_location("ref_grouped", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _ListSampler(torch.utils.data.Sampler):
    def __init__(self, ids):
        self.ids = list(ids)

    def __iter__(self):
        return iter(self.ids)

    def __len__(self):
        return len(self.ids)


class _FakeDataset:
    """get_img_info-style dataset for the reference sampler."""

    def __init__(self, hw):
        self.hw = hw

    def __len__(self):
        return len(self.hw)

    def get_img_info(self, i):
        h, w = self.hw[i]
        return {"height": h, "width": w}


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("drop_uneven", [False, True])
def test_grouped_batches_match_reference(seed, drop_uneven):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 40))
    hw = [(int(rng.integers(50, 200)), int(rng.integers(50, 200)))
          for _ in range(n)]
    sampled = rng.permutation(n).tolist()
    batch_size = int(rng.integers(2, 6))

    mod = _ref_sampler()
    ref = mod.GroupedBatchSampler(_ListSampler(sampled), _FakeDataset(hw),
                                  [1.0], batch_size,
                                  drop_uneven=drop_uneven)
    ref_batches = list(iter(ref))

    # bisect_right([1.0], x): ratio == 1.0 lands in group 1
    group_ids = np.array([1 if h / w >= 1.0 else 0 for h, w in hw])
    got = grouped_batch_indices(sampled, group_ids, batch_size,
                                drop_uneven=drop_uneven)
    assert [list(map(int, b)) for b in got] == ref_batches


def test_aspect_ratio_group_ids_from_db():
    class _DS:
        db = [{"scale": np.array([0.5, 1.0])},   # ratio 2 → group 1
              {"scale": np.array([1.0, 0.5])},   # ratio .5 → group 0
              {"scale": np.array([1.0, 1.0])}]   # ratio 1 → group 1
                                                   # (bisect_right ties up)

    ids = aspect_ratio_group_ids(_DS())
    assert ids.tolist() == [1, 0, 1]


def test_grouped_sharded_lockstep():
    """Sharded grouped loading must yield the SAME batch count on every
    shard (collective lockstep under multi-host; shards truncate to the
    global minimum) while preserving group purity."""
    from udp_pose_tpu.data.base import epoch_loader

    class _DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"idx": np.array([i])}

    rng = np.random.default_rng(0)
    group_ids = rng.integers(0, 2, 37)
    for num_shards in (2, 3):
        counts = []
        for si in range(num_shards):
            batches = list(epoch_loader(_DS(37), 4, shuffle=True, seed=5,
                                        shard_index=si,
                                        num_shards=num_shards,
                                        group_ids=group_ids))
            for b in batches:
                gids = group_ids[np.asarray(b["idx"]).ravel()]
                assert len(set(gids.tolist())) == 1   # group-pure
            counts.append(len(batches))
        assert len(set(counts)) == 1, counts


def test_epoch_loader_skip_batches_and_plan():
    """skip_batches must reproduce the tail of the unskipped stream
    exactly (mid-epoch/iteration resume replays the plan, not the data),
    and epoch_batch_indices must agree with what the loader yields —
    it's the cheap fast-forward arithmetic the resume paths rely on."""
    from udp_pose_tpu.data.base import epoch_batch_indices, epoch_loader

    class _DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"idx": np.array([i])}

    ds = _DS(23)
    rng = np.random.default_rng(1)
    group_ids = rng.integers(0, 2, 23)
    for kwargs in (dict(), dict(num_shards=2, shard_index=1),
                   dict(group_ids=group_ids)):
        full = list(epoch_loader(ds, 4, shuffle=True, seed=7, **kwargs))
        plan = epoch_batch_indices(ds, 4, shuffle=True, seed=7, **kwargs)
        assert len(plan) == len(full)
        for skip in (0, 1, len(full) - 1, len(full)):
            tail = list(epoch_loader(ds, 4, shuffle=True, seed=7,
                                     skip_batches=skip, **kwargs))
            assert len(tail) == len(full) - skip
            for a, b in zip(tail, full[skip:]):
                np.testing.assert_array_equal(a["idx"], b["idx"])
