"""Mesh construction and sharding helpers.

Design (SURVEY.md §2.4 TPU-native mapping): a 2-D mesh ``('data', 'model')``.
The batch dim of images/targets shards over ``data``; params/opt-state
replicate (pure data parallelism — these are <70M-param CNNs, the weights
fit everywhere and replication keeps all collectives to one grad psum over
ICI).  The ``model`` axis is there for spatial sharding of oversized inputs
(bottom-up 512×512+) — GSPMD handles conv halo exchange when H is sharded.

BatchNorm note: batch stats are computed inside jit over the *globally*
sharded batch axis, so XLA inserts the cross-replica mean — strictly better
than the reference's per-GPU stats under DataParallel.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data < 0:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put every array in a pytree with batch-dim sharding.

    Multi-host: each process passes its LOCAL rows (global_batch /
    process_count) and the global array is assembled per-host
    (make_array_from_process_local_data) — the TPU-native replacement for
    DistributedSampler + DDP feeding (RSN dataloader.py:18-72)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def data_parallel_shardings(mesh: Mesh):
    """(state_sharding, batch_sharding) pair for pjit'ing a train step."""
    return replicated(mesh), batch_sharding(mesh)


def tensor_parallel_sharding(tree, mesh: Mesh, min_size: int = 64,
                             axis: str = "model"):
    """Channel (last-dim) sharding over the ``axis`` mesh dim — the
    TPU-native tensor-parallel mapping for CNNs.

    Returns a shardings pytree (same structure as ``tree``) that shards
    the LAST dim of every leaf whose last dim is >= ``min_size`` and
    divisible by the axis size, replicating everything else.  Applied to a
    TrainState this shards conv kernels over C_out, biases / BN
    scale+bias / BN running stats / the matching adam moments over C —
    GSPMD propagates the activation shardings through the network and
    inserts the collectives (all-gathers at branch-fuse points, psums for
    the data-parallel gradient) automatically.  Memory per chip for
    params+opt-state drops ~1/n on the sharded (wide) layers — the lever
    that matters for w48/RSN50-scale models and their adam state.

    The reference has no tensor parallelism at all (DataParallel/DDP
    replicate everything); this replaces nothing and extends the mesh
    story beyond dp+sp.
    """
    n = mesh.shape[axis]

    def spec(x):
        shape = getattr(x, "shape", None)
        if (shape and n > 1 and shape[-1] >= min_size
                and shape[-1] % n == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def fetch_local_batch_rows(out, num_shards: int = 1):
    """Reassemble THIS process's batch rows from a sharded device array.

    Used by the train-CLI PCK/DEBUG path (tools/train.py): under
    multi-host the step output is a global array whose non-addressable
    shards cannot be np.asarray'd, so only batch-dim-sharded layouts can
    be reassembled host-side.  Returns:

    * np.ndarray of the addressable batch rows when every addressable
      shard spans the full non-batch dims (pure batch sharding or full
      replication);
    * np.ndarray via plain fetch when ``num_shards == 1`` (single
      process can always materialise the whole array, any layout);
    * ``None`` when multi-host AND non-batch-partial sharding (e.g.
      spatial 'model'-axis sharding) — the caller must skip rather than
      silently corrupt the reassembly.
    """
    def full_tail(s):
        return all(ix.start in (None, 0) and ix.stop in (None, out.shape[d])
                   for d, ix in enumerate(s.index) if d)

    shards = out.addressable_shards
    if all(full_tail(s) for s in shards):
        parts, seen = [], set()
        for s in sorted(shards, key=lambda s: s.index[0].start or 0):
            st = s.index[0].start or 0
            if st not in seen:   # skip replicated copies
                seen.add(st)
                parts.append(np.asarray(s.data))
        return np.concatenate(parts, axis=0)
    if num_shards == 1:
        return np.asarray(out)
    return None
