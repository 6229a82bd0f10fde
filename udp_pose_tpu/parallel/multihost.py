"""Multi-host (multi-slice) scaling glue.

The reference's multi-process story is torch.distributed.launch + NCCL
env:// rendezvous (RSN engine.py:52-66).  The TPU-native equivalent:
``jax.distributed.initialize()`` (coordinator env vars / TPU metadata),
a global mesh over all hosts' devices, per-host *data* sharding (each host
feeds only its addressable shard of the globally-sharded batch via
``make_array_from_process_local_data``), and host-side gather of the tiny
eval results (SURVEY §5.8: no custom comm code).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Initialise multi-host jax if configured; no-op for single process.

    On real TPU pods the arguments come from the metadata server and may be
    omitted entirely.
    """
    import jax
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialised or single-process environment
        pass


def maybe_initialize_from_env(environ=None):
    """Initialise jax.distributed from JAX_COORDINATOR / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars (the torch.distributed.launch-style contract a
    2-host user drives the CLIs with; reference: WORLD_SIZE/RANK env://
    rendezvous, RSN engine.py:52-66).  Returns True when multi-process.

    On real TPU pods the vars may be omitted — set JAX_MULTIHOST=1 to call
    ``jax.distributed.initialize()`` with metadata-server autodetection.
    """
    import os
    env = os.environ if environ is None else environ
    if env.get("JAX_MULTIHOST"):
        initialize_distributed()
        return True
    n = int(env.get("JAX_NUM_PROCESSES", "1") or "1")
    if n <= 1:
        return False
    initialize_distributed(
        coordinator_address=env.get("JAX_COORDINATOR", "localhost:12321"),
        num_processes=n,
        process_id=int(env.get("JAX_PROCESS_ID", "0") or "0"))
    return True


def process_shard_info():
    """(shard_index, num_shards) for the per-host data loader."""
    import jax
    return jax.process_index(), jax.process_count()


def global_batch_from_local(mesh, local_batch: dict):
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host passes its local slice (global_batch/num_processes rows);
    returns jax Arrays sharded batch-dim over the mesh 'data' axis.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


def gather_eval_results(preds: np.ndarray, boxes: np.ndarray, paths):
    """All-hosts gather of decoded eval results (tiny arrays).

    Replaces the reference's pickled-ByteTensor all_gather
    (RSN/lib/utils/comm.py:47-87).  Single-process: identity.
    """
    import jax
    if jax.process_count() == 1:
        return preds, boxes, list(paths)
    from jax.experimental import multihost_utils
    preds_g = multihost_utils.process_allgather(preds)
    boxes_g = multihost_utils.process_allgather(boxes)
    preds_g = preds_g.reshape(-1, *preds.shape[1:])
    boxes_g = boxes_g.reshape(-1, *boxes.shape[1:])
    # strings: broadcast via host_local round-trip is not supported for
    # object arrays; callers should shard deterministically so paths can
    # be reconstructed per host (epoch_loader shard_index order).
    return preds_g, boxes_g, list(paths)
