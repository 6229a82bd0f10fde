"""Parallelism: device mesh + sharding rules (the NCCL/DDP replacement).

The reference scales with DataParallel / DDP+NCCL
(deep_hrnet/tools/train.py:116, RSN/cvpack/.../engine.py:52-66); here the
entire comm layer is a `jax.sharding.Mesh` plus sharding annotations — XLA
inserts the all-reduces over ICI.
"""

from .mesh import (make_mesh, batch_sharding, replicated, shard_batch,
                   data_parallel_shardings, fetch_local_batch_rows,
                   tensor_parallel_sharding)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "data_parallel_shardings", "fetch_local_batch_rows",
           "tensor_parallel_sharding"]
