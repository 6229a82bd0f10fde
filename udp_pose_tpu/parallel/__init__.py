"""Parallelism: device mesh + sharding rules (the NCCL/DDP replacement).

The reference scales with DataParallel / DDP+NCCL
(deep_hrnet/tools/train.py:116, RSN/cvpack/.../engine.py:52-66); here the
entire comm layer is a `jax.sharding.Mesh` plus sharding annotations — XLA
inserts the all-reduces over ICI.
"""

from .mesh import (make_mesh, batch_sharding, replicated, shard_batch,
                   data_parallel_shardings, fetch_local_batch_rows,
                   tensor_parallel_sharding)
from .pipeline import (create_pipelined_rsn_state, make_pipeline_forward,
                       make_pipelined_rsn_train_step, merge_rsn_variables,
                       pipeline_state_sharding, split_rsn_variables)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "data_parallel_shardings", "fetch_local_batch_rows",
           "tensor_parallel_sharding", "create_pipelined_rsn_state",
           "make_pipeline_forward", "make_pipelined_rsn_train_step",
           "merge_rsn_variables", "pipeline_state_sharding",
           "split_rsn_variables"]
