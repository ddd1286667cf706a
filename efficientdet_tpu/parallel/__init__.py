"""Mesh/sharding parallelism (the DP/DDP+NCCL replacement)."""

from .mesh import (batch_sharding, create_mesh, put_batch, put_replicated,
                   replicated, shard_eval_step, shard_train_step)

__all__ = [
    "batch_sharding", "create_mesh", "put_batch", "put_replicated",
    "replicated", "shard_eval_step", "shard_train_step",
]
