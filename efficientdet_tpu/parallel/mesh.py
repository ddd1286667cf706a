"""Device mesh + sharding helpers: the TPU replacement for DP/DDP+NCCL.

The reference's entire distributed story is data parallelism via
DataParallel / DistributedDataParallel over NCCL with per-process batch
division (train.py:154-171, 237-258, 311-326). On TPU this collapses to:

- ONE process per host, a ``jax.sharding.Mesh`` over all devices
- the global batch is a single logical array sharded on the 'data' axis
- parameters/optimizer state replicated (sharding spec ``P()``)
- jit partitions the step; the gradient all-reduce rides ICI as an XLA
  collective — no wrapper class, no backend flag, no rendezvous env vars
- per-host data sharding is exact by construction (fixes the reference's
  missing DistributedSampler, train.py:199-204).

A 'model' axis is reserved for future spatial/model sharding of D5-D7
activations (SURVEY.md section 7 "hard parts"); data parallelism is full
capability parity with the reference.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_data: Optional[int] = None,
                num_model: int = 1,
                devices=None) -> Mesh:
    """Mesh with axes ('data', 'model'); defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    grid = np.asarray(devices[:num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with (replicated state, data-sharded batch) in and
    (replicated state, replicated metrics) out; state buffers donated."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, {"images": data, "annotations": data,
                             "scales": data}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def shard_eval_step(eval_step, mesh: Mesh):
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)


def put_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Host batch -> device arrays sharded on the data axis."""
    ds = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ds), batch)


def put_replicated(tree, mesh: Mesh):
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)
