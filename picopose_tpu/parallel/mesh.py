"""Mesh construction and sharding helpers.

Parallelism strategy (SURVEY.md §2.3): the workload's long axes — crop batch
and template views — are embarrassingly data-parallel; ViT-L fits on one
chip, so no tensor/pipeline sharding is required for parity.  We still
reserve a 'model' mesh axis so larger backbones (vit-g) or giant template
banks can shard without restructuring:

  * batch-like arrays: P('data') on axis 0;
  * parameters / optimizer state: replicated;
  * gradient all-reduce: inserted by XLA from the shardings (rides ICI).

Multi-host extension: `jax.distributed.initialize()` then the same code over
`jax.devices()` spans slices; process-0 checkpointing is handled by orbax
(picopose_tpu/utils/checkpoint.py), replacing the reference's file-system
model sync (megapose/utils/distributed.py:47-77).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every leaf along axis 0 over the 'data' axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
