"""Device-mesh construction for SPMD training.

The TPU-native replacement of the reference's NCCL/DDP process-group setup
(/root/reference/main.py:31-35, experiment.py:104-109): a single program
lays a ``jax.sharding.Mesh`` over all chips; gradient/metric reductions
become XLA collectives inserted by pjit, and no explicit barriers exist
(program order is the barrier under SPMD).

Axes:
  * ``data``  — batch sharding (the reference's only parallelism, DP)
  * ``model`` — optional tensor parallelism over attention heads / FFN /
    output-head columns (SURVEY.md §2.3: not required for parity; kept
    first-class so larger configs scale over ICI)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    ``data=None`` consumes all remaining devices. The device order keeps
    model-parallel groups on adjacent devices so TP collectives ride the
    fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, (data, model, n)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard their leading dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
