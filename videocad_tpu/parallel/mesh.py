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
  * ``dcn``   — optional leading multi-slice data axis
    (``create_hybrid_mesh``): slices are laid out contiguously along it,
    so TP/in-slice-DP collectives ride ICI and only the slice-level
    gradient reduction crosses DCN (hierarchical all-reduce — the
    scaling-book multi-slice recipe). The batch shards over
    ``("dcn", "data")`` jointly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


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


def create_hybrid_mesh(dcn: int, data: Optional[int] = None, model: int = 1,
                       devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dcn, data, model) mesh for multi-slice training.

    ``dcn`` is the number of slices (DCN-connected granules); ``data`` x
    ``model`` lays out each slice's chips. On real multi-slice hardware
    devices are grouped by ``slice_index`` so each row of the leading
    axis is one slice — in-slice collectives (TP, in-slice DP) ride ICI,
    and only the ``dcn``-axis gradient reduction crosses the slower DCN
    links (XLA lowers the joint ("dcn", "data") psum hierarchically).
    On hosts without slice topology (virtual CPU meshes, single slice)
    the same shape is laid over the flat device list, preserving program
    semantics for tests and dry runs.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (dcn * model) == 0, (n, dcn, model)
        data = n // (dcn * model)
    need = dcn * data * model
    assert need <= n, (dcn, data, model, n)
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) > 1 and None not in slice_ids:
        assert len(slice_ids) == dcn, (
            f"{len(slice_ids)} slices visible but dcn={dcn}")
        # Each dcn row must be one slice: take data*model chips FROM EACH
        # slice (a flat devices[:need] would pack multiple dcn rows into
        # the first slice, putting "cross-slice" reductions on ICI links
        # that don't exist and idling later slices entirely).
        per_slice = data * model
        rows = []
        for sid in sorted(slice_ids):
            ds = sorted((d for d in devices if d.slice_index == sid),
                        key=lambda d: d.id)
            assert len(ds) >= per_slice, (
                f"slice {sid} has {len(ds)} chips, need {per_slice}")
            rows.append(np.asarray(ds[:per_slice]).reshape(data, model))
        grid = np.stack(rows)
    else:
        grid = np.asarray(devices[:need]).reshape(dcn, data, model)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard their leading dim over the data axis (jointly
    with the slice axis on a hybrid multi-slice mesh)."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_local_shard(x, sharding: NamedSharding):
    """Place one host-local array under a global sharding.

    On a multi-process mesh the hosts hold DIFFERENT rows of the global
    batch (the loader shards by host), so the global array must be
    assembled from the per-process pieces — ``jax.device_put`` would
    instead treat every host's local batch as the same replicated value,
    silently training on 1/num_hosts of the data. Single-process keeps
    the cheap device_put path."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: put_local_shard(x, sharding), batch)
