"""Parameter partitioning rules (tensor parallelism over the 'model' axis).

Path-based rules instead of flax logical-axis metadata: module names are
stable (layers.py/vit.py name their submodules), so a small rule table maps
parameter paths to PartitionSpecs. Everything unmatched is replicated —
correct-by-default, since XLA all-gathers nothing for replicated params.

TP layout (Megatron-style column/row split, collectives stay on ICI):
  * attention q/k/v kernels  (d_model, inner)  -> shard inner  (column)
  * attention out kernel     (inner, d_model)  -> shard inner  (row)
  * MLP in kernel             (d_model, ffn)    -> shard ffn    (column)
  * MLP out kernel            (ffn, d_model)    -> shard ffn    (row)
  * param head                (hidden, 6*1000)  -> shard columns
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videocad_tpu.parallel.mesh import MODEL_AXIS

# (path-suffix module name, param name) -> sharded dim index
_COLUMN_SPLIT_MODULES = ("query", "key", "value", "linear1", "mlp_in")
_ROW_SPLIT_MODULES = ("out", "linear2", "mlp_out")
_COLUMN_SPLIT_HEADS = ("predict_params",)


def param_pspec(path: Tuple[str, ...]) -> P:
    """PartitionSpec for one parameter, given its flax path tuple."""
    if len(path) < 2:
        return P()
    module, param = path[-2], path[-1]
    if param == "kernel":
        if module in _COLUMN_SPLIT_MODULES or module in _COLUMN_SPLIT_HEADS:
            return P(None, MODEL_AXIS)
        if module in _ROW_SPLIT_MODULES:
            return P(MODEL_AXIS, None)
    elif param == "bias":
        if module in _COLUMN_SPLIT_MODULES or module in _COLUMN_SPLIT_HEADS:
            return P(MODEL_AXIS)
    return P()


def _path_names(key_path) -> Tuple[str, ...]:
    names = []
    for entry in key_path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        else:
            names.append(str(entry))
    return tuple(names)


def param_shardings(mesh: Mesh, params):
    """A pytree of NamedShardings matching ``params``."""
    def leaf_sharding(key_path, leaf):
        spec = param_pspec(_path_names(key_path))
        # Drop specs that don't divide the dim evenly (small test configs).
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        dims = leaf.shape
        fixed = []
        for i, axis in enumerate(spec):
            if axis is None or i >= len(dims):
                fixed.append(None)
            elif dims[i] % sizes.get(axis, 1) == 0:
                fixed.append(axis)
            else:
                fixed.append(None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(mesh: Mesh, params):
    """Place parameters onto the mesh per the TP rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
