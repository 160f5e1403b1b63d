"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL/DDP stack
(training/main.py:55,135): a 2-D ``("data", "model")`` mesh, batch sharded
over ``data`` (DDP equivalent) and optional tensor-parallel sharding of the
attention/MLP weights over ``model``. Gradients are averaged implicitly by
XLA when the loss is computed over the globally-sharded batch — there is no
DDP wrapper and no gradient-bucket collective to manage; collectives ride
ICI where the mesh axes are laid out on it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules keyed on parameter names inside the stacked
# transformer pytrees (leading dim = layer). Column-parallel up-projections,
# row-parallel down-projections — the standard Megatron split. ``wo`` rows
# and ``w1``/``w2`` splits are contiguous per-head / per-column, so the
# stored shards are exactly what the shard_map TP path (parallel/tp.py)
# consumes. The fused ``wqkv``/``bqkv`` q|k|v column layout is NOT
# head-alignable by a PartitionSpec (a contiguous split mixes q/k/v), so
# those stay replicated and each shard slices its heads locally — zero
# weight communication either way.
_TP_RULES_3D = {
    "wo": P(None, MODEL_AXIS, None),
    "w1": P(None, None, MODEL_AXIS),
    "w2": P(None, MODEL_AXIS, None),
}
_TP_RULES_2D = {
    "b1": P(None, MODEL_AXIS),
}


def param_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one parameter, by its pytree path."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf.ndim == 3 and name in _TP_RULES_3D:
        return _TP_RULES_3D[name]
    if leaf.ndim == 2 and name in _TP_RULES_2D:
        return _TP_RULES_2D[name]
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a CLIP parameter pytree (TP over 'model')."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))
