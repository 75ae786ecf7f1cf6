"""Parameter partitioning rules (tensor parallelism for the UNet/ViT).

Megatron-style sharding expressed purely as PartitionSpecs on the param
tree; XLA derives the collectives:

  * to_q/to_k/to_v, GEGLU/MLP in-projections  → shard output features (tp)
  * to_out, MLP out-projections               → shard input features (tp)
  * convs, norms, embeddings, biases          → replicated

The rules match on parameter path names, so they apply to every model stack
(UNet, VAE, ViT) uniformly.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("to_q", "to_k", "to_v", "fc1", "net_0")  # shard output dim
_ROW_PARALLEL = ("to_out", "fc2", "net_2")  # shard input dim


def _path_names(path) -> list:
    names = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "idx", None)
        names.append(str(name))
    return names


def param_spec(path, value, tp_axis: str = "tp", tp_size: int = 2) -> P:
    """Partition spec for one parameter leaf.

    tp_size: the size of the mesh's tp axis — a dim is only sharded when it
    divides evenly (a 2-divisible channel count is NOT enough on a tp=4
    mesh; replicate instead of producing an uneven layout).
    """
    names = _path_names(path)
    leaf = names[-1] if names else ""
    joined = "/".join(names)
    if leaf != "kernel" or value.ndim < 2:
        return P()
    for tag in _COL_PARALLEL:
        if tag in joined:
            if value.shape[-1] % tp_size == 0:
                return P(*([None] * (value.ndim - 1) + [tp_axis]))
    for tag in _ROW_PARALLEL:
        if tag in joined:
            if value.shape[-2] % tp_size == 0:
                return P(*([None] * (value.ndim - 2) + [tp_axis, None]))
    return P()


def _mesh_tp_size(mesh: Mesh, tp_axis: str) -> int:
    return dict(mesh.shape).get(tp_axis, 1) or 1


def shard_params(params: Any, mesh: Mesh, tp_axis: str = "tp"):
    """device_put every param with its partition spec over the mesh."""
    tp_size = _mesh_tp_size(mesh, tp_axis)

    def place(path, value):
        spec = param_spec(path, value, tp_axis, tp_size)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params: Any, mesh: Mesh, tp_axis: str = "tp"):
    tp_size = _mesh_tp_size(mesh, tp_axis)
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_spec(path, v, tp_axis, tp_size)),
        params,
    )
