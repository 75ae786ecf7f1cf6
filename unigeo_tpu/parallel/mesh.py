"""Device-mesh construction (SURVEY.md §2.7 — TPU-native obligation).

The reference has no distribution at all (serial loop on cuda:0,
eval.py:33-99); here scale-out is first-class: a named Mesh with

  dp — data (clips)          sp — sequence (frames)          tp — tensor
       sharded batch              sharded temporal axis           sharded
                                                                 weights

XLA inserts the collectives (all-gathers for temporal attention across sp,
reduce-scatters for tp matmuls) from the shardings alone; nothing in model
code mentions communication.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor(n: int) -> Tuple[int, int, int]:
    """Split n devices into (dp, sp, tp) preferring data parallelism."""
    tp = 2 if n % 2 == 0 and n >= 8 else 1
    rem = n // tp
    sp = 2 if rem % 2 == 0 and rem >= 4 else 1
    dp = rem // sp
    return dp, sp, tp


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int, int]] = None,
    axis_names: Sequence[str] = ("dp", "sp", "tp"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = _factor(n)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, batch_axes: Tuple[Optional[str], ...]) -> NamedSharding:
    return NamedSharding(mesh, P(*batch_axes))
