"""Multi-host scaffolding (SURVEY.md §2.7 comm-backend obligation).

The reference is single-device (cuda:0, reference eval.py:33); a TPU pod
slice spans hosts.  This module owns the three multi-host touch points:

  * initialize_distributed() — jax.distributed.initialize guarded so
    single-host operation is completely unchanged (no coordinator, no env →
    no-op).
  * make_hybrid_mesh() — DCN-aware mesh: data parallelism crosses hosts
    (slow DCN links carry only dp collectives — metric scalars and, in
    training, gradient all-reduces), while sp/tp stay inside a host's ICI
    domain.
  * process_allgather_rows() — gather per-sequence metric rows (JSON dicts)
    from every process so rank 0 can write the one CSV the reference
    format expects (metrics/save_utils.py:64-90 analog).

Single-host behavior of every function is the identity / local path; the
multi-process paths are exercised by tests/test_multihost.py with a
2-process CPU cluster (the TPU analog of a fake multi-node backend,
SURVEY.md §4 item 4).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-process info is available.

    Resolution order: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars → TPU-pod auto-detection
    (args all None on a pod slice lets jax.distributed auto-configure).
    Returns True if distributed mode was initialized, False for the
    unchanged single-host path.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single-host: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(
    ici_shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("dp", "sp", "tp"),
):
    """Mesh whose dp axis spans hosts over DCN while sp×tp stay on ICI.

    ici_shape: (sp, tp) within one host; default (1, 1) → pure dp.
    Single-process: falls back to parallel.mesh.make_mesh (unchanged).
    """
    import jax
    from jax.sharding import Mesh

    if jax.process_count() == 1:
        from unigeo_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        if ici_shape is None:
            return make_mesh(n)
        sp, tp = ici_shape
        return make_mesh(n, shape=(n // (sp * tp), sp, tp))

    from jax.experimental import mesh_utils

    sp, tp = ici_shape or (1, 1)
    local = jax.local_device_count()
    dp_local = local // (sp * tp)
    try:
        # TPU pod slices: DCN granule = slice
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp_local, sp, tp),
            dcn_mesh_shape=(jax.process_count(), 1, 1),
        )
    except ValueError:
        # hosts without slice topology (CPU clusters, one process per host):
        # DCN granule = process
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp_local, sp, tp),
            dcn_mesh_shape=(jax.process_count(), 1, 1),
            process_is_granule=True,
        )
    return Mesh(devices, axis_names=tuple(axis_names))


def shard_indices(n: int) -> List[int]:
    """This process's share of eval-clip indices (round-robin so resumable
    CSV rows interleave deterministically)."""
    import jax

    p, pid = jax.process_count(), jax.process_index()
    return [i for i in range(n) if i % p == pid]


def process_allgather_rows(rows: List[Dict]) -> List[Dict]:
    """Gather lists of JSON-serializable metric rows from all processes.

    Rows are JSON-encoded to a padded uint8 buffer, all-gathered through the
    devices (multihost_utils), decoded, and returned in process order.
    Single-process: identity.
    """
    import jax

    if jax.process_count() == 1:
        return list(rows)

    from jax.experimental import multihost_utils

    payload = json.dumps(rows).encode()
    n = np.int64(len(payload))
    lens = multihost_utils.process_allgather(n)  # [P] — one gather serves both
    max_len = int(lens.max())
    buf = np.zeros((max_len,), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    bufs = multihost_utils.process_allgather(buf)  # [P, max_len]
    out: List[Dict] = []
    for i in range(bufs.shape[0]):
        raw = bytes(np.asarray(bufs[i][: int(lens[i])]))
        out.extend(json.loads(raw))
    return out


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
