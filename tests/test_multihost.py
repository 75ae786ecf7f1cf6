"""Multi-host scaffolding tests (SURVEY.md §2.7 comm backend; VERDICT r1
item 6).

The real thing is exercised with a 2-process CPU jax.distributed cluster
(each process sees 2 virtual CPU devices → 4 global devices) launched as
subprocesses — the closest single-machine analog of a 2-host pod slice.
Single-host fallbacks are asserted in-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from unigeo_tpu.parallel.multihost import (
    initialize_distributed, is_primary, make_hybrid_mesh,
    process_allgather_rows, shard_indices,
)

assert initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert jax.device_count() == 4
assert jax.local_device_count() == 2

mesh = make_hybrid_mesh()
assert mesh.shape["dp"] == 4

# one SPMD computation across both processes: global mean over a
# dp-sharded array whose local shards differ per process
import numpy as np
sharding = NamedSharding(mesh, P("dp"))
garr = jax.make_array_from_callback(
    (4,), sharding, lambda idx: np.arange(4, dtype=np.float32)[idx]
)
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 6.0  # 0+1+2+3

rows = process_allgather_rows(
    [{"seq_name": f"seq{pid}", "Abs Rel": float(pid) + 0.5}]
)
assert len(rows) == 2 and rows[0]["seq_name"] == "seq0"
idx = shard_indices(5)
print(json.dumps({"pid": pid, "idx": idx, "primary": is_primary(),
                  "rows": rows}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert by_pid[0]["primary"] and not by_pid[1]["primary"]
    # round-robin shard: disjoint, covers range(5)
    assert sorted(by_pid[0]["idx"] + by_pid[1]["idx"]) == [0, 1, 2, 3, 4]
    # both processes see both rows in process order
    for o in outs:
        assert [r["seq_name"] for r in o["rows"]] == ["seq0", "seq1"]
        assert o["rows"][1]["Abs Rel"] == 1.5


def test_single_host_fallbacks():
    from unigeo_tpu.parallel.multihost import (
        initialize_distributed, is_primary, make_hybrid_mesh,
        process_allgather_rows, shard_indices,
    )

    env_backup = {
        k: os.environ.pop(k, None)
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    }
    try:
        assert initialize_distributed() is False
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v
    assert is_primary()
    assert shard_indices(5) == [0, 1, 2, 3, 4]
    rows = [{"seq_name": "a", "x": 1.0}]
    assert process_allgather_rows(rows) == rows
    mesh = make_hybrid_mesh()
    assert mesh.size == 8  # the 8 virtual CPU devices from conftest
    mesh2 = make_hybrid_mesh(ici_shape=(2, 1))
    assert mesh2.shape["sp"] == 2 and mesh2.shape["dp"] == 4
