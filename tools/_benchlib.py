"""Shared timing helpers for the perf tools (RTT-amortized, tunnel-aware).

On the tunneled TPU backend a host→device round trip costs ~30 ms, so
sub-RTT ops must be scan-chained inside ONE program; anything ≳10× the RTT
can be timed per dispatch.  One copy of that methodology lives here —
bench.py stays self-contained (the driver runs it standalone).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def setup_cache(path: str = None) -> None:
    """Default: the repo-local .jax_cache shared with bench.py and the test
    suite — survives /tmp cleanup between driver rounds, so the tools get
    the same warm-start."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if path is None:
        # host-keyed: foreign-host XLA:CPU AOT entries can SIGILL/SIGSEGV
        from unigeo_tpu.utils.hostcache import host_cache_dir

        path = os.environ.get("UNIGEO_CACHE_DIR") or host_cache_dir(repo)
    # seed committed warm-start TPU executables (utils/warmcache.py) so the
    # tools skip the multi-minute flagship compiles on a cold checkout
    from unigeo_tpu.utils import warmcache

    if os.environ.get("UNIGEO_NO_WARM_SEED", "0") != "1":
        warmcache.seed(repo, path)
    warmcache.configure(path)


def measure_rtt(reps: int = 5) -> float:
    """Min round-trip of a trivial dispatch + scalar fetch (seconds)."""
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0.0)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_chained(fn, x, length: int, reps: int = 3, rtt: float = 0.0,
                 dtype=jnp.bfloat16) -> float:
    """Seconds per application of shape-preserving ``fn``, chained
    ``length`` times in one jitted scan (output feeds input — nothing is
    DCE'd, the RTT amortizes away)."""

    @jax.jit
    def prog(x):
        def body(c, _):
            return fn(c).astype(dtype), None

        y, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(y.astype(jnp.float32))

    float(prog(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(x))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 0.0) / length


def time_single(fn, *args, reps: int = 5, rtt: float = 0.0) -> float:
    """Seconds per dispatch of ``fn(*args)`` (use when runtime ≫ RTT)."""
    prog = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(prog(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 0.0)


def timed_blocking(fn, rtt: float = 0.0, reps: int = 3,
                   warm: bool = True) -> float:
    """Min wall seconds of ``fn()`` over ``reps``, RTT-corrected.

    ``fn`` must itself block (end with a host fetch).  The shared
    implementation behind bench_zoo / ablate_spann3r / bench.py's
    secondary stage probes — keep the warm/reps/RTT policy here so every
    tool measures the same way.
    """
    if warm:
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 0.0)
