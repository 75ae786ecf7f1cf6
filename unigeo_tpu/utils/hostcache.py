"""Host-keyed persistent compile-cache directory.

XLA:CPU AOT executables embed the COMPILE machine's CPU feature set, and
JAX's persistent-cache key does not include host features — loading a
cache entry written on a different host warns
("Machine type used for XLA:CPU compilation doesn't match ... could lead
to execution errors such as SIGILL") and has produced real SIGSEGVs in
this repo's test suite when driver rounds moved between terminal hosts.
Key the cache directory by a /proc/cpuinfo flags fingerprint so each host
gets its own executables while same-host reruns stay warm.

Dependency-free on purpose: importable from tests/conftest.py before any
JAX backend initializes.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_tag() -> str:
    # The cpuinfo flags line alone is NOT a sufficient key: LLVM detects
    # host features by executing CPUID directly, and two VMs can present
    # identical kernel-masked cpuinfo flags while differing in raw CPUID
    # bits (observed: a foreign AOT entry with +pku/+prefer-no-scatter
    # loaded under a matching flags hash).  Mix in the kernel boot_id so a
    # CPU cache dir is only ever reused within the same booted machine —
    # same-process-tree reruns (pytest, driver rounds on one host) stay
    # warm, and a driver hop to a new terminal host always starts clean.
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    parts.append(line)
                    break
    except OSError:
        pass
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read())
    except OSError:
        pass
    if not parts:
        # No /proc at all (non-Linux).  Mix the node name in with the
        # architecture: machine() alone would reintroduce the cross-host
        # collision this keying exists to prevent.  Same-host reruns still
        # share a tag; a reused nodename across re-imaged hosts remains a
        # (documented) residual hazard on /proc-less platforms only.
        parts = [platform.machine() or "unknown", os.uname().nodename]
    return hashlib.sha1("".join(parts).encode()).hexdigest()[:10]


def host_cache_dir(repo_root: str, cpu: bool | None = None) -> str:
    """Cache directory for the active platform (created if missing).

    CPU runs get <repo_root>/.jax_cache/<cpu-fingerprint> (the AOT hazard
    is CPU-only); accelerator runs keep the flat <repo_root>/.jax_cache so
    warm TPU executables survive across hosts and driver rounds.  ``cpu``
    defaults from JAX_PLATFORMS, treating "" (unset) as CPU: an unset env
    on a TPU-less host silently falls back to the CPU backend, which must
    NOT write host-specific AOT executables into the shared flat dir.
    (The axon sitecustomize always sets JAX_PLATFORMS=axon on TPU hosts,
    so accelerator runs still resolve to the flat dir.)
    """
    if cpu is None:
        cpu = os.environ.get("JAX_PLATFORMS", "").split(",")[0] in ("", "cpu")
    root = os.path.join(repo_root, ".jax_cache")
    tag = _host_tag() if cpu else ""
    path = os.path.join(root, tag)
    os.makedirs(path, exist_ok=True)
    if cpu and os.environ.get("UNIGEO_KEEP_FOREIGN_CACHE", "") != "1":
        # Fingerprint dirs from other boots/hosts can never be reused by
        # this machine (and are exactly the foreign-AOT hazard); drop them
        # once they look abandoned.  The 24h mtime grace handles a checkout
        # shared between two concurrently-live hosts (network mount): an
        # in-use sibling keeps a fresh mtime and survives, so the two sides
        # don't ping-pong-delete each other's caches on every process
        # start.  Set UNIGEO_KEEP_FOREIGN_CACHE=1 to disable pruning
        # entirely.  TPU entries are flat files in `root`, untouched.
        import shutil
        import time

        cutoff = time.time() - 24 * 3600
        for entry in os.listdir(root):
            sub = os.path.join(root, entry)
            if entry != tag and os.path.isdir(sub):
                try:
                    if os.path.getmtime(sub) < cutoff:
                        shutil.rmtree(sub, ignore_errors=True)
                except OSError:
                    pass
    return path
