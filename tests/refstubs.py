"""Hermetic sys.modules stubbing for the reference-as-oracle tests.

The differential tests (test_reference_oracle.py, test_reference_loader_
oracle.py) import /root/reference packages whose module-level imports pull
dependencies absent here (open3d, evo, skimage, pytoml, torchvision).  The
first implementation stubbed those with bare ``sys.modules.setdefault``
and never cleaned up, which broke the suite two ways under xdist's
--dist loadfile (multiple test FILES share one worker process):

  * a ``torchvision`` stub with ``__spec__ = None`` leaked into
    test_torch_parity, where transformers' import machinery calls
    ``importlib.util.find_spec("torchvision")`` → ``ValueError:
    torchvision.__spec__ is None``;
  * the two oracle files stub ``evo.tools`` with INCOMPATIBLE contents
    (metric oracle: ``file_interface=object()``; loader oracle: a working
    TUM-reader shim) and setdefault kept whichever loaded first, so the
    bonn loader oracle failed with AttributeError when the metric oracle's
    file had already run in the same worker.

This helper fixes both: stubs carry a real ModuleSpec, installation
OVERRIDES any stale entry, and everything — stub namespaces and every
module imported from the reference tree — is restored/removed on exit, so
each oracle module is self-contained and leaves the worker clean.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types
from contextlib import contextmanager

REFERENCE_ROOT = "/root/reference"

# Top-level package names that importing the reference tree creates.  The
# teardown sweeps these namespaces (plus the stubs') out of sys.modules;
# nothing else in this repo or its real dependencies lives under them.
_REF_TOPS = ("dataset", "metrics", "model", "configs", "utils")


def make_stub(name: str, **attrs) -> types.ModuleType:
    """A module stub that survives availability probes: find_spec() on a
    sys.modules entry returns its ``__spec__``, and raises ValueError if
    that is None — so every stub gets a real (loader-less) ModuleSpec."""
    mod = types.ModuleType(name)
    spec = importlib.machinery.ModuleSpec(name, None)
    if "." not in name:
        spec.submodule_search_locations = []  # mark as package
        mod.__path__ = []
    mod.__spec__ = spec
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@contextmanager
def reference_imports(stubs: dict):
    """Install ``stubs`` (name → module from make_stub) and put the
    reference tree on sys.path; on exit restore every touched namespace.

    Parents must precede children in iteration order for attribute
    linking, which sorted() guarantees (``evo`` < ``evo.tools``).
    """
    tops = {name.split(".")[0] for name in stubs} | set(_REF_TOPS)
    saved = {n: m for n, m in sys.modules.items() if n.split(".")[0] in tops}
    had_path = REFERENCE_ROOT in sys.path
    for name in sorted(stubs):
        sys.modules[name] = stubs[name]
        parent, _, child = name.rpartition(".")
        if parent:
            setattr(sys.modules[parent], child, stubs[name])
    if not had_path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        yield
    finally:
        for name in [n for n in sys.modules if n.split(".")[0] in tops]:
            if name in saved:
                sys.modules[name] = saved[name]
            else:
                del sys.modules[name]
        if not had_path and REFERENCE_ROOT in sys.path:
            sys.path.remove(REFERENCE_ROOT)
