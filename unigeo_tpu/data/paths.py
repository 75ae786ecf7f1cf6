"""Dataset-root registry via paths.toml.

(reference: dataset_core/dataset.py:258-280 — when a dataset is constructed
with root=None it resolves the root from a paths.toml keyed by dataset
name.)  Search order: $UNIGEO_PATHS, ./paths.toml, <repo>/paths.toml.

File format:

    [scannetpp]
    root = "/data/scannetpp"
    [7scenes]
    root = "/data/7scenes"
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

try:  # python 3.11+
    import tomllib as _toml
except ImportError:  # pragma: no cover
    _toml = None


def _candidate_files():
    env = os.environ.get("UNIGEO_PATHS")
    if env:
        yield env
    yield osp.join(os.getcwd(), "paths.toml")
    yield osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "paths.toml")


def resolve_root(dataset_name: str) -> Optional[str]:
    """Look up the configured root for a dataset; None if not registered."""
    if _toml is None:
        return None
    for path in _candidate_files():
        if path and osp.isfile(path):
            with open(path, "rb") as f:
                table = _toml.load(f)
            entry = table.get(dataset_name)
            if isinstance(entry, dict) and "root" in entry:
                return str(entry["root"])
            if isinstance(entry, str):
                return entry
    return None
