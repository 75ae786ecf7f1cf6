"""Explicit name → class registries for datasets and models.

Replaces the reference's importlib reflection against package ``__init__``
exports (reference: configs/config_utils.py:3-6), which silently breaks when a
module is missing (the reference snapshot itself ships a broken
``model/__init__.py:5`` import).  Here registration is explicit and lookup
errors list the available names.
"""

from __future__ import annotations

from typing import Callable, Dict, Type


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, type] = {}

    def register(self, name: str | None = None) -> Callable[[type], type]:
        def deco(cls: type) -> type:
            key = name or cls.__name__
            if key in self._entries and self._entries[key] is not cls:
                raise ValueError(f"duplicate {self.kind} registration: {key}")
            self._entries[key] = cls
            return cls

        return deco

    def get(self, name: str) -> type:
        try:
            return self._entries[name]
        except KeyError:
            avail = ", ".join(sorted(self._entries)) or "<none>"
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {avail}"
            ) from None

    def names(self):
        return sorted(self._entries)

    def name_of(self, cls: type):
        """Registered key for a class (None if unregistered) — the inverse
        lookup save_config needs, since registry names may differ from
        ``cls.__name__`` (e.g. ``sevenScenesDataset``)."""
        for key, val in self._entries.items():
            if val is cls:
                return key
        return None

    def __contains__(self, name: str) -> bool:
        return name in self._entries


DATASETS = Registry("dataset")
MODELS = Registry("model")


def _ensure_populated():
    """Import the packages whose modules self-register."""
    import unigeo_tpu.data  # noqa: F401
    import unigeo_tpu.models  # noqa: F401


def get_dataset_cls(name: str) -> type:
    _ensure_populated()
    return DATASETS.get(name)


def get_model_cls(name: str) -> type:
    _ensure_populated()
    return MODELS.get(name)
