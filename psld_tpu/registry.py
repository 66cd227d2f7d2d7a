"""String-keyed component registry.

Parity with the reference registry (main/util.py:10-62): categories are
free-form strings (``sde``, ``score_fn``, ``clf_fn``, ``losses``,
``samplers``, ``datasets``, ...) and components register themselves via the
``@register_module(category=..., name=...)`` decorator at import time.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_MODULES: Dict[str, Dict[str, Any]] = {}


def register_module(category: str, name: str | None = None) -> Callable:
    """Class/function decorator registering ``cls`` under ``category``/``name``.

    Unlike the reference (main/util.py:33-55) a duplicate (category, name)
    registration of a *different* object raises; re-registering the same
    object (e.g. on module reload) is a no-op.
    """

    def _register(obj):
        local_name = obj.__name__ if name is None else name
        cat = _MODULES.setdefault(category, {})
        existing = cat.get(local_name)
        if existing is not None and existing is not obj:
            raise ValueError(
                f"Already registered module `{local_name}` in category `{category}`"
            )
        cat[local_name] = obj
        return obj

    return _register


def get_module(category: str, name: str) -> Any:
    """Look up a registered component (reference: main/util.py:58-62)."""
    module = _MODULES.get(category, {}).get(name)
    if module is None:
        known = sorted(_MODULES.get(category, {}))
        raise ValueError(
            f"No module named `{name}` in category `{category}`; known: {known}"
        )
    return module


def list_modules(category: str) -> list[str]:
    return sorted(_MODULES.get(category, {}))
