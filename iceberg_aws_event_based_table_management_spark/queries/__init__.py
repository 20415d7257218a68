"""Query modules; importing them populates the registry."""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        control_plane,
        relational,
        scalars,
        sorts_sets,
    )

    _LOADED = True
