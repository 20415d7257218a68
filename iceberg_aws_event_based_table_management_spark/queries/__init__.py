"""Query modules; importing them populates the registry."""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        control_plane,
    )

    _LOADED = True
