"""Query modules; importing them populates the registry."""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        composite,
        control_plane,
        dedup,
        lifecycle,
        maintenance,
        relational,
        relational_ext,
        scalars,
        similarity,
        sorts_sets,
        streaming_batch,
        text,
        udfs,
    )

    _LOADED = True
