"""Query modules; importing them populates the registry.

Import order IS registration order.  The driver grades the first 50
registered queries per round, so the order below is a rotation
schedule: modules whose queries have not yet been driver-verified are
imported first, already-proven modules last.  Round 3 front-loads
relational (outer/semi/anti/range/as-of/self joins), relational_ext,
scalars, sorts_sets and similarity; aggregates/composite/
control_plane/dedup/lifecycle/maintenance were graded in rounds 1-2.
"""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        relational,
        relational_ext,
        scalars,
        sorts_sets,
        similarity,
        text,
        udfs,
        streaming_batch,
        pipeline_ext,
        aggregates,
        composite,
        control_plane,
        dedup,
        lifecycle,
        maintenance,
    )

    # These relational queries were driver-verified green in rounds 1-2
    # (CORRECTNESS_r01/r02: rows+schema+hash all true); move them behind
    # the never-graded set so round 3's window is all new evidence.
    from .. import registry

    registry.demote(
        "scan_parquet",
        "scan_projection",
        "scan_pushdown_filter",
        "project_arithmetic",
        "filter_predicates",
        "case_when_bucket",
        "join_inner_orders_customer",
        "join_broadcast_nation_region",
        # Added mid-round-3 AFTER the window above was planned; demoted
        # so they don't displace the never-graded UDF/text queries from
        # the 50-slot window.  All are check.py-verified; they rotate
        # into the round-4 window.
        "text_repetition_stats",
        "text_heuristic_filter",
        "text_chunk_overlap",
        "pipeline_rag_corpus",
        "embedding_label_outliers",
        "embedding_normalize_quantize",
        "profile_table_stats",
        "audit_referential_integrity",
        "window_forward_fill",
        "window_interpolate_linear",
    )

    _LOADED = True
