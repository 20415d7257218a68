"""PySpark-native analytics engine with the capabilities of
aws-samples/iceberg-aws-event-based-table-management.

The reference (Java, /root/reference) is an event-driven Iceberg
table-maintenance control plane that delegates all data processing to
Spark SQL / Athena.  This package re-expresses the whole surface
Spark-first (SURVEY.md SS2):

- Tier A: control-plane dataflow (commit-event trigger evaluator,
  config projection, SQL rendering)   -> queries.control_plane
- Tier B: maintenance operators (binpack/sort compaction, partial
  progress, REPLACE snapshots)        -> operators.maintenance
- Tier C: the full relational surface -> queries.relational/...
- Tier D: training-data pipeline ops (dedup, similarity, text,
  multimodal)                         -> queries.dedup/similarity/text

Every operator is registered in ``registry.QUERIES`` with a DuckDB
oracle SQL where expressible; ``__spark_entry__.py`` exposes them to
the driver.
"""

__version__ = "0.1.0"

from .registry import QUERIES, oracle_map, query_map  # noqa: F401


def load_all_queries() -> None:
    """Import every query module so registration side effects run."""
    from . import queries  # noqa: F401

    queries.load()
