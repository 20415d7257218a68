"""Query registry: the single source of truth the driver contract
(`__spark_entry__.py`) is generated from.

Each operator from SURVEY.md SS2 registers a named entry carrying the
Spark implementation and (when SQL-expressible) the equivalent DuckDB
oracle SQL.  Column names are aliased identically on both sides — the
driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    tier: str  # "A" | "B" | "C" | "D"
    doc: str


QUERIES: dict[str, Query] = {}


def register(name: str, *, oracle: str | None, tier: str, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tier=tier, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def demote(*names: str) -> None:
    """Move already-verified queries to the back of registration order.

    Registration order is the driver's grading order; demoting queries
    whose correctness is already on record keeps the verification
    window pointed at not-yet-verified entries.
    """
    for n in names:
        QUERIES[n] = QUERIES.pop(n)


def query_map() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in QUERIES.values()}


def oracle_map() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES.values() if q.oracle is not None}
