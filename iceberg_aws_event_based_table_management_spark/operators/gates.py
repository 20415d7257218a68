"""Centralized broadcast-size gating for corpus-derived join sides.

The same incident recurred three times (E116/r10, then twice in the
r12 sf10 smoke: dedup_pair_span_align, dedup_minhash_estimate_audit):
Catalyst's COMPILE-TIME size estimate of a corpus-derived aggregate
(post-groupBy sizes, post-window prefix ranks, collect_list sets) is
garbage in both directions, and when it undershoots the
autoBroadcastJoinThreshold a corpus-sized relation is planned as a
static BroadcastExchange — a multi-GB driver/executor hash-relation
build that dies under GC long before the join runs.  AQE cannot save
a STATIC broadcast decision; the only robust fix is to pin the join
strategy from a size signal Catalyst does not have: the parquet
FOOTER row count of the source table (driver-side file metadata, no
Spark job, so query construction stays lazy — io.parquet_num_rows).

This module is that pattern, extracted once (r12 verdict #5) so new
call sites cannot re-introduce the bug by hand-rolling it:

- ``corpus_exceeds(sf_dir)``      — the footer gate, safe direction =
                                    "too big" on unknown size
- ``pin_join_side(df, small)``    — broadcast | shuffle_hash pin

``shuffle_hash`` (not sort-merge) is the big-corpus pin: the hash
build stays per-partition (no driver relation), and it skips the sort
a merge join would pay on the corpus-sized side.  Broadcast is ONLY
an optimization — every gated plan is correct under either strategy,
so the gate's unknown-size fallback must always choose the shuffle
plan (an oversized broadcast is an OOM; an unnecessary shuffle is a
few seconds).

pipeline_ext6 (E116) keeps its finer-grained byte-level gate
(``_pf_estimated_shingles`` — footer UNCOMPRESSED text bytes, needed
there because the broadcast payload is the shingle-set table, whose
size tracks text volume, not doc count); its fallback direction
matches this module's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import io

#: Doc-count ceiling for broadcasting corpus-derived relations
#: (signatures, per-doc sizes, positional grams).  At ~200k docs those
#: relations approach the r12-measured point where a static broadcast
#: hash relation plus the shingle stages' execution memory no longer
#: coexist in a 16 GB heap; past it every gated site pins shuffle_hash.
CORPUS_BROADCAST_MAX_DOCS = 200_000


def corpus_exceeds(
    sf_dir: str,
    table: str = "documents",
    cutoff: int = CORPUS_BROADCAST_MAX_DOCS,
) -> bool:
    """True when `table`'s footer row count exceeds `cutoff` — or when
    the footer is unreadable (remote path, not-yet-written table).
    Unknown size MUST gate to the shuffle plan: broadcast is only an
    optimization, and the unsafe direction is the one that OOMs
    (r12 ADVICE — checkpointed/in-memory inputs are unprobeable and
    were silently taking the broadcast fast path at any corpus size).
    """
    n = io.parquet_num_rows(sf_dir, table)
    return n is None or n > cutoff


def pin_join_side(df: DataFrame, small: bool) -> DataFrame:
    """Pin the join strategy for a corpus-derived relation: explicit
    broadcast below the gate (Catalyst's own estimate is not trusted
    in EITHER direction), per-partition shuffle_hash build above it."""
    return F.broadcast(df) if small else df.hint("shuffle_hash")
