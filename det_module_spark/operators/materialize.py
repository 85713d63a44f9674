"""Size-aware materialization barrier for iterative operators.

``localCheckpoint(eager=True)`` pins a deterministic intermediate and
truncates lineage, but the resulting ``LogicalRDD`` leaf carries the
PRE-checkpoint size estimate — for anything derived through an
aggregation over another checkpoint that estimate is "unknown"
(``defaultSizeInBytes`` = huge), so every downstream equi-join against
the materialized table plans as a sort-merge join and re-exchanges the
big side once per consumer and per iteration round (measured on
elo_ratings: the 435k-row pair table re-shuffled — 16.6 MiB exchanged
— in BOTH union branches of EVERY round, guide §2.4's "Exchange nodes
you did not expect").

``materialize`` uses ``persist() + count()`` instead: the
``InMemoryRelation`` reports its ACTUAL cached size, so Catalyst's
static join planning sees the truth — a genuinely small table
broadcast-joins (no exchange of the big side at all), a genuinely big
one sort-merge-joins. That is the scale-adaptive behavior the
optimization guide asks for (§3.1: "estimates are often badly wrong
...", §2.4: broadcast replaces the shuffle) without a single forced
``broadcast()`` hint — at 100 TB the same code sees a 10 GB cached
table and keeps the shuffle.

Semantics: values are unchanged (caching does not alter results, and
every pinned intermediate here is deterministic); the barrier is as
eager as the checkpoint was (``count()`` materializes the cache).
Memory: cached frames compete for storage memory and are LRU-evicted
(recompute on access) — the frames materialized this way are
aggregation outputs orders of magnitude smaller than their inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Persist ``df`` and force materialization; returns ``df`` backed
    by its in-memory cache with accurate size statistics."""
    df = df.persist()
    df.count()
    return df
