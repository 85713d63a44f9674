"""Sweep-line interval concurrency: how many intervals are open at
each boundary instant, per group.

The distributed version of the "meeting rooms" sweep: each interval
[start, end] contributes +1 at start and −1 just after end; a running
sum over the ordered boundary deltas is the concurrency curve. One
explode-projection, one aggregation keyed by (group, instant), one
window running-sum PER GROUP — the sort is within group partitions,
never a single global order (the group key is the scale unit; for an
ungrouped curve over 100 TB, pre-bucket time into coarse epochs and
sweep each bucket with boundary carry-in, the standard two-pass trick).

Inclusive-end semantics: an interval [s, e] is open at instant e, so
the −1 lands at the first instant AFTER e in the chosen granularity
(``end_exclusive_expr`` — e.g. next day for date granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def concurrency_curve(
    df: DataFrame,
    group: str,
    start: Column,
    end_exclusive: Column,
) -> DataFrame:
    """→ (group, instant, delta, open_count): one row per distinct
    boundary instant with the number of intervals open on [instant,
    next instant). ``end_exclusive`` must be the first instant at
    which the interval no longer counts."""
    starts = df.select(
        F.col(group).alias("grp"),
        start.alias("instant"),
        F.lit(1).alias("d"),
    )
    ends = df.select(
        F.col(group).alias("grp"),
        end_exclusive.alias("instant"),
        F.lit(-1).alias("d"),
    )
    deltas = (
        starts.unionByName(ends)
        .groupBy("grp", "instant")
        .agg(F.sum("d").alias("delta"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("instant")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return deltas.select(
        F.col("grp").alias(group),
        "instant",
        "delta",
        F.sum("delta").over(w).alias("open_count"),
    )
