"""Hypertable-style hierarchical time rollups (continuous aggregates).

The pattern behind TimescaleDB continuous aggregates / druid rollups:
materialize a fine-grained time bucket once, then derive every coarser
granularity *from the partials, not the raw data*. Each level stores
algebraic state (sum, count, min, max) so re-aggregation is exact —
means are finalized only at read time (sum/count), never averaged
across levels.

At 100 TB this is the difference between scanning raw events per
dashboard query and scanning a table 10⁴× smaller: the minute-level
table is built in one pass over raw data; hour/day/month levels each
aggregate the level below (cheap, cascading). All levels are plain
DataFrames — persist them as partitioned parquet/Delta and refresh
incrementally by time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# supported granularity ladder, fine → coarse
GRANULARITIES = ["minute", "hour", "day", "month"]


def time_rollup(
    events: DataFrame,
    granularity: str,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One pass over raw rows → algebraic state at ``granularity``."""
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}")
    keys = [F.date_trunc(granularity, F.col(ts_col)).alias("bucket")] + (
        [F.col(key_col)] if key_col else []
    )
    return events.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def rollup_from_partials(
    partials: DataFrame,
    granularity: str,
    key_col: str | None = "event_type",
) -> DataFrame:
    """Coarser level from a finer level's state — exact re-aggregation
    of mergeable state, never touching raw data."""
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}")
    keys = [F.date_trunc(granularity, F.col("bucket")).alias("bucket")] + (
        [F.col(key_col)] if key_col else []
    )
    return partials.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(rolled: DataFrame) -> DataFrame:
    """Read-time finalization: derive mean from state."""
    return rolled.withColumn("mean_v", F.col("sum_v") / F.col("n"))
