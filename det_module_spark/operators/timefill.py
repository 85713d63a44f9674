"""Time-series gap filling (hypertable-style `time_bucket_gapfill`).

Dashboards and rollup consumers expect one row per (key, bucket) even
for silent periods; raw event aggregation emits only buckets that saw
events. This operator densifies the series and carries the last
observation forward (LOCF):

1. bucket-aggregate the raw events (one shuffle — the same shape as
   any windowed rollup);
2. per key, generate the full bucket grid between that key's first and
   last bucket (``sequence`` + ``explode`` — a projection whose output
   is bounded by keys × time-span, independent of event count);
3. left-join actuals onto the grid and forward-fill with
   ``last(value, ignorenulls=True)`` over an unbounded-preceding
   window per key.

Scale: the expensive input (raw events) is touched once, in step 1;
steps 2-3 operate on the already-aggregated bucket table (keys ×
buckets rows). The fill window partitions by key, so filling
parallelizes across keys and never needs a global sort.

Fill values are rounded BEFORE filling (round-the-inputs rule): LOCF
copies the rounded bucket sum, so every engine fills bit-identical
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_fill_locf(
    events: DataFrame,
    unit: str = "hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    round_digits: int = 4,
) -> DataFrame:
    """Dense (key, bucket) series with gap rows marked and LOCF-filled.

    Output: key, bucket (timestamp), n_events (0 on gaps), is_gap,
    filled_value (last non-gap rounded sum at or before this bucket).
    """
    factor = 10 ** round_digits
    b = events.groupBy(
        F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.floor(F.sum(value_col) * factor + F.lit(0.5)) / factor).alias(
            "sum_value"
        ),
    )
    # the bucket table feeds two consumers (grid bounds and the join's
    # actuals side); without materialization Spark re-derives it from a
    # SECOND full scan of the raw events — the one table this operator
    # must touch only once. keys × buckets rows, so this is tiny.
    b = b.localCheckpoint(eager=True)
    bounds = b.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {unit}"))
        ).alias("bucket"),
    )
    joined = grid.join(b, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.col("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
    )


def time_fill_linear(
    events: DataFrame,
    unit: str = "hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    round_digits: int = 4,
) -> DataFrame:
    """Dense (key, bucket) series with gaps LINEARLY interpolated
    between the surrounding observed buckets (hypertable
    ``interpolate()`` semantics; LOCF's dual for continuous signals).

    For a gap row between previous observed value v0 (d0 buckets back)
    and next observed value v1 (d1 buckets ahead):

        filled = v0 + (v1 - v0) * d0 / (d0 + d1)

    Interpolation arithmetic uses the ROUNDED bucket sums as inputs
    (round-the-inputs rule) with one identically-shaped IEEE
    expression on both engines, then rounds the result once. The grid
    spans each key's [first, last] OBSERVED bucket, so every gap has
    both anchors — no edge NULLs.

    Scale: identical shape to :func:`time_fill_locf` — one shuffle to
    bucket the raw events, then windows over the tiny (keys × buckets)
    grid, parallel across keys.
    """
    factor = 10 ** round_digits
    b = events.groupBy(
        F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.floor(F.sum(value_col) * factor + F.lit(0.5)) / factor).alias(
            "sum_value"
        ),
    )
    b = b.localCheckpoint(eager=True)
    bounds = b.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {unit}"))
        ).alias("bucket"),
    )
    joined = grid.join(b, [key_col, "bucket"], "left")
    order = Window.partitionBy(key_col).orderBy("bucket")
    back = order.rowsBetween(Window.unboundedPreceding, 0)
    ahead = order.rowsBetween(0, Window.unboundedFollowing)
    epoch = F.unix_timestamp("bucket")
    obs_epoch = F.when(F.col("n_events").isNotNull(), epoch)
    prev_v = F.last("sum_value", ignorenulls=True).over(back)
    next_v = F.first("sum_value", ignorenulls=True).over(ahead)
    prev_t = F.last(obs_epoch, ignorenulls=True).over(back)
    next_t = F.first(obs_epoch, ignorenulls=True).over(ahead)
    interp = F.when(
        F.col("n_events").isNotNull(), F.col("sum_value")
    ).otherwise(
        prev_v
        + (next_v - prev_v) * (epoch - prev_t) / (next_t - prev_t)
    )
    return joined.select(
        F.col(key_col),
        F.col("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
        (F.floor(interp * factor + F.lit(0.5)) / factor).alias(
            "filled_value"
        ),
    )
