"""Seasonal-baseline anomaly detection over an event stream.

Operational monitoring shape: learn a per-(key, hour-of-day) baseline
from a training window, then flag observation-window buckets whose
aggregate deviates from the baseline by more than ``z_threshold``
standard deviations. The reference has nothing comparable (its queue
only tracks request state); this is the standard last-mile check a
100 TB ingest pipeline runs per partition before publishing.

Cross-engine float discipline (ROUND_NOTES.md playbook): measures are
quantized to scaled longs up front, baseline moments are exact int64
sums (Σx, Σx²), and mean/std/z come out of one fixed double op
sequence — bit-identical across engines, so the whole detector is
DuckDB-oracle-checkable.

Shape: two hash aggregations (train buckets -> baseline moments;
observe buckets) + one broadcastable join on the (key, hour) baseline
— the baseline table is |keys|×24 regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_anomalies(
    events: DataFrame,
    split_day: str,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    value_digits: int = 4,
    z_threshold: float = 3.0,
    z_digits: int = 6,
) -> DataFrame:
    """Events before ``split_day`` train a per-(key, hour-of-day)
    baseline of the per-(key, day, hour) bucket sums; events on/after
    it are scored: → (key, day, hour, bucket_sum, base_mean, z,
    is_anomaly). Baseline hours with < 2 training days or zero
    variance yield null z (never silently 0)."""
    vq = F.floor(F.col(value) * (10**value_digits) + F.lit(0.5)).cast("long")
    bucketed = events.select(
        F.col(key).alias("key"),
        F.date_format(F.date_trunc("day", ts), "yyyy-MM-dd").alias("day"),
        F.hour(ts).alias("hour"),
        vq.alias("vq"),
    )
    buckets = bucketed.groupBy("key", "day", "hour").agg(
        F.sum("vq").alias("bucket_sum")
    )
    train = buckets.filter(F.col("day") < split_day)
    observe = buckets.filter(F.col("day") >= split_day)
    base = train.groupBy("key", "hour").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("bucket_sum").alias("sx"),
        F.sum(F.col("bucket_sum") * F.col("bucket_sum")).alias("sxx"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    var = (n * sxx - sx * sx) / (n * (n - 1))
    z_raw = (n * F.col("bucket_sum").cast("double") - sx) / n / F.sqrt(var)
    z_ok = (F.col("n_days") >= 2) & (n * sxx - sx * sx > 0)
    scale = F.lit(float(10**z_digits))
    joined = observe.join(F.broadcast(base), ["key", "hour"], "left")
    return joined.select(
        "key",
        "day",
        "hour",
        "bucket_sum",
        F.when(
            F.col("n_days") >= 1,
            F.floor(sx / n * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0),
        ).alias("base_mean"),
        F.when(z_ok, F.floor(z_raw * scale + F.lit(0.5)) / scale).alias("z"),
        F.when(z_ok, F.abs(z_raw) > z_threshold).alias("is_anomaly"),
    )


def rolling_trend(
    df: DataFrame,
    key: str,
    x: str,
    y: str,
    window: int = 7,
) -> DataFrame:
    """Per-key rolling OLS slope over the trailing ``window`` rows
    (x-ordered): → every input row + (n_pts, slope_ppm) where
    slope_ppm = ⌊10⁶·(n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) + ½⌋ over the
    frame — the local trend detector ("is this metric turning?") that
    a global fit (trend_fit) smooths away.

    Exactness: all five moments are WINDOW sums of int64 products
    (order-fixed frames, exact), and the one slope division is a
    deterministic IEEE double on those exact ints. Rows whose frame
    is shorter than ``window`` or has zero x-variance get NULL slope.

    One window pass over the per-key ordering — the same shuffle the
    input's key partitioning already implies; no join, no UDF.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy(x)
        .rowsBetween(-(window - 1), 0)
    )
    xv = F.col(x).cast("long")
    yv = F.col(y).cast("long")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(xv).over(w)
    sy = F.sum(yv).over(w)
    sxy = F.sum(xv * yv).over(w)
    sxx = F.sum(xv * xv).over(w)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = F.floor(
        F.lit(1000000.0) * num.cast("double") / den.cast("double")
        + F.lit(0.5)
    ).cast("long")
    return df.select(
        "*",
        n.alias("n_pts"),
        F.when((n >= window) & (den > 0), slope).alias("slope_ppm"),
    )
