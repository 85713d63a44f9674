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
