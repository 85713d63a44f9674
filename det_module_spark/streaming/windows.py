"""Event-time windowed aggregations (SURVEY.md §2.10).

The reference is cron-polled micro-batch (queue/processing.py:3); the
engine's streaming surface generalizes it with Structured Streaming
event-time windows. Each builder below is *mode-agnostic*: pass a
batch DataFrame and it runs as a normal aggregation; pass a streaming
DataFrame (``readStream``) and the identical plan runs incrementally
with watermark-driven state eviction — that symmetry is the point of
declaring windows in the logical plan.

At scale: window aggregation state is partitioned by (key, window);
the watermark bounds state size — without it an unbounded-key stream
grows state forever, so ``watermark`` is a required argument on the
streaming path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if df.isStreaming:
        if watermark is None:
            raise ValueError("streaming window aggregation requires a watermark")
        return df.withWatermark(ts_col, watermark)
    return df


def _window_aggs(value_col: str) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    ]


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: each event lands in exactly one."""
    df = _apply_watermark(events, ts_col, watermark)
    keys = [F.window(ts_col, duration).alias("w")] + (
        [F.col(key_col)] if key_col else []
    )
    return df.groupBy(*keys).agg(*_window_aggs(value_col))


def sliding_agg(
    events: DataFrame,
    duration: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    df = _apply_watermark(events, ts_col, watermark)
    keys = [F.window(ts_col, duration, slide).alias("w")] + (
        [F.col(key_col)] if key_col else []
    )
    return df.groupBy(*keys).agg(*_window_aggs(value_col))


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: per-key activity periods separated by ≥ gap of
    silence. ``session_window`` merges adjacent state at runtime; in
    batch mode the same expression computes gaps-and-islands."""
    df = _apply_watermark(events, ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("w"), F.col(key_col)
    ).agg(*_window_aggs(value_col))


def flatten_window(df: DataFrame, fmt: str = "yyyy-MM-dd HH:mm:ss") -> DataFrame:
    """Replace the window struct with formatted start/end strings —
    naive-datetime round-trip makes the output timezone-independent."""
    others = [c for c in df.columns if c != "w"]
    return df.select(
        F.date_format(F.col("w.start"), fmt).alias("window_start"),
        F.date_format(F.col("w.end"), fmt).alias("window_end"),
        *others,
    )
