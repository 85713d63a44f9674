"""Streaming deduplication — exactly-once-per-key emission.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; an ingestion pipeline sees the same document arrive more than
once (retries, replays, multi-source feeds). ``stream_dedup`` drops
repeats as they arrive:

- streaming input: ``dropDuplicatesWithinWatermark`` — per-key state
  retained only for the watermark horizon, so state is bounded by the
  key arrival rate × horizon, not by stream lifetime. A repeat farther
  apart than the watermark is NOT caught (documented Structured
  Streaming semantics) — the horizon is the dedup guarantee window;
- batch input: plain ``dropDuplicates`` over the same keys, so one
  pipeline definition serves both modes (catch-up runs use
  ``trigger(availableNow=True)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First event per ``keys`` wins; later repeats within the
    watermark horizon are dropped."""
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
