"""Structured Streaming: same window builders run incrementally; the
stateful request-intake tracker; watermark late-data semantics."""

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from det_module_spark.streaming.intake import track_request_completion
from det_module_spark.streaming.windows import flatten_window, tumbling_agg

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_to_completion(q, timeout=60):
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(timeout)


def test_tumbling_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        Row(ts=f"2024-01-01 10:{m:02d}:00", event_type=t, value=float(v))
        for m, t, v in [
            (5, "click", 1.0), (15, "click", 2.0), (59, "view", 3.0),
        ]
    ]
    rows = [
        Row(
            ts=__import__("datetime").datetime.fromisoformat(r.ts),
            event_type=r.event_type,
            value=r.value,
        )
        for r in rows
    ]
    _write_events(spark, src, rows)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    assert stream.isStreaming
    agg = flatten_window(
        tumbling_agg(stream, "1 hour", watermark="1 hour")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _run_to_completion(q)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = flatten_window(
        tumbling_agg(spark.createDataFrame(rows, EVENTS_SCHEMA), "1 hour")
    )
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == expected
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)


def test_streaming_requires_watermark(spark, tmp_path):
    src = str(tmp_path / "events_src2")
    _write_events(spark, src, [])
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="watermark"):
        tumbling_agg(stream, "1 hour")  # no watermark -> unbounded state


def test_intake_completion_tracker(spark, tmp_path):
    """Item-completion events drive per-request state; 'complete'
    emitted exactly once when done == expected."""
    src = str(tmp_path / "items_src")
    schema = T.StructType(
        [
            T.StructField("request_id", T.StringType(), False),
            T.StructField("expected_items", T.IntegerType(), False),
            T.StructField("item_done", T.IntegerType(), False),
        ]
    )
    spark.createDataFrame(
        [
            ("req_a", 2, 1),
            ("req_a", 2, 1),  # second item -> complete
            ("req_b", 3, 1),  # 1of3 -> pending
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = track_request_completion(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("intake_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_to_completion(q)
    rows = {
        r["request_id"]: (r["n_items"], r["status"])
        for r in spark.sql("SELECT * FROM intake_out").collect()
    }
    assert rows["req_a"] == (2, "complete")
    assert rows["req_b"] == (1, "pending")

    # late second batch completes req_b and must NOT re-emit req_a
    spark.createDataFrame(
        [("req_b", 3, 1), ("req_b", 3, 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        track_request_completion(
            spark.readStream.schema(schema).parquet(src)
        )
        .writeStream.format("memory")
        .queryName("intake_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_to_completion(q2)
    all_rows = spark.sql(
        "SELECT * FROM intake_out2 WHERE status = 'complete'"
    ).collect()
    done = {r["request_id"] for r in all_rows}
    assert done == {"req_a", "req_b"}
