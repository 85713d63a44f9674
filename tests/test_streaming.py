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


def test_replay_watermark_drops_and_holds(spark):
    """Handcrafted late-data case through the REAL streaming replay
    (VERDICT r02 #8): with a 30-min watermark and two-phase
    propagation (input filter lags eviction by one batch),
    - b0: 10:10, 10:50            -> wm after b0 = 10:20
    - b1: 09:05 (late, window [09,10) end 10:00; filter for b1 uses
          the b-2 watermark = none -> KEPT), 10:30
    - b2: 13:00                   -> filter uses wm after b0 (10:20):
                                     nothing late arrives; final wm =
                                     12:30 closes [09,10) and [10,11)
    Emitted: [09,10) n=1, [10,11) n=3; [13,14) stays open (absent)."""
    import datetime as dt

    from det_module_spark.streaming.replay import replay_tumbling
    from det_module_spark.streaming.windows import flatten_window

    def t(hh, mm):
        return dt.datetime(2024, 1, 1, hh, mm)

    rows = [
        Row(ts=t(10, 10), value=1.0, batch=0),
        Row(ts=t(10, 50), value=2.0, batch=0),
        Row(ts=t(9, 5), value=8.0, batch=1),
        Row(ts=t(10, 30), value=4.0, batch=1),
        Row(ts=t(13, 0), value=16.0, batch=2),
    ]
    df = spark.createDataFrame(
        rows, "ts TIMESTAMP, value DOUBLE, batch INT"
    )
    out = flatten_window(
        replay_tumbling(
            df, "batch", "1 hour", watermark="30 minutes",
            ts_col="ts", key_col=None, value_col="value",
        )
    )
    got = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert got == {
        "2024-01-01 09:00:00": (1, 8.0),
        "2024-01-01 10:00:00": (3, 7.0),
    }


def test_replay_watermark_drops_closed_window_row(spark):
    """A row arriving after its window's state was evicted is DROPPED:
    same schedule but the late 09:05 row arrives in b2, where the
    input filter uses wm after b0... then b3 pushes the watermark past
    everything. [09,10) is emitted WITHOUT the late row."""
    import datetime as dt

    from det_module_spark.streaming.replay import replay_tumbling
    from det_module_spark.streaming.windows import flatten_window

    def t(hh, mm):
        return dt.datetime(2024, 1, 1, hh, mm)

    rows = [
        Row(ts=t(9, 40), value=1.0, batch=0),
        Row(ts=t(10, 50), value=2.0, batch=0),   # wm after b0 = 10:20
        Row(ts=t(11, 40), value=4.0, batch=1),   # wm after b1 = 11:10
        Row(ts=t(9, 5), value=8.0, batch=2),     # filter: wm(b0)=10:20
        #   -> window [09,10) end 10:00 <= 10:20 -> DROPPED
        Row(ts=t(14, 0), value=16.0, batch=3),   # closes everything
    ]
    df = spark.createDataFrame(
        rows, "ts TIMESTAMP, value DOUBLE, batch INT"
    )
    out = flatten_window(
        replay_tumbling(
            df, "batch", "1 hour", watermark="30 minutes",
            ts_col="ts", key_col=None, value_col="value",
        )
    )
    got = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert got == {
        "2024-01-01 09:00:00": (1, 1.0),   # late 8.0 row NOT included
        "2024-01-01 10:00:00": (1, 2.0),
        "2024-01-01 11:00:00": (1, 4.0),
    }


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


def test_replay_dedup_semantics(spark):
    """dropDuplicatesWithinWatermark, probed contract: dups within the
    horizon are dropped (state = first ts + delay, no extension by
    dups), a key re-arriving after state expiry re-emits, and rows at
    or below the planned watermark are late-dropped."""
    from pyspark.sql import functions as F

    from det_module_spark.streaming.replay import replay_dedup

    rows = [
        ("A", 100.0, 0), ("B", 100.0, 0), ("W", 100.0, 0),
        ("A", 105.0, 1), ("B", 108.0, 1),    # dups inside horizon
        ("W", 122.0, 2),                     # dup; also advances stats
        ("B", 114.0, 3),                     # state alive during b3 -> dropped
        ("W", 200.0, 3),                     # dup (state alive) ; advances stats
        ("A", 205.0, 4),                     # state evicted (wm 190 > 110) -> re-emit
        ("A", 206.0, 5), ("Z", 150.0, 5),    # dup of re-emitted A; Z late (150 < 190)
    ]
    df = spark.createDataFrame(rows, ["k", "ts_sec", "batch"]).select(
        "k", F.col("ts_sec").cast("timestamp").alias("ts"), "batch"
    )
    out = replay_dedup(df, "batch", keys=["k"], watermark="10 seconds")
    got = sorted(
        (r["k"], int(r["ts"].timestamp())) for r in out.collect()
    )
    assert got == [("A", 100), ("A", 205), ("B", 100), ("W", 100)]
