"""Streaming-mode coverage for the remaining window shapes (sliding,
session) and streaming dedup — each checked against the identical
batch plan (mode symmetry is the design contract of streaming/windows)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from det_module_spark.streaming.dedup import stream_dedup
from det_module_spark.streaming.windows import (
    flatten_window,
    session_agg,
    sliding_agg,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _rows():
    def at(m):
        return datetime.datetime(2024, 1, 1, 10, 0) + datetime.timedelta(minutes=m)

    return [
        Row(ts=at(5), event_type="click", user_id="u1", value=1.0),
        Row(ts=at(20), event_type="click", user_id="u1", value=2.0),
        Row(ts=at(65), event_type="view", user_id="u2", value=3.0),
        Row(ts=at(140), event_type="click", user_id="u1", value=4.0),
    ]


def _drain(q):
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)


def _collect_memory(spark, name):
    return spark.sql(f"SELECT * FROM {name}").collect()


def _key(r):
    return tuple(r[c] for c in sorted(r.asDict()))


def test_sliding_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sliding_src")
    spark.createDataFrame(_rows(), EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = flatten_window(
        sliding_agg(stream, "2 hours", "1 hour", watermark="1 hour")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = sorted(_key(r) for r in _collect_memory(spark, "sliding_out"))
    batch = flatten_window(
        sliding_agg(spark.createDataFrame(_rows(), EVENTS_SCHEMA), "2 hours", "1 hour")
    )
    expected = sorted(_key(r) for r in batch.collect())
    assert got == expected and len(got) > 0


def test_session_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "session_src")
    spark.createDataFrame(_rows(), EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = flatten_window(
        session_agg(stream, "30 minutes", watermark="1 hour")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("session_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = sorted(_key(r) for r in _collect_memory(spark, "session_out"))
    batch = flatten_window(
        session_agg(spark.createDataFrame(_rows(), EVENTS_SCHEMA), "30 minutes")
    )
    expected = sorted(_key(r) for r in batch.collect())
    assert got == expected
    # u1 sessions: (10:05,10:20) merge; 12:20 is its own session
    n_u1 = sum(1 for k in got if "u1" in k)
    assert n_u1 == 2


def test_stream_dedup_drops_repeats(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    base = datetime.datetime(2024, 1, 1, 10, 0)
    first = [
        Row(ts=base, event_type="e1", user_id="u1", value=1.0),
        Row(ts=base + datetime.timedelta(minutes=1), event_type="e1",
            user_id="u1", value=1.0),  # repeat of e1 within horizon
        Row(ts=base, event_type="e2", user_id="u2", value=2.0),
    ]
    spark.createDataFrame(first, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = stream_dedup(stream, ["event_type"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = _collect_memory(spark, "dedup_out")
    assert sorted(r["event_type"] for r in rows) == ["e1", "e2"]

    # batch mode: same operator, plain dropDuplicates
    batch = stream_dedup(
        spark.createDataFrame(first, EVENTS_SCHEMA), ["event_type"]
    )
    assert batch.count() == 2
