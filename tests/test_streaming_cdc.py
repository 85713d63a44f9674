"""Streaming CDC: change stream folded into a parquet snapshot via
foreachBatch, surviving multi-batch arrival and replays."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from det_module_spark.streaming.cdc import stream_cdc_to_snapshot

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def test_stream_cdc_applies_batches(spark, tmp_path):
    snap_path = str(tmp_path / "snapshot")
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    ).coalesce(1).write.parquet(snap_path)

    src = tmp_path / "changes"
    src.mkdir()
    spark.createDataFrame(
        [Row(k=1, seq=100, op="U", v=11), Row(k=2, seq=101, op="D", v=0)],
        CHANGE_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [Row(k=4, seq=102, op="I", v=40)], CHANGE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))

    changes = spark.readStream.schema(CHANGE_SCHEMA).parquet(str(src))
    q = stream_cdc_to_snapshot(
        changes,
        snap_path,
        "k",
        ["v"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    out = {r.k: r.v for r in spark.read.parquet(snap_path).collect()}
    assert out == {1: 11, 3: 30, 4: 40}

    # second run with the same checkpoint: no new input -> no change
    changes2 = spark.readStream.schema(CHANGE_SCHEMA).parquet(str(src))
    q2 = stream_cdc_to_snapshot(
        changes2,
        snap_path,
        "k",
        ["v"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    out2 = {r.k: r.v for r in spark.read.parquet(snap_path).collect()}
    assert out2 == out
